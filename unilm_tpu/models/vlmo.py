"""VLMo: vision-language pretraining with Mixture-of-Modality-Experts.

Capability-equivalent of vlmo/ (pytorch-lightning runner + MoME blocks):
MoME == the Multiway mechanism already in the core (vision/text expert FFNs
with shared attention), so VLMo is a thin task layer over BEiT3Model — the
same relationship the reference has (vlmo predates and beit3 generalizes it).
Heads: ITM (image-text matching), ITC (contrastive, = BEiT3ForRetrieval),
MLM over the text half."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from unilm_tpu.models.beit3 import BEiT3Config, BEiT3ForRetrieval, BEiT3Model, Pooler

VLMoConfig = BEiT3Config
VLMoForRetrieval = BEiT3ForRetrieval  # ITC head


class VLMoForImageTextMatching(nn.Module):
    cfg: BEiT3Config

    @nn.compact
    def __call__(self, images, tokens, padding_mask=None, deterministic=True):
        out, _ = BEiT3Model(self.cfg, name="vlmo")(
            textual_tokens=tokens, visual_images=images,
            text_padding_mask=padding_mask, deterministic=deterministic,
        )
        pooled = Pooler(self.cfg.embed_dim, self.cfg.layernorm_eps, name="pooler")(out)
        return nn.Dense(2, name="itm_head")(pooled)


class VLMoForMaskedLM(nn.Module):
    cfg: BEiT3Config

    @nn.compact
    def __call__(self, images, tokens, padding_mask=None, deterministic=True):
        out, split = BEiT3Model(self.cfg, name="vlmo")(
            textual_tokens=tokens, visual_images=images,
            text_padding_mask=padding_mask, deterministic=deterministic,
        )
        text = out[:, split:] if images is not None else out
        return nn.Dense(self.cfg.vocab_size, dtype=self.cfg.dtype,
                        name="mlm_head")(text)
