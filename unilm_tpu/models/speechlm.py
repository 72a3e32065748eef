"""SpeechLM: joint speech-text pre-training with a shared unit encoder.

Capability-equivalent of speechlm/ (SpeechLM: Enhanced Speech Pre-Training
with Unpaired Textual Data): a SHARED transformer encoder consumes either
(a) speech — conv feature extractor (wavlm-style) -> frame embeddings — or
(b) phoneme/unit token sequences, mapped into the same hidden space, and
is pre-trained with
- masked unit prediction on speech frames (HuBERT-style targets from a
  unit tokenizer; here supplied as alignment labels), and
- masked LM on the text/unit stream (the unpaired-text objective).

TPU-first: masking is static-shape (boolean mask + mask embedding swap),
both streams share one jitted step; the speech tower reuses
models/wavlm.FeatureExtractor.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Encoder
from unilm_tpu.models.wavlm import ConvPositionalEmbedding, FeatureExtractor


@dataclasses.dataclass(frozen=True)
class SpeechLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3)
    conv_stride: Tuple[int, ...] = (5, 2, 2)
    unit_vocab: int = 504      # speech units (e.g. HuBERT km500 + specials)
    text_vocab: int = 1000     # phoneme/character vocabulary
    max_text_positions: int = 1024
    dropout: float = 0.0
    dtype: Any = jnp.float32
    use_flash: bool = True

    def enc_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.hidden_size, ffn_dim=self.ffn_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            normalize_before=True, dropout=self.dropout,
            dtype=self.dtype, use_flash=self.use_flash,
        )


class SpeechLM(nn.Module):
    cfg: SpeechLMConfig

    def setup(self):
        cfg = self.cfg
        from unilm_tpu.models.wavlm import WavLMConfig

        wcfg = WavLMConfig(
            hidden_size=cfg.hidden_size, conv_dim=cfg.conv_dim,
            conv_kernel=cfg.conv_kernel, conv_stride=cfg.conv_stride,
            dtype=cfg.dtype,
        )
        self.feature_extractor = FeatureExtractor(wcfg, name="feature_extractor")
        self.feature_proj = nn.Dense(cfg.hidden_size, name="feature_proj")
        self.feature_norm = nn.LayerNorm(name="feature_norm")
        self.conv_pos = ConvPositionalEmbedding(wcfg, name="conv_pos")
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(1.0), (cfg.hidden_size,)
        )
        self.text_embed = nn.Embed(cfg.text_vocab, cfg.hidden_size,
                                   name="text_embed")
        # the speech stream gets conv positional features; the text stream
        # needs its own positions or the MLM objective is order-blind
        self.text_pos = nn.Embed(cfg.max_text_positions, cfg.hidden_size,
                                 name="text_pos")
        self.encoder = Encoder(cfg.enc_cfg(), name="encoder")
        self.unit_head = nn.Dense(cfg.unit_vocab, dtype=cfg.enc_cfg().dtype,
                                  name="unit_head")
        self.text_head = nn.Dense(cfg.text_vocab, dtype=cfg.enc_cfg().dtype,
                                  name="text_head")

    # ------------------------------------------------------------------ #
    def encode_speech(
        self,
        audio: jax.Array,                 # [B, samples]
        mask_indices: Optional[jax.Array] = None,  # [B, frames] bool
        deterministic: bool = True,
    ) -> jax.Array:
        x = self.feature_extractor(audio)            # [B, T, conv_dim]
        x = self.feature_proj(self.feature_norm(x))
        if mask_indices is not None:
            x = jnp.where(
                mask_indices[..., None], self.mask_emb.astype(x.dtype), x
            )
        x = x + self.conv_pos(x)
        return self.encoder(x, deterministic=deterministic)

    def encode_text(self, tokens: jax.Array, deterministic: bool = True):
        x = self.text_embed(tokens)
        x = x + self.text_pos(jnp.arange(tokens.shape[1]))[None]
        return self.encoder(x, deterministic=deterministic)

    # ------------------------------------------------------------------ #
    def __call__(
        self,
        audio: jax.Array,
        mask_indices: jax.Array,
        text_tokens: jax.Array,
        deterministic: bool = True,
    ):
        """Pre-training forward: (unit logits [B,Ts,Vu], text logits
        [B,Tt,Vt]) from the shared encoder."""
        h_speech = self.encode_speech(audio, mask_indices, deterministic)
        h_text = self.encode_text(text_tokens, deterministic)
        return self.unit_head(h_speech), self.text_head(h_text)


def speechlm_pretrain_loss(
    unit_logits: jax.Array,   # [B, T, Vu]
    unit_targets: jax.Array,  # [B, T] int (unit tokenizer / alignment)
    mask_indices: jax.Array,  # [B, T] bool — loss on masked frames only
    text_logits: jax.Array,   # [B, L, Vt]
    text_targets: jax.Array,  # [B, L] int, -100 = unmasked (no loss)
    text_weight: float = 1.0,
):
    """Masked-unit CE on speech + masked-LM CE on text (the two SpeechLM
    pre-training objectives), each normalized by its masked count."""

    def masked_ce(logits, targets, mask):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        safe = jnp.maximum(targets, 0)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        m = mask.astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

    unit_loss = masked_ce(unit_logits, unit_targets, mask_indices)
    text_loss = masked_ce(text_logits, text_targets, text_targets >= 0)
    total = unit_loss + text_weight * text_loss
    return total, {"unit_loss": unit_loss, "text_loss": text_loss}


def speechlm_base(**kw) -> SpeechLMConfig:
    return SpeechLMConfig(**kw)
