"""BEiT-2: VQ-KD visual tokenizer + CLS-pretraining variant.

Capability-equivalent of:
- beit2/norm_ema_quantizer.py:34-123 (NormEMAVectorQuantizer: l2-normalized
  EMA codebook with Laplace-smoothed cluster counts)
- beit2/modeling_vqkd.py:79-339 (VQKD: ViT encoder -> quantize -> ViT decoder
  regressing CLIP/DINO teacher features; get_codebook_indices)
- beit/modeling_discrete_vae.py:206 (DiscreteVAE fallback tokenizer)
- beit2/modeling_pretrain.py:266 (masked-image-modeling with CLS aggregation)

EMA codebook state lives in the mutable 'ema' collection (non-gradient
updates — the jax analogue of the reference's buffer updates under no_grad).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.embedding import VisionEmbedding
from unilm_tpu.core.transformer import Encoder


def l2norm(x, eps=1e-6):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


class NormEMAVectorQuantizer(nn.Module):
    num_tokens: int = 8192
    codebook_dim: int = 32
    beta: float = 1.0  # commitment weight
    decay: float = 0.99
    eps: float = 1e-5

    @nn.compact
    def __call__(self, z: jax.Array, update_ema: bool = False):
        """z [..., D] -> (quantized, loss, indices). Straight-through grad."""
        codebook = self.variable(
            "ema", "embedding",
            lambda: l2norm(jax.random.normal(self.make_rng("params") if self.is_initializing() else jax.random.PRNGKey(0),
                                             (self.num_tokens, self.codebook_dim))),
        )
        cluster_size = self.variable(
            "ema", "cluster_size", lambda: jnp.zeros((self.num_tokens,))
        )
        flat = l2norm(z.reshape(-1, self.codebook_dim))
        emb = codebook.value  # [N, D] (kept l2-normalized)
        # cosine distance == l2 on normalized vectors
        d = (
            jnp.sum(flat**2, 1, keepdims=True)
            - 2 * flat @ emb.T
            + jnp.sum(emb**2, 1)[None]
        )
        idx = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(idx, self.num_tokens, dtype=flat.dtype)
        quant = onehot @ emb

        if update_ema and not self.is_initializing():
            counts = jnp.sum(onehot, axis=0)
            embed_sum = onehot.T @ flat
            new_cluster = cluster_size.value * self.decay + counts * (1 - self.decay)
            # Laplace smoothing (norm_ema_quantizer.py:96-105)
            n = jnp.sum(new_cluster)
            smoothed = (new_cluster + self.eps) / (n + self.num_tokens * self.eps) * n
            embed_mean = embed_sum / jnp.maximum(counts, 1.0)[:, None]
            updated = emb * self.decay + l2norm(embed_mean) * (1 - self.decay)
            updated = jnp.where((counts > 0)[:, None], l2norm(updated), emb)
            codebook.value = updated
            cluster_size.value = smoothed

        loss = self.beta * jnp.mean((jax.lax.stop_gradient(quant) - flat) ** 2)
        quant = flat + jax.lax.stop_gradient(quant - flat)  # straight-through
        return quant.reshape(z.shape), loss, idx.reshape(z.shape[:-1])


@dataclasses.dataclass(frozen=True)
class VQKDConfig:
    img_size: int = 224
    patch_size: int = 16
    encoder_dim: int = 768
    encoder_layers: int = 12
    encoder_heads: int = 12
    decoder_dim: int = 768
    decoder_layers: int = 3
    decoder_heads: int = 12
    codebook_size: int = 8192
    codebook_dim: int = 32
    teacher_dim: int = 512  # CLIP feature dim (modeling_vqkd.py:179-221)
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    def enc_cfg(self):
        return TransformerConfig(
            embed_dim=self.encoder_dim, ffn_dim=self.encoder_dim * 4,
            num_layers=self.encoder_layers, num_heads=self.encoder_heads,
            normalize_before=True, dtype=self.dtype, use_flash=self.use_flash,
        )

    def dec_cfg(self):
        return TransformerConfig(
            embed_dim=self.decoder_dim, ffn_dim=self.decoder_dim * 4,
            num_layers=self.decoder_layers, num_heads=self.decoder_heads,
            normalize_before=True, dtype=self.dtype, use_flash=self.use_flash,
        )


class VQKD(nn.Module):
    """Visual tokenizer: encode -> quantize -> decode to teacher features."""

    cfg: VQKDConfig

    def setup(self):
        cfg = self.cfg
        self.encoder_embed = VisionEmbedding(
            img_size=cfg.img_size, patch_size=cfg.patch_size,
            embed_dim=cfg.encoder_dim, use_cls_token=False, dtype=cfg.dtype,
        )
        self.encoder = Encoder(cfg.enc_cfg())
        # Linear-tanh-Linear bottleneck (modeling_vqkd.py encode_task_layer)
        self.encode_task_1 = nn.Dense(cfg.encoder_dim)
        self.encode_task_2 = nn.Dense(cfg.codebook_dim)
        self.quantize = NormEMAVectorQuantizer(
            num_tokens=cfg.codebook_size, codebook_dim=cfg.codebook_dim
        )
        self.decoder_in = nn.Dense(cfg.decoder_dim)
        self.decoder = Encoder(cfg.dec_cfg())
        self.decode_task_1 = nn.Dense(cfg.decoder_dim)
        self.decode_task_2 = nn.Dense(cfg.teacher_dim)

    def encode(self, images, update_ema: bool = False):
        x = self.encoder_embed(images)
        x = self.encoder(x)
        z = self.encode_task_2(jnp.tanh(self.encode_task_1(x)))
        return self.quantize(z, update_ema=update_ema)

    def get_codebook_indices(self, images) -> jax.Array:
        """modeling_vqkd.py:135 — the BEiT pretraining target ids."""
        _, _, idx = self.encode(images)
        return idx

    def __call__(self, images, update_ema: bool = False):
        quant, vq_loss, idx = self.encode(images, update_ema)
        h = self.decoder(self.decoder_in(quant))
        rec = self.decode_task_2(jnp.tanh(self.decode_task_1(h)))
        return rec, vq_loss, idx


class DiscreteVAE(nn.Module):
    """Lightweight DALL-E-style conv tokenizer
    (beit/modeling_discrete_vae.py:206): conv encoder -> categorical logits
    over the codebook; get_codebook_indices = argmax."""

    vocab_size: int = 8192
    hidden: int = 128
    image_size: int = 224
    downscale: int = 3  # 2^3 = 8x reduction

    @nn.compact
    def __call__(self, images):  # returns logits [B, h, w, vocab]
        x = images
        for i in range(self.downscale):
            x = nn.Conv(self.hidden * (2**i), (4, 4), strides=(2, 2), padding="SAME")(x)
            x = jax.nn.relu(x)
        return nn.Conv(self.vocab_size, (1, 1))(x)

    def get_codebook_indices(self, images):
        logits = self(images)
        B = logits.shape[0]
        return jnp.argmax(logits, axis=-1).reshape(B, -1)


class BEiT2ForMaskedImageModelingCLS(nn.Module):
    """beit2/modeling_pretrain.py:266: MIM + CLS-aggregation branch — the
    early layers' patch states are concatenated with the final CLS token and
    run through shared last blocks for a second MIM loss."""

    cfg: "Beit2PretrainConfig"

    @nn.compact
    def __call__(self, images, bool_masked_pos, deterministic: bool = True):
        from unilm_tpu.models.beit import BeitBackbone, BeitConfig

        c = self.cfg
        bcfg = BeitConfig(
            img_size=c.img_size, patch_size=c.patch_size, embed_dim=c.embed_dim,
            num_layers=c.num_layers, num_heads=c.num_heads, ffn_dim=c.embed_dim * 4,
            use_rel_pos_bias=False, use_shared_rel_pos_bias=True,
            use_mean_pooling=False, init_values=0.1, vocab_size=c.vocab_size,
            dtype=c.dtype, use_flash=c.use_flash,
        )
        x, hiddens = BeitBackbone(bcfg, use_mask_token=True, name="backbone")(
            images, bool_masked_pos, deterministic=deterministic,
            return_all_hiddens=True,
        )
        x = nn.LayerNorm(epsilon=1e-6, dtype=bcfg.dtype, name="norm")(x)
        logits = nn.Dense(c.vocab_size, dtype=bcfg.dtype, name="lm_head")(x[:, 1:])

        # CLS branch: early patch states + final cls (modeling_pretrain :292)
        early = hiddens[c.early_layer][:, 1:]
        cls = x[:, :1]
        mix = jnp.concatenate([cls, early], axis=1)
        logits_cls = nn.Dense(c.vocab_size, dtype=bcfg.dtype,
                              name="lm_head_cls")(mix[:, 1:])
        return logits, logits_cls


@dataclasses.dataclass(frozen=True)
class Beit2PretrainConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    vocab_size: int = 8192
    early_layer: int = 9
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
