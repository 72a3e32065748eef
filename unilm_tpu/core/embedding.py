"""Embedding front-ends: text, learned positions, vision patchify.

Equivalent of torchscale component/embedding.py (TextEmbedding,
PositionalEmbedding, VisionEmbedding) with the conv patchify route shared by
BEiT (beit/modeling_finetune.py:185-206), LayoutLMv3 (modeling_layoutlmv3.py:50)
and TrOCR's DeiT encoder.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class TextEmbedding(nn.Module):
    vocab_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed = nn.Embed(
            self.vocab_size,
            self.embed_dim,
            embedding_init=nn.initializers.normal(self.embed_dim**-0.5),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(self, ids: jax.Array) -> jax.Array:
        return self.embed(ids)

    def attend(self, x: jax.Array) -> jax.Array:
        """Output projection with tied weights (share_input_output_embed)."""
        return self.embed.attend(x)


class PositionalEmbedding(nn.Module):
    """Learned positions. `offset` mirrors fairseq's padding_idx+1 shift
    (fairseq LearnedPositionalEmbedding) so converted checkpoints line up."""

    max_positions: int
    embed_dim: int
    offset: int = 0
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        table = self.param(
            "embedding",
            nn.initializers.normal(self.embed_dim**-0.5),
            (self.max_positions + self.offset, self.embed_dim),
            self.param_dtype,
        )
        return jnp.take(table, positions + self.offset, axis=0).astype(self.dtype)


class PatchEmbed(nn.Module):
    """Conv patchify: [B, H, W, C] -> [B, (H/p)*(W/p), E].

    NHWC layout (TPU-native; the reference uses NCHW). Equivalent of
    beit/modeling_finetune.py:185-206 and torchscale VisionEmbedding.
    """

    patch_size: int = 16
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )(images)
        B, h, w, E = x.shape
        return x.reshape(B, h * w, E)


class VisionEmbedding(nn.Module):
    """PatchEmbed + optional cls token + optional mask-token substitution
    (BEiT pretraining, beit/modeling_pretrain.py:60-75)."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    use_cls_token: bool = True
    use_mask_token: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(
        self, images: jax.Array, bool_masked_pos: Optional[jax.Array] = None
    ) -> jax.Array:
        x = PatchEmbed(
            self.patch_size, self.embed_dim, self.dtype, self.param_dtype, name="patch_embed"
        )(images)
        B, N, E = x.shape
        if self.use_mask_token and bool_masked_pos is not None:
            mask_token = self.param(
                "mask_token", nn.initializers.normal(0.02), (1, 1, E), self.param_dtype
            )
            m = bool_masked_pos[..., None].astype(x.dtype)
            x = x * (1.0 - m) + mask_token.astype(x.dtype) * m
        if self.use_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.normal(0.02), (1, 1, E), self.param_dtype
            )
            x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, E)), x], axis=1)
        return x
