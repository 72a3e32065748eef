"""DALL-E discrete VAE encoder (BEiT's visual tokenizer).

Capability-equivalent of beit/modeling_discrete_vae.py:79 (Dalle_VAE) +
the vendored beit/dall_e/{encoder,utils}.py: the OpenAI DALL-E encoder
whose argmax logits provide the 8192-way visual tokens BEiT pretraining
predicts at masked patches. Weight loading from released encoder.pkl
state dicts goes through convert/dalle.py.

NHWC flax re-implementation; architecture mirrors dall_e/encoder.py:
input conv7 -> 4 groups x n EncoderBlocks (1-4-4-4 channel doubling,
post_gain residual scaling 1/n_layers^2, maxpool between groups) ->
relu + conv1 to vocab logits.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

LOGIT_LAPLACE_EPS = 0.1


def map_pixels(x: jax.Array) -> jax.Array:
    """dall_e/utils.py map_pixels: squeeze [0,1] into the logit-Laplace range."""
    return (1.0 - 2.0 * LOGIT_LAPLACE_EPS) * x + LOGIT_LAPLACE_EPS


@dataclasses.dataclass(frozen=True)
class DalleEncoderConfig:
    group_count: int = 4
    n_hid: int = 256
    n_blk_per_group: int = 2
    input_channels: int = 3
    vocab_size: int = 8192
    dtype: Any = jnp.float32


class EncoderBlock(nn.Module):
    n_out: int
    n_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_hid = self.n_out // 4
        post_gain = 1.0 / (self.n_layers ** 2)
        ident = x
        if x.shape[-1] != self.n_out:
            ident = nn.Conv(self.n_out, (1, 1), padding="SAME",
                            dtype=self.dtype, name="id_path")(x)
        h = jax.nn.relu(x)
        h = nn.Conv(n_hid, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(n_hid, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_2")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(n_hid, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_3")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.n_out, (1, 1), padding="SAME", dtype=self.dtype,
                    name="conv_4")(h)
        return ident + post_gain * h


class DalleEncoder(nn.Module):
    cfg: DalleEncoderConfig = DalleEncoderConfig()

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images [B, H, W, C] in [0,1] -> vocab logits [B, H/8, W/8, V]."""
        cfg = self.cfg
        n_layers = cfg.group_count * cfg.n_blk_per_group
        x = map_pixels(images.astype(cfg.dtype))
        x = nn.Conv(cfg.n_hid, (7, 7), padding="SAME", dtype=cfg.dtype,
                    name="input")(x)
        mults = [1, 2, 4, 8][: cfg.group_count]
        for gi, m in enumerate(mults, start=1):
            for bi in range(cfg.n_blk_per_group):
                x = EncoderBlock(
                    m * cfg.n_hid, n_layers, cfg.dtype,
                    name=f"group_{gi}_block_{bi + 1}",
                )(x)
            if gi < cfg.group_count:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jax.nn.relu(x)
        return nn.Conv(cfg.vocab_size, (1, 1), padding="SAME",
                       dtype=jnp.float32, name="output")(x)

    def get_codebook_indices(self, images: jax.Array) -> jax.Array:
        """[B, H/8 * W/8] visual token ids (modeling_discrete_vae.py:223)."""
        logits = self(images)
        B, h, w, V = logits.shape
        return jnp.argmax(logits, axis=-1).reshape(B, h * w)
