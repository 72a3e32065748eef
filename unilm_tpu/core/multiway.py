"""Multiway networks: modality-split module duplication (BEiT-3 / Magneto).

Equivalent of torchscale component/multiway_network.py:10-45: token-local
modules (Dense projections, LayerNorms, FFNs) are duplicated into A/B
experts; tokens before `multiway_split_position` go through A (vision),
tokens after through B (text).

TPU-first deviation: the reference slices the sequence at a dynamic split
position and runs each expert on its half (dynamic shapes). Here both
experts run on the full sequence and outputs are blended by a boolean mask —
static shapes, XLA-friendly; the extra FLOPs on token-local ops are small
relative to attention and fully parallel on the MXU.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def split_mask_from_position(seq_len: int, split_position) -> jax.Array:
    """[T] bool; True = second (B) expert. -1 -> all A (torchscale
    set_split_position semantics)."""
    pos = jnp.arange(seq_len)
    return pos >= jnp.where(split_position < 0, seq_len, split_position)


class MultiwayDense(nn.Module):
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x: jax.Array, split_mask: Optional[jax.Array]) -> jax.Array:
        mk = lambda name: nn.Dense(
            self.features, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=self.kernel_init, name=name,
        )
        a = mk("A")(x)
        if split_mask is None:
            # B params must still exist for checkpoint-shape stability
            b = mk("B")(x[:, :1])
            return a
        b = mk("B")(x)
        m = split_mask[None, :, None] if split_mask.ndim == 1 else split_mask[..., None]
        return jnp.where(m, b, a)


class MultiwayNorm(nn.Module):
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    rms: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, split_mask: Optional[jax.Array]) -> jax.Array:
        cls = nn.RMSNorm if self.rms else nn.LayerNorm
        mk = lambda name: cls(
            epsilon=self.epsilon, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        a = mk("A")(x)
        if split_mask is None:
            mk("B")(x[:, :1])
            return a
        b = mk("B")(x)
        m = split_mask[None, :, None] if split_mask.ndim == 1 else split_mask[..., None]
        return jnp.where(m, b, a)
