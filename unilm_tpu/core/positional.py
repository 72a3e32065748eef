"""Positional schemes: xPos/SoPE rotary, T5 bucketed relative bias.

Capability-equivalent of reference files:
- kosmos-2/torchscale/torchscale/component/sope_relative_position.py (SoPE/xPos)
- kosmos-2/torchscale/torchscale/component/multihead_attention.py:14-36
  (rotate_every_two / duplicate_interleave / apply_rotary_pos_emb)
- kosmos-2/torchscale/torchscale/component/relative_position_bias.py (T5 buckets)

Implemented as pure jax functions (batch-major, static shapes) so they fuse
into the attention kernels under XLA and can be consumed by Pallas kernels.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# xPos / SoPE rotary
# --------------------------------------------------------------------------- #


def xpos_scale(head_dim: int, dtype=jnp.float32) -> jax.Array:
    """Per-frequency decay base: (arange(0,d,2) + 0.4d) / (1.4d).  [d/2]"""
    return (jnp.arange(0, head_dim, 2, dtype=dtype) + 0.4 * head_dim) / (1.4 * head_dim)


def xpos_sin_cos_scale(
    positions: jax.Array,  # [L] integer absolute positions (may be traced)
    center: jax.Array,  # scalar; reference uses len//2
    head_dim: int,
    scale_base: int = 512,
    dtype=jnp.float32,
):
    """Returns (sin, cos, scale), each [L, d/2].

    Matches SoPE.forward (sope_relative_position.py:30-35): the decay scale is
    ``base ** ((pos - center) / scale_base)`` and sin/cos use frequencies
    ``1/10000^(2i/d)`` evaluated at the *scale matrix's* implicit positions,
    i.e. at ``arange(L)`` — NOT at pos-center (the reference calls
    fixed_pos_embedding(scale) whose row index runs 0..L-1).
    """
    positions = positions.astype(dtype)
    half = head_dim // 2
    base = xpos_scale(head_dim, dtype)  # [d/2]
    power = (positions - center.astype(dtype))[:, None] / scale_base  # [L,1]
    scale = base[None, :] ** power  # [L, d/2]
    # fixed_pos_embedding uses inv_freq over arange(0, dim)/dim with dim=d/2
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, half, dtype=dtype) / half))  # [d/2]
    sinusoid = positions[:, None] * inv_freq[None, :]  # [L, d/2]
    return jnp.sin(sinusoid), jnp.cos(sinusoid), scale


def _rotate_every_two(x: jax.Array) -> jax.Array:
    """[-x2, x1, -x4, x3, ...] on the last dim (interleaved convention)."""
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack((-x2, x1), axis=-1).reshape(x.shape)


def _duplicate_interleave(m: jax.Array) -> jax.Array:
    """[L, d/2] -> [L, d] duplicating each column: (a,b) -> (a,a,b,b)."""
    return jnp.repeat(m, 2, axis=-1)


def apply_xpos(
    x: jax.Array,  # [..., L, d]  (positions on axis -2)
    sin: jax.Array,  # [L, d/2]
    cos: jax.Array,  # [L, d/2]
    scale: jax.Array,  # [L, d/2] or scalar 1.0
) -> jax.Array:
    """apply_rotary_pos_emb (multihead_attention.py:32-36): x*cos + rot(x)*sin,
    with sin/cos pre-multiplied by the xPos decay scale (pass 1/scale for keys).
    """
    sin = _duplicate_interleave(sin * scale)
    cos = _duplicate_interleave(cos * scale)
    # broadcast [L, d] over leading dims
    return (x * cos + _rotate_every_two(x) * sin).astype(x.dtype)


def length_extrapolation_qscale(
    q_positions: jax.Array, k_len: jax.Array, scale_length: int, dtype=jnp.float32
) -> jax.Array:
    """xPos length-extrapolation attention rescale
    (multihead_attention.py:145-147): max(1, log(pos)/log(scale_length)),
    applied to q when k_len > scale_length. Returns [Lq] multiplier."""
    pos = jnp.maximum(q_positions.astype(dtype), 1.0)
    mult = jnp.maximum(1.0, jnp.log(pos) / math.log(scale_length))
    return jnp.where(k_len > scale_length, mult, jnp.ones_like(mult))


# --------------------------------------------------------------------------- #
# T5 bucketed relative position bias
# --------------------------------------------------------------------------- #


def relative_position_bucket(
    relative_position: jax.Array,
    bidirectional: bool = True,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jax.Array:
    """T5 log-bucketing of (memory_pos - query_pos).

    Matches RelativePositionBias._relative_position_bucket
    (relative_position_bias.py:22-46). Also reused by LayoutLMv3's 1D/2D
    biases (layoutlmv3 modeling_layoutlmv3.py:507).
    """
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    """T5-style learned bucketed bias -> [1, heads, qlen, klen].

    Equivalent of torchscale RelativePositionBias (relative_position_bias.py:10-82)
    including the decode `step` offset for incremental generation."""

    num_buckets: int = 32
    max_distance: int = 128
    num_heads: int = 12
    bidirectional: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, qlen: int, klen: int, step=0) -> jax.Array:
        table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(stddev=0.02),
            (self.num_buckets, self.num_heads),
        )
        context_position = step + jnp.arange(qlen)[:, None]
        memory_position = jnp.arange(klen)[None, :]
        relative_position = memory_position - context_position
        rp_bucket = relative_position_bucket(
            relative_position,
            bidirectional=self.bidirectional,
            num_buckets=self.num_buckets,
            max_distance=self.max_distance,
        )
        values = jnp.take(table, rp_bucket, axis=0)  # [q, k, heads]
        return values.transpose(2, 0, 1)[None].astype(self.dtype)
