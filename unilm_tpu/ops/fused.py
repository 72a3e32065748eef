"""Fused elementwise Pallas kernels: SwiGLU and rotary embedding.

Equivalents of the reference's Triton kernels (SURVEY.md §2.8:
YOCO/.../kernel/{swiglu,rotary}.py, Diff-Transformer/kernel/rotary.py,
LatentLM/models/kernel/*). XLA already fuses these patterns into adjacent
matmuls in most graphs, so the module-level code paths default to the jnp
forms; these kernels exist for the cases XLA cannot fuse (e.g. when the
activation crosses a remat or collective boundary) and as §2.8 parity.
Both are numerically identical to the jnp references (tested)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


# --------------------------------------------------------------------------- #
# SwiGLU: silu(g) * u
# --------------------------------------------------------------------------- #


def _swiglu_kernel(g_ref, u_ref, o_ref):
    g = g_ref[:].astype(jnp.float32)
    o_ref[:] = (g * jax.nn.sigmoid(g) * u_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def swiglu(g: jax.Array, u: jax.Array, block: int = 1024, interpret: bool = None):
    """Fused silu(g) * u over the flattened array."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = g.shape
    d = shape[-1]
    g2 = g.reshape(-1, d)
    u2 = u.reshape(-1, d)
    n = g2.shape[0]
    bn = min(block, _cdiv(n, 8) * 8)
    out = pl.pallas_call(
        _swiglu_kernel,
        grid=(_cdiv(n, bn),),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), g.dtype),
        interpret=interpret,
    )(g2, u2)
    return out.reshape(shape)


# --------------------------------------------------------------------------- #
# Rotary (interleaved, Tri Dao convention)
# --------------------------------------------------------------------------- #


def _rotary_kernel(x_ref, sin_ref, cos_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)  # [bt, H*D] flattened heads
    sin = sin_ref[:].astype(jnp.float32)  # [bt, D]
    cos = cos_ref[:].astype(jnp.float32)
    # interleaved rotate: pairs (0,1), (2,3), ...
    B, HD = x.shape
    D = sin.shape[-1]
    H = HD // D
    xh = x.reshape(B, H, D)
    x1 = xh[..., ::2]
    x2 = xh[..., 1::2]
    rot = jnp.stack((-x2, x1), axis=-1).reshape(B, H, D)
    out = xh * cos[:, None, :] + rot * sin[:, None, :]
    o_ref[:] = out.reshape(B, HD).astype(o_ref.dtype)


def rotary_apply(
    x: jax.Array,  # [B, T, H, D]
    sin: jax.Array,  # [T, D/2]
    cos: jax.Array,  # [T, D/2]
    block: int = 512,
    interpret: bool = None,
):
    """Fused interleaved rotary (kernel/rotary.py equivalent)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, D = x.shape
    sin2 = jnp.repeat(sin, 2, axis=-1)  # [T, D]
    cos2 = jnp.repeat(cos, 2, axis=-1)
    xf = x.reshape(B * T, H * D)
    sinf = jnp.tile(sin2, (B, 1))
    cosf = jnp.tile(cos2, (B, 1))
    n = B * T
    bn = min(block, _cdiv(n, 8) * 8)
    out = pl.pallas_call(
        _rotary_kernel,
        grid=(_cdiv(n, bn),),
        in_specs=[
            pl.BlockSpec((bn, H * D), lambda i: (i, 0)),
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
            pl.BlockSpec((bn, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bn, H * D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, H * D), x.dtype),
        interpret=interpret,
    )(xf, sinf, cosf)
    return out.reshape(B, T, H, D)
