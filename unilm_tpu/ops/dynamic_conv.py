"""Lightweight & dynamic convolution (LightConv/DynamicConv).

Capability-equivalent of fairseq's fused CUDA kernels
(edgelm/fairseq/modules/{lightconv,dynamicconv}_layer/*.cu, SURVEY.md §2.8):
depthwise softmax-normalized convolutions where DynamicConv predicts the
kernel per time step from the input. Expressed as banded einsums so XLA
maps them onto the MXU — no custom kernel needed at these sizes."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _band_gather(x: jax.Array, kernel_size: int, padding_l: int) -> jax.Array:
    """[B, T, C] -> [B, T, K, C]: window of K inputs feeding each output t."""
    B, T, C = x.shape
    pad_r = kernel_size - 1 - padding_l
    xp = jnp.pad(x, ((0, 0), (padding_l, max(pad_r, 0)), (0, 0)))
    idx = jnp.arange(T)[:, None] + jnp.arange(kernel_size)[None, :]  # [T, K]
    return xp[:, idx]  # [B, T, K, C]


def light_conv(
    x: jax.Array,  # [B, T, C]
    weight: jax.Array,  # [H, K] shared per head-group
    num_heads: int,
    padding_l: Optional[int] = None,
    softmax: bool = True,
    causal: bool = False,
) -> jax.Array:
    """LightConv: depthwise conv with weight shared across C/H channels."""
    B, T, C = x.shape
    H, K = weight.shape
    if padding_l is None:
        padding_l = K - 1 if causal else K // 2
    w = jax.nn.softmax(weight, axis=-1) if softmax else weight
    windows = _band_gather(x, K, padding_l)  # [B, T, K, C]
    wc = jnp.repeat(w, C // H, axis=0).T  # [K, C]
    return jnp.einsum("btkc,kc->btc", windows, wc)


def dynamic_conv(
    x: jax.Array,  # [B, T, C]
    weights: jax.Array,  # [B, T, H, K] per-position predicted kernels
    padding_l: Optional[int] = None,
    softmax: bool = True,
    causal: bool = True,
) -> jax.Array:
    """DynamicConv: per-timestep depthwise kernels (dynamicconv_layer CUDA)."""
    B, T, C = x.shape
    _, _, H, K = weights.shape
    if padding_l is None:
        padding_l = K - 1 if causal else K // 2
    w = jax.nn.softmax(weights, axis=-1) if softmax else weights
    windows = _band_gather(x, K, padding_l)  # [B, T, K, C]
    windows = windows.reshape(B, T, K, H, C // H)
    return jnp.einsum("btkhd,bthk->bthd", windows, w).reshape(B, T, C)


class DynamicConvLayer(nn.Module):
    """fairseq DynamicConv module: GLU input proj, predicted kernels,
    depthwise dynamic conv, output proj."""

    dim: int
    kernel_size: int = 7
    num_heads: int = 8
    causal: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(2 * self.dim, name="in_proj")(x)
        h = nn.glu(h, axis=-1)
        w = nn.Dense(self.num_heads * self.kernel_size, use_bias=False,
                     name="weight_linear")(h)
        B, T, _ = h.shape
        w = w.reshape(B, T, self.num_heads, self.kernel_size)
        out = dynamic_conv(h, w, causal=self.causal)
        return nn.Dense(self.dim, name="out_proj")(out)
