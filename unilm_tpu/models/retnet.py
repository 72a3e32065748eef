"""RetNet: multi-scale retention decoder (parallel train / O(1) decode).

Capability-equivalent of the reference's RetNet pointer (retnet/README.md ->
microsoft/torchscale RetNetDecoder) built on our gated-retention ops
(ops/retention.py, the YOCO gate_recurrent family): multi-scale retention is
gated retention with a *constant* per-head log-decay
    gamma_h = 1 - 2^(-5 - h),  h = 0..H-1
so the chunk-parallel lax.scan form trains it and the recurrent form decodes
it with an O(1) [B, H, Dk, Dv] state.

Per the paper: value dim = 2x embed dim (Dv = 2 Dk per head), rotary on q/k,
scale-invariant per-head group norm on the retention output, swish gate,
pre-RMSNorm blocks with a gated FFN.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.layers import FeedForward
from unilm_tpu.models.yoco import RMS, apply_rotary, rotary_sin_cos
from unilm_tpu.ops.retention import chunk_gate_retention, recurrent_gate_retention


@dataclasses.dataclass(frozen=True)
class RetNetConfig:
    vocab_size: int = 32000
    embed_dim: int = 768
    value_dim: Optional[int] = None  # default 2 * embed_dim
    num_layers: int = 12
    num_heads: Optional[int] = None  # default embed_dim // 256 (key head dim 256)
    ffn_dim: Optional[int] = None  # default 2 * embed_dim (swiglu)
    chunk_size: int = 256
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @property
    def heads(self) -> int:
        return self.num_heads or max(1, self.embed_dim // 256)

    @property
    def vdim(self) -> int:
        return self.value_dim or 2 * self.embed_dim


def retention_decays(num_heads: int) -> jnp.ndarray:
    """Per-head log-decay: log(1 - 2^(-5 - h))."""
    h = jnp.arange(num_heads, dtype=jnp.float32)
    return jnp.log(1.0 - jnp.exp2(-5.0 - h))


def _group_norm(x: jax.Array, eps: float) -> jax.Array:
    """Scale-invariant per-head normalization (RetNet GroupNorm, no affine)."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class MultiScaleRetention(nn.Module):
    cfg: RetNetConfig

    def _qkvg(self, x: jax.Array, positions: jax.Array):
        cfg = self.cfg
        H, E, V = cfg.heads, cfg.embed_dim, cfg.vdim
        Dk, Dv = E // H, V // H
        B, T, _ = x.shape
        dense = lambda f, n: nn.Dense(f, use_bias=False, dtype=cfg.dtype, name=n)
        q = dense(E, "q_proj")(x).reshape(B, T, H, Dk)
        k = dense(E, "k_proj")(x).reshape(B, T, H, Dk)
        v = dense(V, "v_proj")(x).reshape(B, T, H, Dv)
        sin, cos = rotary_sin_cos(positions, Dk)
        q = apply_rotary(q, sin, cos)
        k = apply_rotary(k, sin, cos)
        gate = dense(V, "g_proj")(x)
        return q, k, v, gate

    def _output(self, o: jax.Array, gate: jax.Array) -> jax.Array:
        cfg = self.cfg
        B, T = o.shape[:2]
        o = _group_norm(o, cfg.norm_eps).reshape(B, T, cfg.vdim)
        o = jax.nn.swish(gate.astype(jnp.float32)).astype(o.dtype) * o
        return nn.Dense(cfg.embed_dim, use_bias=False, dtype=cfg.dtype,
                        name="out_proj")(o)

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        positions: jax.Array,
        state: Optional[jax.Array] = None,  # [B, H, Dk, Dv] for decode
        mode: str = "train",
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        cfg = self.cfg
        q, k, v, gate = self._qkvg(x, positions)
        decay = retention_decays(cfg.heads)  # [H]
        if mode == "decode":
            # single-token step: constant gate per head
            g = jnp.broadcast_to(decay[None, None], (x.shape[0], 1, cfg.heads))
            o, new_state = recurrent_gate_retention(q, k, v, g, state)
            return self._output(o, gate), new_state
        B, T = x.shape[:2]
        g = jnp.broadcast_to(decay[None, None], (B, T, cfg.heads))
        o, final_state = chunk_gate_retention(
            q, k, v, g, chunk_size=cfg.chunk_size, initial_state=state
        )
        return self._output(o, gate), final_state


class RetNetDecoder(nn.Module):
    """Decoder-only retention LM. mode='train' runs chunk-parallel over the
    full sequence; mode='decode' consumes one token with per-layer states
    stacked as [L, B, H, Dk, Dv]."""

    cfg: RetNetConfig

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        states: Optional[jax.Array] = None,
        positions: Optional[jax.Array] = None,
        mode: str = "train",
    ):
        cfg = self.cfg
        tcfg = TransformerConfig(
            embed_dim=cfg.embed_dim,
            ffn_dim=cfg.ffn_dim or 2 * cfg.embed_dim,
            activation="swiglu", norm_type="rmsnorm", use_bias=False,
            dtype=cfg.dtype, use_flash=False,
        )
        embed = nn.Embed(cfg.vocab_size, cfg.embed_dim,
                         embedding_init=nn.initializers.normal(cfg.embed_dim**-0.5),
                         dtype=cfg.dtype, name="embed_tokens")
        if positions is None:
            positions = jnp.arange(tokens.shape[1])
        x = embed(tokens) * math.sqrt(cfg.embed_dim)
        new_states = []
        for i in range(cfg.num_layers):
            h = RMS(cfg.norm_eps, name=f"ret_norm_{i}")(x)
            o, s = MultiScaleRetention(cfg, name=f"retention_{i}")(
                h, positions, state=None if states is None else states[i], mode=mode
            )
            new_states.append(s)
            x = x + o
            h = RMS(cfg.norm_eps, name=f"ffn_norm_{i}")(x)
            x = x + FeedForward(tcfg, name=f"ffn_{i}")(h)
        x = RMS(cfg.norm_eps, name="final_norm")(x)
        logits = embed.attend(x)
        return logits, jnp.stack(new_states)


def init_retnet_states(cfg: RetNetConfig, batch: int) -> jax.Array:
    H = cfg.heads
    return jnp.zeros(
        (cfg.num_layers, batch, H, cfg.embed_dim // H, cfg.vdim // H), jnp.float32
    )


def retnet_base(**kw) -> RetNetConfig:
    return RetNetConfig(**kw)


def retnet_medium(**kw) -> RetNetConfig:
    kw.setdefault("embed_dim", 1024)
    kw.setdefault("num_layers", 16)
    return RetNetConfig(**kw)
