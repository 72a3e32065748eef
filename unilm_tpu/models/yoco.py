"""YOCO: decoder-decoder long-context LM ("You Only Cache Once").

Capability-equivalent of YOCO/yoco/models/decoder/yoco.py:114-291:
- SelfDecoder: efficient attention layers (sliding-window attention OR gated
  retention) over the first half of the depth
- one GLOBAL K/V computed once from the self-decoder output (:241) —
  halves KV memory and lets every cross-decoder layer reuse it
- CrossDecoder: attention layers whose K/V is that single global pair
- RMSNorm pre-norm, SwiGLU FFN, rotary positions, bias-free projections

Triton kernels (gate_recurrent.py, rotary.py, swiglu.py) map to
ops/retention.py chunked scan + XLA-fused rotary/swiglu (SURVEY.md §2.8).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.layers import FeedForward
from unilm_tpu.ops.attention import attention
from unilm_tpu.ops.retention import chunk_gate_retention, recurrent_gate_retention


@dataclasses.dataclass(frozen=True)
class YOCOConfig:
    vocab_size: int = 64000
    dim: int = 1024
    self_layers: int = 12  # first half: efficient self attention
    cross_layers: int = 12  # second half: shared-KV cross attention
    num_heads: int = 16
    kv_heads: int = 4  # GQA on the global KV
    ffn_dim: int = 4096
    self_type: str = "sliding_window"  # sliding_window | gate_retention
    window_size: int = 1024
    rope_base: float = 10000.0
    gate_logit_normalizer: int = 16
    retention_chunk: int = 256
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    def tcfg(self) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.dim, ffn_dim=self.ffn_dim, num_heads=self.num_heads,
            activation="swiglu", norm_type="rmsnorm", use_bias=False,
            layernorm_eps=self.norm_eps, dtype=self.dtype, use_flash=self.use_flash,
        )


def rotary_sin_cos(positions: jax.Array, dim: int, base: float = 10000.0):
    inv = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv[None]
    return jnp.sin(freqs), jnp.cos(freqs)


def apply_rotary(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    """Interleaved rotary (Tri Dao kernel convention, kernel/rotary.py)."""
    sin = jnp.repeat(sin, 2, axis=-1)
    cos = jnp.repeat(cos, 2, axis=-1)
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    rot = jnp.stack((-x2, x1), axis=-1).reshape(x.shape)
    return (x * cos[None, :, None, :] + rot * sin[None, :, None, :]).astype(x.dtype)


class RMS(nn.Module):
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        y = x * jax.lax.rsqrt(jnp.mean(x.astype(jnp.float32) ** 2, -1, keepdims=True) + self.eps)
        if self.affine:
            w = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            y = y * w
        return y.astype(x.dtype)


class GateRetentionLayer(nn.Module):
    """gate_retention.py GateRetention: q/k/v/g/gt projections, chunked scan,
    head-RMS (no affine), swish-gated output."""

    cfg: YOCOConfig

    @nn.compact
    def __call__(self, x, positions, mode="train", cache_size: int = 0):
        cfg = self.cfg
        B, T, _ = x.shape
        H, D = cfg.num_heads, cfg.head_dim
        dense = lambda f, n: nn.Dense(f, use_bias=False, dtype=cfg.dtype, name=n)
        q = dense(cfg.dim, "q_proj")(x).reshape(B, T, H, D)
        k = dense(cfg.dim, "k_proj")(x).reshape(B, T, H, D)
        v = dense(cfg.dim, "v_proj")(x).reshape(B, T, H, D)
        g = dense(cfg.dim, "g_proj")(x)
        gt = dense(H, "gt_proj")(x)  # [B, T, H]

        sin, cos = rotary_sin_cos(positions, D, cfg.rope_base)
        q = apply_rotary(q, sin, cos)
        k = apply_rotary(k, sin, cos)
        logg = jax.nn.log_sigmoid(gt.astype(jnp.float32)) / cfg.gate_logit_normalizer

        if mode == "train":
            o, _ = chunk_gate_retention(q, k, v, logg, cfg.retention_chunk)
        else:
            state = self.variable(
                "cache", "retention_state",
                lambda: jnp.zeros((B, H, D, D), jnp.float32),
            )
            if mode == "prefill":
                o, s = chunk_gate_retention(q, k, v, logg, cfg.retention_chunk)
                state.value = s
            else:
                o, s = recurrent_gate_retention(q, k, v, logg, state.value)
                state.value = s
        o = RMS(cfg.norm_eps, affine=False, name="subln")(o)
        o = o.reshape(B, T, cfg.dim) * jax.nn.silu(g.astype(jnp.float32)).astype(o.dtype)
        return dense(cfg.dim, "out_proj")(o)


class SlidingWindowLayer(nn.Module):
    """sliding_window_attention.py: windowed causal self attention."""

    cfg: YOCOConfig

    @nn.compact
    def __call__(self, x, positions, mode="train", cache_size: int = 0):
        cfg = self.cfg
        B, T, _ = x.shape
        H, D = cfg.num_heads, cfg.head_dim
        dense = lambda f, n: nn.Dense(f, use_bias=False, dtype=cfg.dtype, name=n)
        q = dense(cfg.dim, "q_proj")(x).reshape(B, T, H, D)
        k = dense(cfg.dim, "k_proj")(x).reshape(B, T, H, D)
        v = dense(cfg.dim, "v_proj")(x).reshape(B, T, H, D)
        sin, cos = rotary_sin_cos(positions, D, cfg.rope_base)
        q = apply_rotary(q, sin, cos)
        k = apply_rotary(k, sin, cos)

        q_offset = None
        kv_len = None
        if mode != "train":
            ck = self.variable("cache", "cached_key", jnp.zeros, (B, cache_size, H, D), cfg.dtype)
            cv = self.variable("cache", "cached_value", jnp.zeros, (B, cache_size, H, D), cfg.dtype)
            idx = self.variable("cache", "cache_index", lambda: jnp.zeros((), jnp.int32))
            start = jnp.zeros((), jnp.int32) if mode == "prefill" else idx.value
            ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, start, 0, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, start, 0, 0))
            idx.value = start + T
            k, v = ck.value, cv.value
            q_offset = start
            kv_len = start + T

        o = attention(
            q, k, v, causal=True, window=cfg.window_size,
            q_offset=q_offset, kv_len=kv_len,
            use_flash=cfg.use_flash,
        )
        return dense(cfg.dim, "out_proj")(o.reshape(B, T, cfg.dim))


class CrossLayer(nn.Module):
    """CrossDecoder layer: q projection only; K/V are the shared globals."""

    cfg: YOCOConfig

    @nn.compact
    def __call__(self, x, gk, gv, positions, q_offset=None, kv_len=None):
        cfg = self.cfg
        B, T, _ = x.shape
        H, D = cfg.num_heads, cfg.head_dim
        q = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="q_proj")(x)
        q = q.reshape(B, T, H, D)
        sin, cos = rotary_sin_cos(positions, D, cfg.rope_base)
        q = apply_rotary(q, sin, cos)
        # GQA: repeat kv heads
        rep = H // gk.shape[2]
        k = jnp.repeat(gk, rep, axis=2)
        v = jnp.repeat(gv, rep, axis=2)
        o = attention(q, k, v, causal=True, q_offset=q_offset, kv_len=kv_len,
                      use_flash=cfg.use_flash)
        return nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="out_proj")(
            o.reshape(B, T, cfg.dim)
        )


class YOCO(nn.Module):
    cfg: YOCOConfig

    @nn.compact
    def __call__(self, tokens: jax.Array, mode: str = "train", cache_size: int = 0):
        cfg = self.cfg
        tcfg = cfg.tcfg()
        B, T = tokens.shape
        embed = nn.Embed(cfg.vocab_size, cfg.dim,
                         embedding_init=nn.initializers.normal(cfg.dim**-0.5),
                         dtype=cfg.dtype, name="embed_tokens")
        x = embed(tokens)

        if mode == "decode":
            stepv = self.variable("cache", "pos", lambda: jnp.zeros((), jnp.int32))
            positions = stepv.value + jnp.arange(T)
            start = stepv.value
            stepv.value = stepv.value + T
        else:
            positions = jnp.arange(T)
            start = jnp.zeros((), jnp.int32)
            if mode == "prefill":
                stepv = self.variable("cache", "pos", lambda: jnp.zeros((), jnp.int32))
                stepv.value = jnp.asarray(T, jnp.int32)

        SelfLayer = (
            GateRetentionLayer if cfg.self_type == "gate_retention" else SlidingWindowLayer
        )
        for i in range(cfg.self_layers):
            h = RMS(cfg.norm_eps, name=f"self_norm1_{i}")(x)
            x = x + SelfLayer(cfg, name=f"self_{i}")(h, positions, mode, cache_size)
            h = RMS(cfg.norm_eps, name=f"self_norm2_{i}")(x)
            x = x + FeedForward(tcfg, name=f"self_ffn_{i}")(h)

        # ---- ONE global KV (yoco.py:241) ---------------------------------
        kvn = RMS(cfg.norm_eps, name="kv_norm")(x)
        Hkv, D = cfg.kv_heads, cfg.head_dim
        gk = nn.Dense(Hkv * D, use_bias=False, dtype=cfg.dtype, name="global_k")(kvn)
        gv = nn.Dense(Hkv * D, use_bias=False, dtype=cfg.dtype, name="global_v")(kvn)
        gk = gk.reshape(B, T, Hkv, D)
        gv = gv.reshape(B, T, Hkv, D)
        sin, cos = rotary_sin_cos(positions, D, cfg.rope_base)
        gk = apply_rotary(gk, sin, cos)

        q_offset = kv_len = None
        if mode != "train":
            ck = self.variable("cache", "global_key", jnp.zeros, (B, cache_size, Hkv, D), cfg.dtype)
            cv = self.variable("cache", "global_value", jnp.zeros, (B, cache_size, Hkv, D), cfg.dtype)
            ck.value = jax.lax.dynamic_update_slice(ck.value, gk, (0, start, 0, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, gv, (0, start, 0, 0))
            gk, gv = ck.value, cv.value
            q_offset = start
            kv_len = start + T

        for i in range(cfg.cross_layers):
            h = RMS(cfg.norm_eps, name=f"cross_norm1_{i}")(x)
            x = x + CrossLayer(cfg, name=f"cross_{i}")(h, gk, gv, positions, q_offset, kv_len)
            h = RMS(cfg.norm_eps, name=f"cross_norm2_{i}")(x)
            x = x + FeedForward(tcfg, name=f"cross_ffn_{i}")(h)

        x = RMS(cfg.norm_eps, name="final_norm")(x)
        return embed.attend(x)


def make_yoco_generate_fns(model: YOCO, cache_size: int):
    def prefill(params, tokens, aux):
        logits, vars_ = model.apply(
            {"params": params}, tokens, "prefill", cache_size, mutable=["cache"]
        )
        return logits, vars_["cache"]

    def step(params, tokens, cache, aux):
        logits, vars_ = model.apply(
            {"params": params, "cache": cache}, tokens, "decode", cache_size,
            mutable=["cache"],
        )
        return logits, vars_["cache"]

    return prefill, step
