"""Differential Transformer: noise-cancelling dual-softmax attention.

Capability-equivalent of Diff-Transformer/multihead_diffattn.py (and its
flash variants): each head computes two softmax attentions over split
query/key halves and subtracts them with a learned, reparameterized lambda
(lambda_init = 0.8 - 0.6 exp(-0.3 depth)); per-head RMSNorm then (1 - λ_init)
scaling. GQA via kv-head repetition; interleaved rotary.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.layers import FeedForward
from unilm_tpu.models.yoco import RMS, apply_rotary, rotary_sin_cos
from unilm_tpu.ops.attention import dot_product_attention, make_causal_mask


def lambda_init_fn(depth: int) -> float:
    return 0.8 - 0.6 * math.exp(-0.3 * depth)


class MultiheadDiffAttn(nn.Module):
    """num_heads = HALF the baseline transformer's heads (each diff head
    spends two softmaxes)."""

    embed_dim: int
    depth: int
    num_heads: int
    num_kv_heads: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = True) -> jax.Array:
        E, H = self.embed_dim, self.num_heads
        KV = self.num_kv_heads or H
        rep = H // KV
        D = E // H // 2  # split head dim
        B, T, _ = x.shape

        dense = lambda f, n: nn.Dense(f, use_bias=False, dtype=self.dtype, name=n)
        q = dense(E, "q_proj")(x).reshape(B, T, 2 * H, D)
        k = dense(E // rep, "k_proj")(x).reshape(B, T, 2 * KV, D)
        v = dense(E // rep, "v_proj")(x).reshape(B, T, KV, 2 * D)

        sin, cos = rotary_sin_cos(jnp.arange(T), D)
        q = apply_rotary(q, sin, cos)
        k = apply_rotary(k, sin, cos)

        k = jnp.repeat(k, rep, axis=2)  # [B, T, 2H, D]
        v = jnp.repeat(v, rep, axis=2)  # [B, T, H, 2D]

        mask = make_causal_mask(jnp.arange(T), jnp.arange(T))[None, None] if causal else None
        # two softmax attentions per diff head: sub-head pair axis p
        q2 = q.reshape(B, T, H, 2, D)
        k2 = k.reshape(B, T, H, 2, D)
        logits = jnp.einsum("bthpd,bshpd->bhpts", q2 * (D**-0.5), k2,
                            preferred_element_type=jnp.float32)
        if causal:
            logits = jnp.where(mask[:, :, None], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)  # [B,H,2,T,S]

        li = lambda_init_fn(self.depth)
        init01 = nn.initializers.normal(0.1)
        lq1 = self.param("lambda_q1", init01, (D,), jnp.float32)
        lk1 = self.param("lambda_k1", init01, (D,), jnp.float32)
        lq2 = self.param("lambda_q2", init01, (D,), jnp.float32)
        lk2 = self.param("lambda_k2", init01, (D,), jnp.float32)
        lam = jnp.exp(jnp.dot(lq1, lk1)) - jnp.exp(jnp.dot(lq2, lk2)) + li

        diff = p[:, :, 0] - lam * p[:, :, 1]  # [B,H,T,S]
        o = jnp.einsum("bhts,bshe->bthe", diff.astype(v.dtype), v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        o = RMS(1e-5, name="subln")(o)
        o = o * (1.0 - li)
        return dense(E, "out_proj")(o.reshape(B, T, E))


@dataclasses.dataclass(frozen=True)
class DiffTransformerConfig:
    vocab_size: int = 32000
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 6  # half of the 12-head baseline
    num_kv_heads: Optional[int] = None
    ffn_dim: int = 2048
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32


class DiffTransformerLM(nn.Module):
    cfg: DiffTransformerConfig

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        cfg = self.cfg
        tcfg = TransformerConfig(
            embed_dim=cfg.embed_dim, ffn_dim=cfg.ffn_dim, activation="swiglu",
            norm_type="rmsnorm", use_bias=False, dtype=cfg.dtype, use_flash=False,
        )
        embed = nn.Embed(cfg.vocab_size, cfg.embed_dim,
                         embedding_init=nn.initializers.normal(cfg.embed_dim**-0.5),
                         dtype=cfg.dtype, name="embed_tokens")
        x = embed(tokens)
        for i in range(cfg.num_layers):
            h = RMS(cfg.norm_eps, name=f"attn_norm_{i}")(x)
            x = x + MultiheadDiffAttn(
                cfg.embed_dim, depth=i, num_heads=cfg.num_heads,
                num_kv_heads=cfg.num_kv_heads, dtype=cfg.dtype, name=f"attn_{i}",
            )(h)
            h = RMS(cfg.norm_eps, name=f"ffn_norm_{i}")(x)
            x = x + FeedForward(tcfg, name=f"ffn_{i}")(h)
        x = RMS(cfg.norm_eps, name="final_norm")(x)
        return embed.attend(x)
