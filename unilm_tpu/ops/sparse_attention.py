"""Rectified Sparse Attention (ReSA) — block-sparse decode + dense rectify.

Capability-equivalent of ReSA/llm (Rectified Sparse Attention: block-sparse
decoding where each step attends only the top-k KV blocks scored against
the query, with the KV cache periodically refreshed by a dense forward pass
so approximation error stays bounded — ReSA/README.md method overview).

TPU-first: block scores come from a mean-pooled per-block key summary (one
[B,H,nblocks,D] tensor maintained incrementally), top-k block selection is
a static-k lax.top_k, and the sparse attention runs over the GATHERED
[B, k*block, H, D] keys — all static shapes, no recompilation as the
sequence grows. `rectify_schedule` gives the fixed-interval dense-refresh
cadence; the dense pass reuses the normal attention path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class ReSAConfig:
    block_size: int = 64
    topk_blocks: int = 16
    rectify_interval: int = 256  # dense refresh every N decode steps
    sink_blocks: int = 1         # always keep the first block(s) (attn sink)
    local_blocks: int = 2        # always keep the newest block(s)


def block_key_summary(k_cache: jax.Array, block_size: int) -> jax.Array:
    """[B, S, H, D] -> mean-pooled [B, nb, H, D] per-block key summary."""
    B, S, H, D = k_cache.shape
    nb = S // block_size
    return jnp.mean(
        k_cache[:, : nb * block_size].reshape(B, nb, block_size, H, D), axis=2
    )


def update_block_summary(
    summaries: jax.Array,  # [B, nb, H, D]
    k_cache: jax.Array,    # [B, S, H, D] (cache AFTER the append)
    pos: jax.Array,        # scalar: index the new key was written at
    block_size: int,
) -> jax.Array:
    """Incremental refresh of the one block containing position `pos`."""
    nb = summaries.shape[1]
    bi = pos // block_size
    # a position in the uncovered tail (S not a multiple of block_size) has
    # no summary row; dynamic_update_slice would CLAMP onto block nb-1 and
    # corrupt it, so such writes become no-ops
    in_range = bi < nb
    bi_c = jnp.minimum(bi, nb - 1)
    start = bi_c * block_size
    blk = jax.lax.dynamic_slice(
        k_cache, (0, start, 0, 0),
        (k_cache.shape[0], block_size, k_cache.shape[2], k_cache.shape[3]),
    )
    # mean over the VALID prefix of the block only
    n_valid = jnp.clip(pos + 1 - start, 1, block_size)
    mask = (jnp.arange(block_size) < n_valid)[None, :, None, None]
    mean = jnp.sum(blk * mask, axis=1) / n_valid.astype(blk.dtype)
    updated = jax.lax.dynamic_update_slice(
        summaries, mean[:, None], (0, bi_c, 0, 0)
    )
    return jnp.where(in_range, updated, summaries)


def select_blocks(
    q: jax.Array,          # [B, 1, H, D] current query
    summaries: jax.Array,  # [B, nb, H, D]
    kv_len: jax.Array,     # scalar valid length
    cfg: ReSAConfig,
) -> jax.Array:
    """Top-k block ids per batch row [B, k] (head-summed scores, plus forced
    sink/local blocks — the ReSA block-selection heuristic)."""
    B, nb = summaries.shape[0], summaries.shape[1]
    # score: sum over heads of q . mean-key
    scores = jnp.einsum("bhd,bnhd->bn", q[:, 0].astype(jnp.float32),
                        summaries.astype(jnp.float32))
    n_valid_blocks = (kv_len + cfg.block_size - 1) // cfg.block_size
    ids = jnp.arange(nb)[None, :]
    valid = ids < n_valid_blocks
    # force sinks and the local window to the top
    forced = (ids < cfg.sink_blocks) | (
        ids >= n_valid_blocks - cfg.local_blocks
    )
    scores = jnp.where(forced & valid, jnp.inf, scores)
    scores = jnp.where(valid, scores, -jnp.inf)
    _, top = jax.lax.top_k(scores, min(cfg.topk_blocks, nb))
    return top


def sparse_decode_attention(
    q: jax.Array,        # [B, 1, H, D]
    k_cache: jax.Array,  # [B, S, H, D]
    v_cache: jax.Array,
    block_ids: jax.Array,  # [B, k] selected blocks
    kv_len: jax.Array,     # scalar valid prefix
    cfg: ReSAConfig,
    scale: Optional[float] = None,
) -> jax.Array:
    """Attend only the selected blocks; invalid/out-of-range positions are
    masked. Returns [B, 1, H, D]."""
    B, S, H, D = k_cache.shape
    if scale is None:
        scale = D**-0.5
    bs = cfg.block_size
    kblk = block_ids.shape[1]
    # gather [B, k, bs, H, D]
    starts = block_ids * bs                                  # [B, k]
    offs = jnp.arange(bs)
    gpos = starts[:, :, None] + offs[None, None, :]          # [B, k, bs]
    gpos_c = jnp.minimum(gpos, S - 1)
    kg = jax.vmap(lambda kc, idx: kc[idx])(k_cache, gpos_c.reshape(B, -1))
    vg = jax.vmap(lambda vc, idx: vc[idx])(v_cache, gpos_c.reshape(B, -1))
    # [B, k*bs, H, D]
    s = jnp.einsum("bhd,bshd->bhs", (q[:, 0] * scale), kg,
                   preferred_element_type=jnp.float32)
    valid = (gpos.reshape(B, -1) < kv_len)[:, None, :]       # [B, 1, k*bs]
    s = jnp.where(valid, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("bhs,bshd->bhd", p, vg,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out[:, None]


def rectify_schedule(step: jax.Array, cfg: ReSAConfig) -> jax.Array:
    """True on steps where the dense refresh runs (fixed cadence)."""
    return (step % cfg.rectify_interval) == 0


def resa_decode_step(
    q: jax.Array,        # [B, 1, H, D]
    k_cache: jax.Array,  # [B, S, H, D]
    v_cache: jax.Array,
    summaries: jax.Array,  # [B, nb, H, D]
    kv_len: jax.Array,
    step: jax.Array,
    cfg: ReSAConfig,
    scale: Optional[float] = None,
) -> jax.Array:
    """One ReSA decode step: dense on rectify steps, block-sparse otherwise
    (both jit-friendly; lax.cond keeps a single compiled program)."""
    def dense(_):
        B, S, H, D = k_cache.shape
        sc = scale if scale is not None else D**-0.5
        s = jnp.einsum("bhd,bshd->bhs", q[:, 0] * sc, k_cache,
                       preferred_element_type=jnp.float32)
        mask = (jnp.arange(S) < kv_len)[None, None, :]
        s = jnp.where(mask, s, NEG_INF)
        p = jax.nn.softmax(s, -1).astype(v_cache.dtype)
        return jnp.einsum("bhs,bshd->bhd", p, v_cache,
                          preferred_element_type=jnp.float32).astype(q.dtype)[:, None]

    def sparse(_):
        ids = select_blocks(q, summaries, kv_len, cfg)
        return sparse_decode_attention(q, k_cache, v_cache, ids, kv_len, cfg, scale)

    return jax.lax.cond(rectify_schedule(step, cfg), dense, sparse, None)
