"""Ring attention: sequence-parallel exact attention over the ICI ring.

The reference has NO context-parallel implementation (SURVEY.md §2.9 verified
absent); this is the TPU-native design covering the LongNet/long-context
capability envelope: shard the sequence over a mesh axis, keep q local, and
rotate K/V chunks around the ring with ppermute while merging partial
attention with online-softmax statistics. Communication rides ICI and
overlaps with the per-chunk matmuls (XLA schedules the ppermute async).

Causal block skipping: a chunk from a later position contributes nothing;
its contribution is masked (SPMD uniformity keeps the collective schedule
identical across devices).

Use under shard_map, e.g.:

    mesh = make_mesh({"seq": 8})
    f = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="seq", causal=True),
        mesh=mesh,
        in_specs=P(None, "seq"), out_specs=P(None, "seq"),
    )
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _pvary(x, axis_name):
    """pvary with fallback across jax versions (pcast is the new name)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)


NEG_INF = -1e30


def ring_attention(
    q: jax.Array,  # [B, Tl, H, D] local shard
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    B, Tl, H, D = q.shape
    if scale is None:
        scale = D**-0.5
    P = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)

    qs = (q * scale).astype(jnp.float32)

    def chunk_scores(k_chunk, k_idx):
        logits = jnp.einsum("bthd,bshd->bhts", qs, k_chunk.astype(jnp.float32))
        if causal:
            q_pos = my_idx * Tl + jnp.arange(Tl)
            k_pos = k_idx * Tl + jnp.arange(Tl)
            keep = k_pos[None, :] <= q_pos[:, None]
            logits = jnp.where(keep[None, None], logits, NEG_INF)
        return logits

    def body(carry, step):
        o, m, l, kc, vc = carry
        k_idx = (my_idx - step) % P  # chunk currently held after `step` hops
        logits = chunk_scores(kc, k_idx)  # [B,H,Tl,S]
        m_c = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_c)
        p = jnp.exp(jnp.where(logits > NEG_INF / 2, logits - m_new, NEG_INF))
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o = o * alpha + jnp.einsum("bhts,bshd->bhtd", p, vc.astype(jnp.float32))
        m = m_new
        # rotate kv to the next device (ring over ICI)
        perm = [(i, (i + 1) % P) for i in range(P)]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (o, m, l, kc, vc), None

    # carries must be device-varying over the ring axis (shard_map vma check)
    o0 = _pvary(jnp.zeros((B, H, Tl, D), jnp.float32), axis_name)
    m0 = _pvary(jnp.full((B, H, Tl, 1), NEG_INF, jnp.float32), axis_name)
    l0 = _pvary(jnp.zeros((B, H, Tl, 1), jnp.float32), axis_name)
    (o, m, l, _, _), _ = jax.lax.scan(
        body, (o0, m0, l0, k, v), jnp.arange(P)
    )
    out = o / jnp.where(l > 0.0, l, 1.0)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # [B, Tl, H, D]
