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

import functools
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


# --------------------------------------------------------------------------- #
# Flash-chunk ring attention (trainable)
# --------------------------------------------------------------------------- #
#
# The dense ring above materializes [B, H, Tl, S] fp32 logits per chunk —
# at the long contexts SP exists for, that is memory/VPU-bound. This
# variant runs the Pallas flash kernel inside every chunk and implements
# the EXACT backward as a second ring pass: the forward saves the GLOBAL
# (out, lse); each backward chunk recomputes its probabilities against the
# global lse (p_c = exp(s_c - lse_glob)), so ds_c = p_c * (dp_c - delta)
# with delta = rowsum(dO * out) — the per-chunk contributions are exactly
# the blocks of the full-attention backward. dk/dv accumulators travel the
# ring WITH their k/v chunks and arrive home after P hops.
#
# Key-padding masks (ragged long-document encoders on the seq axis): the
# kpm shard travels the ring WITH its k/v chunk (one extra [B, Tl] i32
# ppermute per hop) and feeds the flash kernels' per-key mask slot in both
# ring passes. One wrinkle: the kernels emit the (out=0, lse=0) dead-row
# sentinel when a query row sees no valid key in a call, but the online
# merge needs lse=-inf for "this chunk contributed nothing" — chunk-dead
# rows are computed exactly from the mask (any(kpm)==False) and their
# (o_c, lse_c) forced to (0, -inf) before merging. The backward needs no
# such guard: masked columns have p=0, so every cotangent block is 0.
#
# Chunk scheduling: step 0 is always the diagonal (own chunk, causal mask
# with offset 0 — a STATIC kernel configuration); later steps are either
# strictly-past (full visibility, causal=False) or strictly-future
# (contribution zeroed by the validity select, keeping the collective
# schedule SPMD-uniform).


def _merge(o, lse, o_c, lse_c, valid):
    """Online-softmax merge of (normalized out, lse) pairs; invalid chunks
    contribute nothing. All fp32."""
    lse_c = jnp.where(valid, lse_c, NEG_INF)
    o_c = jnp.where(valid, o_c, 0.0)
    m = jnp.maximum(lse, lse_c)
    m_safe = jnp.where(m <= NEG_INF / 2, 0.0, m)
    w1 = jnp.exp(jnp.maximum(lse - m_safe, NEG_INF))
    w2 = jnp.exp(jnp.maximum(lse_c - m_safe, NEG_INF))
    denom = jnp.where(w1 + w2 > 0.0, w1 + w2, 1.0)
    o = (o * w1[..., None] + o_c * w2[..., None]) / denom[..., None]
    lse = m_safe + jnp.log(denom)
    lse = jnp.where(m <= NEG_INF / 2, NEG_INF, lse)
    return o, lse


def _chunk_dead_fix(o_c, lse_c, mask_c):
    """Force (0, -inf) for rows whose ENTIRE traveling chunk is masked —
    the kernel's (0, 0) dead-row sentinel would corrupt the online merge."""
    if mask_c is None:
        return o_c, lse_c
    alive = jnp.any(mask_c != 0, axis=1)[:, None, None]  # [B, 1, 1]
    lse_c = jnp.where(alive, lse_c, NEG_INF)
    o_c = jnp.where(alive[..., None], o_c, 0.0)
    return o_c, lse_c


def _ring_fwd_impl(q, k, v, kpm, axis_name, causal, scale, block_q, block_k,
                   interpret):
    from unilm_tpu.ops import flash_attention as fa

    B, Tl, H, D = q.shape
    P = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    qt = (q * scale).swapaxes(1, 2)  # [B, H, Tl, D] pre-scaled
    kt = k.swapaxes(1, 2)
    vt = v.swapaxes(1, 2)
    mask = None if kpm is None else kpm.astype(jnp.int32)  # [B, Tl] local
    zero = jnp.zeros((1,), jnp.int32)
    lim = jnp.full((1,), Tl, jnp.int32)
    bq = min(block_q, _cdiv8(Tl))
    bk = min(block_k, _cdiv8(Tl))

    # diagonal chunk: own k/v, static causal config
    o, lse = fa._flash_forward(
        qt, kt, vt, None, mask, zero, lim,
        causal=causal, window=0, block_q=bq, block_k=bk, interpret=interpret)
    o, lse = _chunk_dead_fix(o.astype(jnp.float32), lse, mask)

    def body(carry, step):
        if mask is None:
            o, lse, kc, vc = carry
            mc = None
        else:
            o, lse, kc, vc, mc = carry
        perm = [(i, (i + 1) % P) for i in range(P)]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        if mc is not None:
            mc = jax.lax.ppermute(mc, axis_name, perm)
        k_idx = (my_idx - step) % P
        valid = jnp.logical_or(jnp.logical_not(causal), k_idx < my_idx)
        o_c, lse_c = fa._flash_forward(
            qt, kc, vc, None, mc, zero, lim,
            causal=False, window=0, block_q=bq, block_k=bk,
            interpret=interpret)
        o_c, lse_c = _chunk_dead_fix(o_c.astype(jnp.float32), lse_c, mc)
        o, lse = _merge(o, lse, o_c, lse_c, valid)
        carry = (o, lse, kc, vc) if mask is None else (o, lse, kc, vc, mc)
        return carry, None

    if isinstance(P, int) and P == 1:
        steps = jnp.arange(0)
    else:
        steps = jnp.arange(1, P)
    init = (o, lse, kt, vt) if mask is None else (o, lse, kt, vt, mask)
    carry, _ = jax.lax.scan(body, init, steps)
    o, lse = carry[0], carry[1]
    return o, lse  # [B, H, Tl, D] f32, [B, H, Tl] f32


def _cdiv8(n):
    return -(-n // 8) * 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def ring_attention_flash(q, k, v, kpm, axis_name, causal=False, scale=None,
                         block_q=512, block_k=512, interpret=False):
    """Sequence-parallel exact attention with flash kernels per chunk.

    q/k/v: [B, Tl, H, D] local shards under shard_map over `axis_name`;
    kpm: optional [B, Tl] key-padding mask shard (bool/int, nonzero=valid
    — rotates the ring with its k/v chunk). Returns [B, Tl, H, D].
    Differentiable: the backward is a second ring pass of flash-backward
    chunk kernels (see module comment)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    o, _ = _ring_fwd_impl(q, k, v, kpm, axis_name, causal, scale, block_q,
                          block_k, interpret)
    return o.swapaxes(1, 2).astype(q.dtype)


def _ring_flash_fwd(q, k, v, kpm, axis_name, causal, scale, block_q,
                    block_k, interpret):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    o, lse = _ring_fwd_impl(q, k, v, kpm, axis_name, causal, scale, block_q,
                            block_k, interpret)
    out = o.swapaxes(1, 2).astype(q.dtype)
    return out, (q, k, v, kpm, out, lse)


def _ring_flash_bwd(axis_name, causal, scale, block_q, block_k, interpret,
                    res, g):
    from unilm_tpu.ops import flash_attention as fa

    q, k, v, kpm, out, lse = res
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, Tl, H, D = q.shape
    P = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    qt = (q * scale).swapaxes(1, 2)
    kt = k.swapaxes(1, 2)
    vt = v.swapaxes(1, 2)
    gt = g.swapaxes(1, 2)
    ot = out.swapaxes(1, 2)
    mask = None if kpm is None else kpm.astype(jnp.int32)
    zero = jnp.zeros((1,), jnp.int32)
    lim = jnp.full((1,), Tl, jnp.int32)
    bq = min(block_q, _cdiv8(Tl))
    bk = min(block_k, _cdiv8(Tl))

    # diagonal chunk. Globally-dead query rows carry lse=-inf, but every
    # one of their columns is mask-dropped in-kernel (p = where(keep, ...))
    # so all their cotangent blocks are exactly 0 — no sanitization needed.
    dq, dk0, dv0, _ = fa._flash_backward_pallas(
        qt, kt, vt, None, mask, zero, lim, ot, lse, gt,
        causal=causal, window=0, block_q=bq, block_k=bk, interpret=interpret)
    dq = dq.astype(jnp.float32)
    dkt = dk0.astype(jnp.float32)
    dvt = dv0.astype(jnp.float32)

    def body(carry, step):
        if mask is None:
            dq, kc, vc, dkc, dvc = carry
            mc = None
        else:
            dq, kc, vc, dkc, dvc, mc = carry
        perm = [(i, (i + 1) % P) for i in range(P)]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        dkc = jax.lax.ppermute(dkc, axis_name, perm)
        dvc = jax.lax.ppermute(dvc, axis_name, perm)
        if mc is not None:
            mc = jax.lax.ppermute(mc, axis_name, perm)
        k_idx = (my_idx - step) % P
        valid = jnp.logical_or(jnp.logical_not(causal), k_idx < my_idx)
        dq_c, dk_c, dv_c, _ = fa._flash_backward_pallas(
            qt, kc, vc, None, mc, zero, lim, ot, lse, gt,
            causal=False, window=0, block_q=bq, block_k=bk,
            interpret=interpret)
        vf = valid.astype(jnp.float32)
        dq = dq + dq_c.astype(jnp.float32) * vf
        dkc = dkc + dk_c.astype(jnp.float32) * vf
        dvc = dvc + dv_c.astype(jnp.float32) * vf
        carry = ((dq, kc, vc, dkc, dvc) if mask is None
                 else (dq, kc, vc, dkc, dvc, mc))
        return carry, None

    if isinstance(P, int) and P == 1:
        steps = jnp.arange(0)
    else:
        steps = jnp.arange(1, P)
    init = ((dq, kt, vt, dkt, dvt) if mask is None
            else (dq, kt, vt, dkt, dvt, mask))
    carry, _ = jax.lax.scan(body, init, steps)
    dq, dkt, dvt = carry[0], carry[3], carry[4]
    # one final hop returns every accumulator to its chunk's home device
    perm = [(i, (i + 1) % P) for i in range(P)]
    dkt = jax.lax.ppermute(dkt, axis_name, perm)
    dvt = jax.lax.ppermute(dvt, axis_name, perm)

    dq_out = (dq * scale).swapaxes(1, 2).astype(q.dtype)
    dk_out = dkt.swapaxes(1, 2).astype(k.dtype)
    dv_out = dvt.swapaxes(1, 2).astype(v.dtype)
    # bool/int kpm primal takes a float0 cotangent
    import numpy as _np

    dkpm = (None if kpm is None
            else _np.zeros(kpm.shape, jax.dtypes.float0))
    return dq_out, dk_out, dv_out, dkpm


ring_attention_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)
