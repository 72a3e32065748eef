"""Pallas ragged paged decode attention (cf. PAPERS.md: "Ragged Paged
Attention: A High-Performance and Flexible LLM Inference Kernel for TPU").

Decode-step attention where each sequence's KV lives in scattered pages of
a shared pool (runtime/paged_kv.py allocator). The kernel walks the block
table with double-buffered DMA from HBM, so no gather materializes the
per-sequence KV (the XLA fallback in runtime/paged_kv.py copies up to
max_pages*page_size per sequence per step).

Per-(sequence) grid step: all H heads are processed together by lifting the
head-coupled contraction into one MXU matmul with a block-diagonal query
matrix — redundant FLOPs (xH) that are free under the DMA-bound decode
regime, in exchange for full-width MXU tiles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
NBUF = 8  # DMA pipeline depth for the serving append kernel


def _cdiv(a, b):
    return -(-a // b)


def kernel_supported(num_heads: int, head_dim: int, page: int, dtype) -> bool:
    """Mosaic lowering constraints for the block-table kernels: pages are
    DMA'd/sliced as [page, H*D] tiles, so the lane dim (H*D) must be a
    multiple of 128 and the sublane dim (page) a multiple of the dtype's
    tile height. Real serving configs (D 64/128) always satisfy this; tiny
    test configs fall back to the XLA gather formulation."""
    sublane = 16 if jnp.dtype(dtype).itemsize == 2 else 8
    return (num_heads * head_dim) % 128 == 0 and page % sublane == 0


def _paged_kernel(
    # scalar prefetch
    tables_ref,  # [B, max_pages] i32
    lengths_ref,  # [B] i32
    # inputs
    q_ref,  # [1, H, D] (pre-scaled) VMEM
    k_pool,  # [P, page, H*D] ANY/HBM (pre-flattened: Mosaic-friendly 2D tiles)
    v_pool,  # ANY/HBM
    # outputs
    o_ref,  # [1, H, D]
    # scratch
    k_buf,  # VMEM [2, page, H*D]
    v_buf,  # VMEM [2, page, H*D]
    sems,  # DMA sems (2, 2)
    acc_ref,  # VMEM [H, D] f32
    m_ref,  # VMEM [H, 128] f32
    l_ref,  # VMEM [H, 128] f32
    *,
    page: int,
    max_pages: int,
    num_heads: int,
    head_dim: int,
):
    b = pl.program_id(0)
    H, D = num_heads, head_dim
    L = lengths_ref[b]
    npages = (L + page - 1) // page

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def dma(slot, p_idx):
        pid = tables_ref[b, p_idx]
        return (
            pltpu.make_async_copy(k_pool.at[pid], k_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(v_pool.at[pid], v_buf.at[slot], sems.at[slot, 1]),
        )

    @pl.when(npages > 0)
    def _go():
        dk, dv = dma(0, 0)
        dk.start()
        dv.start()

        # block-diagonal query lift: Qbd [H, H*D], row h holds q[h] in cols
        # h*D:(h+1)*D — one [H, H*D] x [H*D, page] matmul computes all heads
        q = q_ref[0]  # [H, D]; keep input dtype — fp32 operands run the MXU slow
        qfull = jnp.tile(q, (1, H))  # row h = q[h] repeated H times (2D ops only)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 1)
        blockmask = (cols // D) == rows
        qbd = jnp.where(blockmask, qfull, jnp.zeros_like(qfull))

        def body(p_idx, _):
            slot = jax.lax.rem(p_idx, 2)
            nslot = jax.lax.rem(p_idx + 1, 2)

            @pl.when(p_idx + 1 < npages)
            def _prefetch():
                dk2, dv2 = dma(nslot, p_idx + 1)
                dk2.start()
                dv2.start()

            dk1, dv1 = dma(slot, p_idx)
            dk1.wait()
            dv1.wait()

            kf = k_buf[slot]  # [page, H*D]
            s = jax.lax.dot_general(
                qbd, kf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, page]
            # ragged mask: absolute token index < L
            tok = p_idx * page + jax.lax.broadcasted_iota(jnp.int32, (H, page), 1)
            keep = tok < L
            s = jnp.where(keep, s, NEG_INF)

            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p_ = jnp.where(keep, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p_, axis=1, keepdims=True)
            m_ref[:, :1] = m_new

            vf = v_buf[slot]  # [page, H*D]
            pv = jax.lax.dot_general(
                p_.astype(vf.dtype), vf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H, H*D]
            pv = jnp.where(blockmask, pv, 0.0)
            # diagonal-block extraction via static 2D slices (all other
            # blocks are zero, so summing the H slices == selecting block h)
            pv_sum = pv[:, 0:D]
            for j in range(1, H):
                pv_sum = pv_sum + pv[:, j * D : (j + 1) * D]
            acc_ref[:] = acc_ref[:] * alpha + pv_sum
            return 0

        jax.lax.fori_loop(0, npages, body, 0)

    l = l_ref[:, :1]
    o_ref[0] = (acc_ref[:] / jnp.where(l > 0.0, l, 1.0)).astype(o_ref.dtype)


def paged_decode_attention(
    q: jax.Array,  # [B, 1, H, D]
    k_pool: jax.Array,  # [P, page, H, D]
    v_pool: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] i32
    lengths: jax.Array,  # [B] i32
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Pallas paged decode attention. Returns [B, 1, H, D]."""
    B, one, H, D = q.shape
    P, page, _, _ = k_pool.shape
    max_pages = block_tables.shape[1]
    if scale is None:
        scale = D**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    kernel = functools.partial(
        _paged_kernel, page=page, max_pages=max_pages, num_heads=H, head_dim=D
    )
    # flatten pools to [P, page, H*D] so all in-kernel tiles are 2D
    k_pool = k_pool.reshape(P, page, H * D)
    v_pool = v_pool.reshape(P, page, H * D)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, page, H * D), k_pool.dtype),
                pltpu.VMEM((2, page, H * D), v_pool.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((H, D), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        interpret=interpret,
    )(
        block_tables.astype(jnp.int32),
        lengths.astype(jnp.int32),
        (q[:, 0] * scale),
        k_pool,
        v_pool,
    )
    return out[:, None]




# --------------------------------------------------------------------------- #
# Serving decode: fused append + attend (page write-back design)
# --------------------------------------------------------------------------- #


def _paged_append_kernel(
    # scalar prefetch
    tables_ref,  # [B, max_pages] i32
    lengths_ref,  # [B] i32 — tokens already in the pool; new token at L
    # inputs
    q_ref,  # [1, H, D] (pre-scaled) VMEM
    knew_ref,  # [1, 1, H*D] VMEM — this step's (rotated) key row
    vnew_ref,  # [1, 1, H*D] VMEM
    k_pool,  # [P, page, H*D] ANY/HBM (aliased to k_out)
    v_pool,  # ANY/HBM (aliased to v_out)
    # outputs
    o_ref,  # [1, H, D]
    k_out,  # == k_pool (input_output_aliases)
    v_out,  # == v_pool
    # scratch
    k_buf,  # VMEM [2, page, H*D]
    v_buf,
    sems,  # DMA sems (2, 2)
    wsems,  # write-back sems (2,)
    acc_ref,
    m_ref,
    l_ref,
    *,
    page: int,
    max_pages: int,
    num_heads: int,
    head_dim: int,
):
    """Serving decode step: walk the block table attending over L+1 tokens,
    where the current token's K/V row is patched into its (already VMEM-
    resident) page during the walk and the patched page is DMA'd back to the
    pool. Pools are input/output-aliased, so chaining the call across layers
    moves zero pool bytes beyond the one-page write-back (row writes are
    sublane-misaligned for bf16 on TPU; a full-page write-back is the
    Mosaic-legal equivalent and costs only page*H*D bytes/seq/layer)."""
    b = pl.program_id(0)
    H, D = num_heads, head_dim
    L = lengths_ref[b]
    total = L + 1
    npages = (total + page - 1) // page  # >= 1
    last = npages - 1  # page containing the new row
    row = jax.lax.rem(L, page)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def dma(slot, p_idx):
        pid = tables_ref[b, p_idx]
        return (
            pltpu.make_async_copy(k_pool.at[pid], k_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(v_pool.at[pid], v_buf.at[slot], sems.at[slot, 1]),
        )

    # deep DMA pipeline: NBUF-1 outstanding page fetches hide the per-DMA
    # latency that a 2-slot double buffer leaves exposed (pages are ~200KB;
    # transfer time is far below DMA issue latency).
    for j in range(NBUF - 1):
        @pl.when(j < npages)
        def _pre(j=j):
            dk, dv = dma(j, j)
            dk.start()
            dv.start()

    # matmuls stay in the input dtype (bf16 on the serving path): fp32
    # operands would run the MXU in its slow mode (see PERFORMANCE.md);
    # accumulation is fp32 via preferred_element_type.
    q = q_ref[0]  # [H, D]
    qfull = jnp.tile(q, (1, H))
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 1)
    blockmask = (cols // D) == rows
    qbd = jnp.where(blockmask, qfull, jnp.zeros_like(qfull))

    def body(p_idx, _):
        slot = jax.lax.rem(p_idx, NBUF)

        @pl.when(p_idx + NBUF - 1 < npages)
        def _prefetch():
            dk2, dv2 = dma(jax.lax.rem(p_idx + NBUF - 1, NBUF), p_idx + NBUF - 1)
            dk2.start()
            dv2.start()

        dk1, dv1 = dma(slot, p_idx)
        dk1.wait()
        dv1.wait()

        @pl.when(p_idx == last)
        def _patch_and_writeback():
            # patch the new row into the resident page, store, DMA back
            sub = jax.lax.broadcasted_iota(jnp.int32, (page, H * D), 0)
            is_row = sub == row
            kn = knew_ref[0].astype(k_buf.dtype)  # [1, H*D]
            vn = vnew_ref[0].astype(v_buf.dtype)
            k_buf[slot] = jnp.where(is_row, kn, k_buf[slot])
            v_buf[slot] = jnp.where(is_row, vn, v_buf[slot])
            pid = tables_ref[b, p_idx]
            wk = pltpu.make_async_copy(k_buf.at[slot], k_out.at[pid], wsems.at[0])
            wv = pltpu.make_async_copy(v_buf.at[slot], v_out.at[pid], wsems.at[1])
            wk.start()
            wv.start()

        kf = k_buf[slot]
        s = jax.lax.dot_general(
            qbd, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        tok = p_idx * page + jax.lax.broadcasted_iota(jnp.int32, (H, page), 1)
        keep = tok < total
        s = jnp.where(keep, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p_ = jnp.where(keep, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p_, axis=1, keepdims=True)
        m_ref[:, :1] = m_new

        vf = v_buf[slot]
        pv = jax.lax.dot_general(
            p_.astype(vf.dtype), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pv = jnp.where(blockmask, pv, 0.0)
        pv_sum = pv[:, 0:D]
        for j in range(1, H):
            pv_sum = pv_sum + pv[:, j * D : (j + 1) * D]
        acc_ref[:] = acc_ref[:] * alpha + pv_sum

        @pl.when(p_idx == last)
        def _wait_writeback():
            pltpu.make_async_copy(k_buf.at[slot], k_out.at[0], wsems.at[0]).wait()
            pltpu.make_async_copy(v_buf.at[slot], v_out.at[0], wsems.at[1]).wait()

        return 0

    jax.lax.fori_loop(0, npages, body, 0)

    l = l_ref[:, :1]
    o_ref[0] = (acc_ref[:] / jnp.where(l > 0.0, l, 1.0)).astype(o_ref.dtype)


def paged_decode_append_attention(
    q: jax.Array,  # [B, 1, H, D] (unscaled)
    k_new: jax.Array,  # [B, 1, H, D]
    v_new: jax.Array,
    k_pool: jax.Array,  # [P, page, H, D]
    v_pool: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] i32
    lengths: jax.Array,  # [B] tokens already present (new row appended at L)
    scale: Optional[float] = None,
):
    """Fused serving decode step: append this token's K/V into its page and
    attend over lengths+1 tokens. Pools are input/output-aliased and updated
    in place. Returns (out [B, 1, H, D], k_pool, v_pool)."""
    B, one, H, D = q.shape
    P, page, _, _ = k_pool.shape
    max_pages = block_tables.shape[1]
    if scale is None:
        scale = D**-0.5

    kernel = functools.partial(
        _paged_append_kernel, page=page, max_pages=max_pages,
        num_heads=H, head_dim=D,
    )
    kp = k_pool.reshape(P, page, H * D)
    vp = v_pool.reshape(P, page, H * D)
    out, kp, vp = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, H * D), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec((1, 1, H * D), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, H, D), lambda b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((NBUF, page, H * D), kp.dtype),
                pltpu.VMEM((NBUF, page, H * D), vp.dtype),
                pltpu.SemaphoreType.DMA((NBUF, 2)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((H, D), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, D), q.dtype),
            jax.ShapeDtypeStruct(kp.shape, kp.dtype),
            jax.ShapeDtypeStruct(vp.shape, vp.dtype),
        ],
        # operand indices include the 2 scalar-prefetch refs: 5=k_pool, 6=v_pool
        input_output_aliases={5: 1, 6: 2},
    )(
        block_tables.astype(jnp.int32),
        lengths.astype(jnp.int32),
        (q[:, 0] * scale),
        k_new.reshape(B, 1, H * D),
        v_new.reshape(B, 1, H * D),
        kp,
        vp,
    )
    return out[:, None], kp.reshape(P, page, H, D), vp.reshape(P, page, H, D)
