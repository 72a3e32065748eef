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
    k_pool: jax.Array,  # [P, page, H*D] flat (or [P, page, H, D]; flat avoids
    # the lane-padding relayout on TPU — see run_decode_append_attention)
    v_pool: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] i32
    lengths: jax.Array,  # [B] i32
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Pallas paged decode attention. Returns [B, 1, H, D]."""
    B, one, H, D = q.shape
    P, page = k_pool.shape[0], k_pool.shape[1]
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


def _paged_append_batched_kernel(
    # scalar prefetch
    tables_ref,  # [B, max_pages] i32
    lengths_ref,  # [B] i32 — tokens already in the pool; new token at L
    # inputs (VMEM unless noted)
    q_ref,  # [B*H, H*D] block-diagonal lifted query (pre-scaled)
    knew_ref,  # [B*page, H*D] — row-broadcast new K per sequence block
    vnew_ref,  # [B*page, H*D]
    totals_ref,  # [B*H, 128] i32 — lengths[b]+1 broadcast per head-row
    rowtab_ref,  # [B*page, 128] i32 — b*page + L_b%page per sequence block
    lastpg_ref,  # [B*page, 128] i32 — L_b//page per sequence block
    k_pool,  # [P, page, H*D] ANY/HBM (aliased to k_out)
    v_pool,
    # outputs
    o_ref,  # [B*H, D]
    k_out,
    v_out,
    # scratch
    k_buf,  # VMEM [nbuf, B*page, H*D]
    v_buf,
    sems,  # DMA sems (nbuf, B, 2)
    wsems,  # write-back sems (B, 2)
    acc_ref,  # [B*H, D] f32
    m_ref,  # [B*H, 128] f32
    l_ref,
    *,
    page: int,
    batch: int,
    num_heads: int,
    head_dim: int,
    nbuf: int,
):
    """All-sequence serving decode step (one grid program). At page position
    p, every sequence's p-th page is DMA'd into a sublane-stacked buffer
    [B*page, H*D] and ONE [B*H, H*D] x [H*D-contraction] -> [B*H, B*page]
    matmul scores every (sequence, head) row against every resident token;
    off-diagonal (cross-sequence) and beyond-length entries are masked. This
    trades Bx redundant MXU columns for a walk of max_npages iterations
    instead of B*npages — decode is iteration-latency-bound, so fewer, fatter
    steps win (measured 771us -> ~150us per layer at B=8, ctx=2048).
    The current token's K/V row is patched into its page in-buffer and the
    page DMA'd back (pools are input/output-aliased)."""
    B, H, D = batch, num_heads, head_dim
    HD = H * D
    BP = B * page

    # max pages over the batch (SMEM scalar loop; B is small and static)
    def _mx(b, m):
        return jnp.maximum(m, lengths_ref[b])
    max_len = jax.lax.fori_loop(0, B, _mx, jnp.int32(0))
    npages_max = (max_len + 1 + page - 1) // page

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    # ragged batches leave blocks of shorter sequences unfetched; garbage K
    # is masked out via `keep`, but garbage V would leak NaN through 0*NaN
    # in the pv matmul — zero V once (K can stay uninitialized).
    v_buf[...] = jnp.zeros_like(v_buf)

    def fetch(slot, p_idx):
        for b in range(B):
            @pl.when(p_idx <= lengths_ref[b] // page)
            def _go(b=b):
                pid = tables_ref[b, p_idx]
                pltpu.make_async_copy(
                    k_pool.at[pid], k_buf.at[slot, pl.ds(b * page, page)],
                    sems.at[slot, b, 0],
                ).start()
                pltpu.make_async_copy(
                    v_pool.at[pid], v_buf.at[slot, pl.ds(b * page, page)],
                    sems.at[slot, b, 1],
                ).start()

    def wait_fetch(slot, p_idx):
        for b in range(B):
            @pl.when(p_idx <= lengths_ref[b] // page)
            def _wait(b=b):
                pid = tables_ref[b, p_idx]
                pltpu.make_async_copy(
                    k_pool.at[pid], k_buf.at[slot, pl.ds(b * page, page)],
                    sems.at[slot, b, 0],
                ).wait()
                pltpu.make_async_copy(
                    v_pool.at[pid], v_buf.at[slot, pl.ds(b * page, page)],
                    sems.at[slot, b, 1],
                ).wait()

    for j in range(nbuf - 1):
        @pl.when(j < npages_max)
        def _pre(j=j):
            fetch(j, j)

    rowseq = jax.lax.broadcasted_iota(jnp.int32, (B * H, BP), 0) // H
    colseq = jax.lax.broadcasted_iota(jnp.int32, (B * H, BP), 1) // page
    colpos = jax.lax.broadcasted_iota(jnp.int32, (B * H, BP), 1) - colseq * page
    diag = rowseq == colseq
    totals = totals_ref[:, :1]  # [B*H, 1]
    # head-block masks for extracting each row's head slice of pv
    rowhead = jax.lax.broadcasted_iota(jnp.int32, (B * H, D), 0) % H

    q = q_ref[...]  # [B*H, H*D] block-diagonal (built host-side)

    def body(p_idx, _):
        slot = jax.lax.rem(p_idx, nbuf)

        @pl.when(p_idx + nbuf - 1 < npages_max)
        def _prefetch():
            fetch(jax.lax.rem(p_idx + nbuf - 1, nbuf), p_idx + nbuf - 1)

        wait_fetch(slot, p_idx)

        # patch the new token's K/V row into its page while it is resident
        sub = jax.lax.broadcasted_iota(jnp.int32, (BP, HD), 0)
        is_patch = (sub == rowtab_ref[:, :1]) & (lastpg_ref[:, :1] == p_idx)
        k_buf[slot] = jnp.where(is_patch, knew_ref[...], k_buf[slot])
        v_buf[slot] = jnp.where(is_patch, vnew_ref[...], v_buf[slot])
        for b in range(B):
            @pl.when(p_idx == lengths_ref[b] // page)
            def _writeback(b=b):
                pid = tables_ref[b, p_idx]
                pltpu.make_async_copy(
                    k_buf.at[slot, pl.ds(b * page, page)], k_out.at[pid],
                    wsems.at[b, 0],
                ).start()
                pltpu.make_async_copy(
                    v_buf.at[slot, pl.ds(b * page, page)], v_out.at[pid],
                    wsems.at[b, 1],
                ).start()

        kf = k_buf[slot]  # [B*page, H*D]
        s = jax.lax.dot_general(
            q, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [B*H, B*page]
        tok = p_idx * page + colpos
        keep = diag & (tok < totals)
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
        )  # [B*H, H*D]; row (b,h) needs its head-h column block
        sel = jnp.zeros((B * H, D), jnp.float32)
        for h in range(H):
            sel = sel + jnp.where(rowhead == h, pv[:, h * D:(h + 1) * D], 0.0)
        acc_ref[:] = acc_ref[:] * alpha + sel
        return 0

    jax.lax.fori_loop(0, npages_max, body, 0)

    # write-backs all started (every seq's last page index < npages_max)
    for b in range(B):
        last_b = lengths_ref[b] // page
        pid = tables_ref[b, last_b]
        slot = jax.lax.rem(last_b, nbuf)
        pltpu.make_async_copy(
            k_buf.at[slot, pl.ds(b * page, page)], k_out.at[pid], wsems.at[b, 0]
        ).wait()
        pltpu.make_async_copy(
            v_buf.at[slot, pl.ds(b * page, page)], v_out.at[pid], wsems.at[b, 1]
        ).wait()

    l = l_ref[:, :1]
    o_ref[...] = (acc_ref[:] / jnp.where(l > 0.0, l, 1.0)).astype(o_ref.dtype)


def paged_decode_append_attention(
    q: jax.Array,  # [B, 1, H, D] (unscaled)
    k_new: jax.Array,  # [B, 1, H, D]
    v_new: jax.Array,
    k_pool: jax.Array,  # [P, page, H*D] FLAT (see run_decode_append_attention)
    v_pool: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] i32
    lengths: jax.Array,  # [B] tokens already present (new row appended at L)
    scale: Optional[float] = None,
):
    """Fused serving decode step: append this token's K/V into its page and
    attend over lengths+1 tokens. Pools are input/output-aliased and updated
    in place. Returns (out [B, 1, H, D], k_pool, v_pool)."""
    B, one, H, D = q.shape
    P, page, _ = k_pool.shape
    HD = H * D
    if scale is None:
        scale = D**-0.5

    lengths = lengths.astype(jnp.int32)
    tables = block_tables.astype(jnp.int32)

    # host-side (XLA) lifts: tiny, fused into the surrounding graph
    qs = (q[:, 0] * scale).reshape(B * H, D)  # [B*H, D]
    qfull = jnp.tile(qs, (1, H))  # [B*H, H*D]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B * H, HD), 0) % H
    cols = jax.lax.broadcasted_iota(jnp.int32, (B * H, HD), 1) // D
    qbd = jnp.where(cols == rows, qfull, jnp.zeros_like(qfull))

    knew = jnp.repeat(k_new.reshape(B, HD), page, axis=0)  # [B*page, H*D]
    vnew = jnp.repeat(v_new.reshape(B, HD), page, axis=0)
    totals = jnp.repeat((lengths + 1)[:, None], H, axis=0
                        ).repeat(128, axis=1)[: B * H]  # [B*H, 128]
    base = jnp.arange(B, dtype=jnp.int32) * page
    rowtab = jnp.repeat((base + lengths % page)[:, None], page, axis=0
                        ).repeat(128, axis=1)[: B * page]
    lastpg = jnp.repeat((lengths // page)[:, None], page, axis=0
                        ).repeat(128, axis=1)[: B * page]

    # size the DMA pipeline to the ~16MB scoped-VMEM budget: K+V staging is
    # 2 * nbuf * B*page * HD bytes; leave ~5MB for inputs/accumulators.
    slot_bytes = 2 * B * page * HD * jnp.dtype(k_pool.dtype).itemsize
    nbuf = int(max(2, min(NBUF, (11 * 2**20) // max(slot_bytes, 1))))

    kernel = functools.partial(
        _paged_append_batched_kernel, page=page, batch=B,
        num_heads=H, head_dim=D, nbuf=nbuf,
    )
    kp = k_pool
    vp = v_pool
    out, kp, vp = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((B * H, HD), lambda *_: (0, 0)),
                pl.BlockSpec((B * page, HD), lambda *_: (0, 0)),
                pl.BlockSpec((B * page, HD), lambda *_: (0, 0)),
                pl.BlockSpec((B * H, 128), lambda *_: (0, 0)),
                pl.BlockSpec((B * page, 128), lambda *_: (0, 0)),
                pl.BlockSpec((B * page, 128), lambda *_: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((B * H, D), lambda *_: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((nbuf, B * page, HD), kp.dtype),
                pltpu.VMEM((nbuf, B * page, HD), vp.dtype),
                pltpu.SemaphoreType.DMA((nbuf, B, 2)),
                pltpu.SemaphoreType.DMA((B, 2)),
                pltpu.VMEM((B * H, D), jnp.float32),
                pltpu.VMEM((B * H, 128), jnp.float32),
                pltpu.VMEM((B * H, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, D), q.dtype),
            jax.ShapeDtypeStruct(kp.shape, kp.dtype),
            jax.ShapeDtypeStruct(vp.shape, vp.dtype),
        ],
        # operand indices include the 2 scalar-prefetch refs: 8=k_pool, 9=v_pool
        input_output_aliases={8: 1, 9: 2},
    )(
        tables,
        lengths,
        qbd.astype(q.dtype),
        knew.astype(kp.dtype),
        vnew.astype(vp.dtype),
        totals,
        rowtab,
        lastpg,
        kp,
        vp,
    )
    out = out.reshape(B, H, D)
    return out[:, None], kp, vp




# --------------------------------------------------------------------------- #
# Contiguous-run serving decode (auto-pipelined slab streaming)
# --------------------------------------------------------------------------- #


def _run_decode_kernel(
    # scalar prefetch
    bases_ref,  # [B] i32 — first page id of each run (chunk-aligned)
    lengths_ref,  # [B] i32 — tokens already in the pool; new token at L
    # inputs (blocks)
    q_ref,  # [1, H, D] (pre-scaled)
    knew_ref,  # [1, H, D] — this step's K row (softmax-merged, not yet pooled)
    vnew_ref,  # [1, H, D]
    # when quantized: scale_ref [1, 8, S] f32 (row 0 = K scales, row 1 = V)
    # k_ref [chunk, page, H*D] int8|bf16, v_ref — the (b, c) slab
    # outputs: o_ref [1, H, D]
    # scratch: acc [H, D] f32, m/l [H, 128] f32 (persist across the grid)
    *refs,
    page: int,
    chunk: int,
    num_heads: int,
    head_dim: int,
    quantized: bool,
):
    """Serving decode attention over CONTIGUOUS chunk-aligned page runs,
    with slab movement delegated to Pallas' grid pipeline: the (b, c) grid
    step's [chunk*page, H*D] K/V slab arrives via scalar-prefetch-dependent
    BlockSpec index maps, so the pipeliner overlaps slab DMA with compute at
    full bandwidth. This kernel is PURE READ — measured on v5e at
    B=8/ctx=2048 (kosmos-2.5 shapes):

    - manual double-buffered DMA walks:        ~600-780 us/layer
    - + aliased whole-pool outputs:            +~200 (XLA copies the pool)
    - + dynamic-index-map page outputs:        +~450 (pipeline stalls/flush)
    - this design (read-only, scatter outside): ~140 us/layer  (~roofline)

    The new token's K/V is NOT in the pool yet: its probability mass is
    merged analytically at the end (row-dot + online-softmax merge, pure
    [H, D] VPU ops), and the caller scatters the row into the pool with an
    XLA in-place update ordered AFTER this read.

    Ragged batches: slabs beyond a sequence's last chunk re-fetch its final
    slab (index maps clamp), and the token mask discards them; pool values
    are finite so masked V garbage contributes exact zeros.

    With `quantized`, pool slabs are int8 with per-token symmetric scales in
    a slab-aligned sidecar ([P//chunk, 8, S] f32, rows 0/1 = K/V): dequant
    is one VPU cast plus two row-broadcast multiplies — the slab fetch
    halves, which is the decode roofline."""
    if quantized:
        scale_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref = refs
    else:
        k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref = refs
        scale_ref = None
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    b = pl.program_id(0)
    H, D = num_heads, head_dim
    S = chunk * page
    L = lengths_ref[b]
    nchunks = jnp.maximum((L + S - 1) // S, 1)  # slabs holding existing tokens
    cc = jnp.minimum(c, nchunks - 1)  # the slab actually resident (clamped)

    @pl.when(c == 0)
    def _reset():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [H, D]

    @pl.when(c < nchunks)
    def _compute():
        # Clamped tail steps (c >= nchunks: short sequences inside a
        # PP-sized grid) previously ran the full masked matmul to add
        # exact zeros — ~2.4us each, 0.6 ms/step at kosmos bs=1 with a
        # 6k-token pool holding a 2k prompt. Skipping the body entirely
        # makes grid cost track ceil(len/slab), not the pool bound.
        qfull = jnp.tile(q, (1, H))
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 1)
        blockmask = (cols // D) == rows
        qbd = jnp.where(blockmask, qfull, jnp.zeros_like(qfull))

        kf = k_ref[...].reshape(S, H * D)
        vf = v_ref[...].reshape(S, H * D)
        if quantized:
            kf = kf.astype(q.dtype)
            vf = vf.astype(q.dtype)

        s = jax.lax.dot_general(
            qbd, kf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32
        )  # [H, S]
        if quantized:
            s = s * scale_ref[0, 0:1, :]  # per-token K scales, [1, S]
        tok = cc * S + jax.lax.broadcasted_iota(jnp.int32, (H, S), 1)
        keep = tok < L  # (cc == c inside the guard by construction)
        s = jnp.where(keep, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p_ = jnp.where(keep, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p_, axis=1,
                                                      keepdims=True)
        m_ref[:, :1] = m_new

        if quantized:
            p_ = p_ * scale_ref[0, 1:2, :]  # fold per-token V scales
        pv = jax.lax.dot_general(
            p_.astype(vf.dtype), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, H*D]; row h's head lives in columns h*D:(h+1)*D
        # fold the H diagonal blocks with ONE fp32 matmul (a 16-step
        # static slice loop costs ~16 serial VPU ops per grid step)
        fold = (jax.lax.broadcasted_iota(jnp.int32, (H * D, D), 0) % D
                == jax.lax.broadcasted_iota(jnp.int32, (H * D, D), 1)
                ).astype(jnp.float32)
        pv_sum = jax.lax.dot_general(
            jnp.where(blockmask, pv, 0.0), fold, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, D]
        acc_ref[:] = acc_ref[:] * alpha + pv_sum

    @pl.when(c == nc - 1)
    def _finalize():
        # merge the new token analytically: s_new[h] = q[h] . k_new[h]
        # (pure [H, D] VPU ops — tiny-N MXU formulations of this merge
        # measured ~50us each and dominated the whole kernel)
        kn = knew_ref[0].astype(jnp.float32)  # [H, D]
        vn = vnew_ref[0].astype(jnp.float32)
        s_new = jnp.sum(q.astype(jnp.float32) * kn, axis=1, keepdims=True)
        m_old = m_ref[:, :1]
        m2 = jnp.maximum(m_old, s_new)
        a_old = jnp.exp(m_old - m2)
        a_new = jnp.exp(s_new - m2)
        l2 = l_ref[:, :1] * a_old + a_new
        acc2 = acc_ref[:] * a_old + a_new * vn
        o_ref[0] = (acc2 / jnp.where(l2 > 0.0, l2, 1.0)).astype(o_ref.dtype)


def quantize_kv_rows(k_rows: jax.Array, v_rows: jax.Array):
    """Per-token symmetric int8 quantization of [B, H*D] K/V rows.
    Returns (k_i8, v_i8, kscale, vscale) with row = round(x / scale)."""
    def one(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        sc = jnp.maximum(amax, 1e-6) / 127.0
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) / sc), -127, 127)
        return xi.astype(jnp.int8), sc[:, 0]
    ki, ks = one(k_rows)
    vi, vs = one(v_rows)
    return ki, vi, ks, vs


def run_decode_append_attention(
    q: jax.Array,  # [B, 1, H, D] (unscaled)
    k_new: jax.Array,  # [B, 1, H, D]
    v_new: jax.Array,
    k_pool: jax.Array,  # [P, page, H*D] FLAT; tail pages must stay unallocated
    v_pool: jax.Array,
    bases: jax.Array,  # [B] i32 CHUNK-ALIGNED first page of each run
    lengths: jax.Array,  # [B]
    max_pages: Optional[int] = None,  # per-seq page budget (grid bound)
    scale: Optional[float] = None,
    chunk: int = 8,
    scale_pool: Optional[jax.Array] = None,  # [P//chunk, 8, chunk*page] f32
):
    """Fused serving decode step over contiguous chunk-aligned page runs:
    attend over lengths+1 tokens (the +1 merged in-kernel) and append the
    new K/V row with an XLA in-place row update ordered after the kernel's
    read — the attention kernel stays pure-read, which is what lets it run
    at slab-streaming speed (see _run_decode_kernel). Donate the pools at
    the jit boundary so the scatter updates in place.

    Pools are FLAT [P, page, H*D]: a [P, page, H, D] view lane-pads D to
    128 on TPU, so reshaping per layer relayouts (copies) the whole pool —
    measured 4x the entire kernel cost at D=96.

    With `scale_pool` the pools hold int8 rows quantized per token
    (quantize_kv_rows); the sidecar stores K scales in row 0 and V scales
    in row 1 of each slab's [8, chunk*page] block. P must then be a
    multiple of `chunk` so slabs never straddle layer regions.
    Returns (out, k_pool, v_pool, scale_pool) when quantized, else
    (out [B, 1, H, D], k_pool, v_pool)."""
    B, one, H, D = q.shape
    P, page, _ = k_pool.shape
    HD = H * D
    if scale is None:
        scale = D**-0.5
    if max_pages is None:
        max_pages = P - 1
    C = _cdiv(max_pages, chunk)

    # append the row in place FIRST: the scatter is then the SOLE consumer
    # of the incoming pool value, so XLA updates the donated/loop-carried
    # buffer without copying (scatter-after-read kept the pre-update buffer
    # alive through the kernel and copied ~128MB/layer). The walk below
    # masks the appended row (tok < L); the in-kernel merge adds its
    # contribution exactly once.
    lengths = lengths.astype(jnp.int32)
    bases = bases.astype(jnp.int32)
    pids = bases + lengths // page
    offs = lengths % page
    kn_flat = k_new.reshape(B, HD)
    vn_flat = v_new.reshape(B, HD)
    quantized = scale_pool is not None
    if quantized:
        ki, vi, ks, vs = quantize_kv_rows(kn_flat, vn_flat)
        k_pool = k_pool.at[pids, offs].set(ki)
        v_pool = v_pool.at[pids, offs].set(vi)
        slab_ids = pids // chunk
        pos = (pids % chunk) * page + offs
        scale_pool = scale_pool.at[slab_ids, 0, pos].set(ks)
        scale_pool = scale_pool.at[slab_ids, 1, pos].set(vs)
    else:
        k_pool = k_pool.at[pids, offs].set(kn_flat.astype(k_pool.dtype))
        v_pool = v_pool.at[pids, offs].set(vn_flat.astype(v_pool.dtype))

    kernel = functools.partial(
        _run_decode_kernel, page=page, chunk=chunk, num_heads=H, head_dim=D,
        quantized=quantized,
    )
    kp = k_pool
    vp = v_pool

    def slab(b, c, bases_ref, lengths_ref):
        S = chunk * page
        nchunks = jnp.maximum((lengths_ref[b] + S - 1) // S, 1)  # ceil(L/S)
        cc = jnp.minimum(c, nchunks - 1)
        return (bases_ref[b] // chunk + cc, 0, 0)

    def slab_sc(b, c, bases_ref, lengths_ref):
        S = chunk * page
        nchunks = jnp.maximum((lengths_ref[b] + S - 1) // S, 1)
        cc = jnp.minimum(c, nchunks - 1)
        return (bases_ref[b] // chunk + cc, 0, 0)

    in_specs = [
        pl.BlockSpec((1, H, D), lambda b, c, *_: (b, 0, 0)),
        pl.BlockSpec((1, H, D), lambda b, c, *_: (b, 0, 0)),
        pl.BlockSpec((1, H, D), lambda b, c, *_: (b, 0, 0)),
    ]
    operands = [bases, lengths, (q[:, 0] * scale), k_new[:, 0], v_new[:, 0]]
    if quantized:
        in_specs.append(pl.BlockSpec((1, 8, chunk * page), slab_sc))
        operands.append(scale_pool)
    in_specs += [
        pl.BlockSpec((chunk, page, HD), slab),
        pl.BlockSpec((chunk, page, HD), slab),
    ]
    operands += [kp, vp]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, C),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, H, D), lambda b, c, *_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, D), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
    )(*operands)
    if quantized:
        return out[:, None], k_pool, v_pool, scale_pool
    return out[:, None], k_pool, v_pool
