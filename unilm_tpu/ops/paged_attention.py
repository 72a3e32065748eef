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


def _cdiv(a, b):
    return -(-a // b)


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
        q = q_ref[0].astype(jnp.float32)  # [H, D]
        qfull = jnp.tile(q, (1, H))  # row h = q[h] repeated H times (2D ops only)
        rows = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, H * D), 1)
        blockmask = (cols // D) == rows
        qbd = jnp.where(blockmask, qfull, 0.0)

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

            kf = k_buf[slot].astype(jnp.float32)  # [page, H*D]
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

            vf = v_buf[slot].astype(jnp.float32)  # [page, H*D]
            pv = jax.lax.dot_general(
                p_, vf, (((1,), (0,)), ((), ())),
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
