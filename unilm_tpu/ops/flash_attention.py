"""Pallas TPU flash attention — the centerpiece kernel (SURVEY.md §2.8).

Replaces the reference's external CUDA attention kernels:
- xformers memory_efficient_attention (torchscale multihead_attention.py:141-144)
- flash-attn sliding window (YOCO sliding_window_attention.py:65)
- plain bmm+softmax hot loops of BEiT/LayoutLMv3 (modeling_finetune.py:120-139)

One kernel covers: causal (with query offset for prefill), sliding window,
valid-kv-prefix masking (static-shape decode caches), per-key padding masks,
and an additive relative-position bias with broadcastable batch/head dims
(BEiT 2D tables, LayoutLMv3 1D+2D buckets, T5 buckets) — applied block-wise
so no [T, S] mask is ever materialized in HBM.

Online-softmax accumulation over k-blocks (grid dim 3, 'arbitrary'
semantics), fp32 accumulators in VMEM, MXU matmuls via jnp.dot with
preferred_element_type=float32. Fully-masked causal k-blocks are skipped.

Backward: Pallas kernels with in-kernel recompute (flash-attn style):
the forward also emits the row log-sum-exp; dq (+ per-block dbias) and
dk/dv are produced by two block-accumulating kernels, so no [T, S]
attention matrix ever hits HBM. The XLA-recompute fallback remains only
when a bias gradient would need a cross-batch/head reduction (broadcast
bias with B>1/H>1 — the short-sequence BEiT table case, where dense
backward is cheap anyway).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def is_available() -> bool:
    if os.environ.get("UNILM_TPU_DISABLE_FLASH"):
        return False
    if jax.default_backend() == "tpu":
        return True
    # interpret mode for CPU correctness tests
    return bool(os.environ.get("UNILM_TPU_FLASH_INTERPRET"))


def supports(q, k, bias, window) -> bool:
    B, T, H, D = q.shape
    if D > 256:
        return False
    if bias is not None:
        if bias.ndim != 4:
            return False
        if bias.shape[0] not in (1, B) or bias.shape[1] not in (1, H):
            return False
        if bias.shape[2] != T or bias.shape[3] != k.shape[1]:
            return False
    return True


def _flash_kernel(
    # scalar-prefetch
    qoff_ref,  # [1] i32 — position of q row 0
    limit_ref,  # [1] i32 — valid kv prefix length
    # inputs (blocks)
    q_ref,  # [1, 1, bq, D]  (pre-scaled)
    k_ref,  # [1, 1, bk, D]
    v_ref,  # [1, 1, bk, D]
    *rest,
    causal: bool,
    window: int,
    has_bias: bool,
    has_mask: bool,
    block_q: int,
    block_k: int,
):
    idx = 0
    bias_ref = mask_ref = None
    if has_bias:
        bias_ref = rest[idx]
        idx += 1
    if has_mask:
        mask_ref = rest[idx]
        idx += 1
    o_ref, lse_ref, acc_ref, m_ref, l_ref = rest[idx : idx + 5]

    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    qoff = qoff_ref[0]
    limit = limit_ref[0]

    # block-level skip: causal block fully above the diagonal, window block
    # fully below, or block fully beyond the valid kv prefix
    run = j * block_k < limit
    if causal:
        run = jnp.logical_and(run, j * block_k <= qoff + i * block_q + block_q - 1)
    if window > 0:
        run = jnp.logical_and(
            run, (j + 1) * block_k - 1 >= qoff + i * block_q - window + 1
        )

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]  # [bq, D]
        k = k_ref[0, 0]  # [bk, D]
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, bk]
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)

        rows = qoff + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        cols = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        keep = cols < limit
        if causal:
            keep = jnp.logical_and(keep, cols <= rows)
        if window > 0:
            keep = jnp.logical_and(keep, rows - cols < window)
        if has_mask:
            keep = jnp.logical_and(keep, mask_ref[0, :][None, :] != 0)
        s = jnp.where(keep, s, NEG_INF)

        m_prev = m_ref[:, :1]  # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # explicit keep-guard: a row fully masked in its first running block
        # has m_new = NEG_INF and exp(s - m_new) would be exp(0) = 1
        p = jnp.where(keep, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[0, 0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == nk - 1)
    def _finish():
        l = l_ref[:, :1]
        out = acc_ref[:] / jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        # row log-sum-exp of the (pre-scaled) logits, consumed by the
        # backward kernels' in-kernel softmax recompute; 0 for dead rows
        # (their p is re-masked to 0 in the backward anyway)
        lse = jnp.where(l > 0.0, m_ref[:, :1] + jnp.log(jnp.maximum(l, 1e-37)), 0.0)
        lse_ref[0, 0] = lse


def _flash_forward(
    q,  # [B, H, T, D] pre-scaled
    k,  # [B, H, S, D]
    v,
    bias,  # [Bb, Hb, T, S] or None
    mask,  # [B, S] int32 or None
    q_offset,  # [1] i32
    limit,  # [1] i32
    *,
    causal: bool,
    window: int,
    block_q: int,
    block_k: int,
    interpret: bool,
):
    B, H, T, D = q.shape
    S = k.shape[2]
    Tp = _cdiv(T, block_q) * block_q
    Sp = _cdiv(S, block_k) * block_k
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))

    grid = (B, H, Tp // block_q, Sp // block_k)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, *_: (b, h, j, 0)),
        pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j, *_: (b, h, j, 0)),
    ]
    inputs = [q, k, v]
    has_bias = bias is not None
    has_mask = mask is not None
    if has_bias:
        if bias.shape[2] != Tp or bias.shape[3] != Sp:
            bias = jnp.pad(
                bias,
                ((0, 0), (0, 0), (0, Tp - bias.shape[2]), (0, Sp - bias.shape[3])),
            )
        bb = bias.shape[0] > 1
        hb = bias.shape[1] > 1
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, block_k),
                lambda b, h, i, j, *_, bb=bb, hb=hb: (b if bb else 0, h if hb else 0, i, j),
            )
        )
        inputs.append(bias.astype(jnp.float32))
    if has_mask:
        if mask.shape[1] != Sp:
            mask = jnp.pad(mask, ((0, 0), (0, Sp - mask.shape[1])))
        in_specs.append(pl.BlockSpec((1, block_k), lambda b, h, i, j, *_: (b, j)))
        inputs.append(mask.astype(jnp.int32))

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        window=window,
        has_bias=has_bias,
        has_mask=has_mask,
        block_q=block_q,
        block_k=block_k,
    )

    flops = 4 * B * H * Tp * Sp * D
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, D), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q.size * 4 + k.size * 4 * 2, transcendentals=B * H * Tp * Sp
        ),
        interpret=interpret,
    )(q_offset, limit, *inputs)
    return out[:, :, :T, :], lse[:, :, :T, 0]




def _tri_ij(t):
    """Linear lower-triangle index -> (row block i, col block j), j <= i."""
    tf = t.astype(jnp.float32)
    i = jnp.floor((jnp.sqrt(8.0 * tf + 1.0) - 1.0) * 0.5).astype(jnp.int32)
    # guard float-sqrt boundary error
    tri = i * (i + 1) // 2
    i = jnp.where(t < tri, i - 1, i)
    tri = i * (i + 1) // 2
    i = jnp.where(t - tri > i, i + 1, i)
    j = t - i * (i + 1) // 2
    return i, j


def _flash_tri_kernel(
    qoff_ref,
    limit_ref,
    q_ref,
    k_ref,
    v_ref,
    *rest,
    has_bias: bool,
    has_mask: bool,
    block_q: int,
    block_k: int,
):
    """Causal flash over a SQUASHED lower-triangular grid: only the
    nq*(nq+1)/2 visible blocks are scheduled (and DMA'd) at all — the dense
    grid wastes nearly half its time fetching blocks it then skips."""
    idx = 0
    bias_ref = mask_ref = None
    if has_bias:
        bias_ref = rest[idx]; idx += 1
    if has_mask:
        mask_ref = rest[idx]; idx += 1
    o_ref, lse_ref, acc_ref, m_ref, l_ref = rest[idx : idx + 5]

    t = pl.program_id(2)
    i, j = _tri_ij(t)
    limit = limit_ref[0]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j * block_k < limit)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        cols = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        keep = cols < limit
        # causal masking only bites on the diagonal block (j < i: all valid)
        rows = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        keep = jnp.logical_and(keep, jnp.logical_or(cols <= rows, j < i))
        if has_mask:
            keep = jnp.logical_and(keep, mask_ref[0, :][None, :] != 0)
        s = jnp.where(keep, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(keep, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == i)
    def _finish():
        l = l_ref[:, :1]
        out = acc_ref[:] / jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m_ref[:, :1] + jnp.log(jnp.maximum(l, 1e-37)), 0.0)
        lse_ref[0, 0] = lse


def _flash_forward_tri(
    q, k, v, bias, mask, q_offset, limit, *, block: int, interpret: bool
):
    """Aligned square causal case (training/prefill from position 0)."""
    B, H, T, D = q.shape
    S = k.shape[2]
    Tp = _cdiv(T, block) * block
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Tp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Tp - S), (0, 0)))
    nblk = Tp // block
    ntri = nblk * (nblk + 1) // 2
    grid = (B, H, ntri)

    def qmap(b, h, t, *_):
        i, _ = _tri_ij(t)
        return (b, h, i, 0)

    def kmap(b, h, t, *_):
        _, j = _tri_ij(t)
        return (b, h, j, 0)

    in_specs = [
        pl.BlockSpec((1, 1, block, D), qmap),
        pl.BlockSpec((1, 1, block, D), kmap),
        pl.BlockSpec((1, 1, block, D), kmap),
    ]
    inputs = [q, k, v]
    has_bias = bias is not None
    has_mask = mask is not None
    if has_bias:
        if bias.shape[2] != Tp or bias.shape[3] != Tp:
            bias = jnp.pad(
                bias,
                ((0, 0), (0, 0), (0, Tp - bias.shape[2]), (0, Tp - bias.shape[3])),
            )
        bb = bias.shape[0] > 1
        hb = bias.shape[1] > 1

        def bmap(b, h, t, *_, bb=bb, hb=hb):
            i, j = _tri_ij(t)
            return (b if bb else 0, h if hb else 0, i, j)

        in_specs.append(pl.BlockSpec((1, 1, block, block), bmap))
        inputs.append(bias.astype(jnp.float32))
    if has_mask:
        if mask.shape[1] != Tp:
            mask = jnp.pad(mask, ((0, 0), (0, Tp - mask.shape[1])))

        def mmap(b, h, t, *_):
            _, j = _tri_ij(t)
            return (b, j)

        in_specs.append(pl.BlockSpec((1, block), mmap))
        inputs.append(mask.astype(jnp.int32))

    kernel = functools.partial(
        _flash_tri_kernel,
        has_bias=has_bias,
        has_mask=has_mask,
        block_q=block,
        block_k=block,
    )
    def lmap(b, h, t, *_):
        i, _ = _tri_ij(t)
        return (b, h, i, 0)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 1, block, D), qmap),
                pl.BlockSpec((1, 1, block, 1), lmap),
            ),
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),
                pltpu.VMEM((block, 128), jnp.float32),
                pltpu.VMEM((block, 128), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * Tp * Tp * D,
            bytes_accessed=q.size * 4 + k.size * 4 * 2,
            transcendentals=B * H * Tp * Tp // 2,
        ),
        interpret=interpret,
    )(q_offset, limit, *inputs)
    return out[:, :, :T, :], lse[:, :, :T, 0]

def _flash_impl(q, k, v, bias, mask, q_offset, limit, causal, window, block_q,
                block_k, interpret, tri):
    if tri:
        return _flash_forward_tri(
            q, k, v, bias, mask, q_offset, limit, block=block_q,
            interpret=interpret,
        )
    return _flash_forward(
        q, k, v, bias, mask, q_offset, limit,
        causal=causal, window=window, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12)
)
def _flash(q, k, v, bias, mask, q_offset, limit, causal, window, block_q, block_k,
           interpret, tri=False):
    return _flash_impl(q, k, v, bias, mask, q_offset, limit, causal, window,
                       block_q, block_k, interpret, tri)[0]


def _ref_attention(q, k, v, bias, mask, q_offset, limit, causal, window):
    """XLA reference on [B, H, T, D] pre-scaled q (for the backward pass)."""
    B, H, T, D = q.shape
    S = k.shape[2]
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    rows = q_offset[0] + jnp.arange(T)[:, None]
    cols = jnp.arange(S)[None, :]
    keep = cols < limit[0]
    if causal:
        keep = keep & (cols <= rows)
    if window > 0:
        keep = keep & (rows - cols < window)
    keep = keep[None, None]
    if mask is not None:
        keep = keep & (mask[:, None, None, :] != 0)
    logits = jnp.where(keep, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


def _flash_fwd(q, k, v, bias, mask, q_offset, limit, causal, window, block_q,
               block_k, interpret, tri=False):
    out, lse = _flash_impl(q, k, v, bias, mask, q_offset, limit, causal, window,
                           block_q, block_k, interpret, tri)
    return out, (q, k, v, bias, mask, q_offset, limit, out, lse)


def _bwd_dq_kernel(
    qoff_ref, limit_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    *rest,
    causal: bool, window: int, has_bias: bool, has_mask: bool,
    block_q: int, block_k: int,
):
    """dq (and per-block dbias) — grid (B, H, nq, nk), k-block innermost."""
    idx = 0
    bias_ref = mask_ref = None
    if has_bias:
        bias_ref = rest[idx]; idx += 1
    if has_mask:
        mask_ref = rest[idx]; idx += 1
    if has_bias:
        dq_ref, dbias_ref, acc_ref = rest[idx], rest[idx + 1], rest[idx + 2]
    else:
        dq_ref, acc_ref = rest[idx], rest[idx + 1]
        dbias_ref = None

    i = pl.program_id(2)
    j = pl.program_id(3)
    nk = pl.num_programs(3)
    qoff = qoff_ref[0]
    limit = limit_ref[0]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = j * block_k < limit
    if causal:
        run = jnp.logical_and(run, j * block_k <= qoff + i * block_q + block_q - 1)
    if window > 0:
        run = jnp.logical_and(
            run, (j + 1) * block_k - 1 >= qoff + i * block_q - window + 1
        )

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        rows = qoff + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        cols = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        keep = cols < limit
        if causal:
            keep = jnp.logical_and(keep, cols <= rows)
        if window > 0:
            keep = jnp.logical_and(keep, rows - cols < window)
        if has_mask:
            keep = jnp.logical_and(keep, mask_ref[0, :][None, :] != 0)
        p = jnp.where(keep, jnp.exp(s - lse_ref[0, 0]), 0.0)
        do = do_ref[0, 0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0])
        if has_bias:
            dbias_ref[0, 0] = ds
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if has_bias:
        @pl.when(jnp.logical_not(run))
        def _zero_dbias():
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    @pl.when(j == nk - 1)
    def _finish():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    qoff_ref, limit_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    *rest,
    causal: bool, window: int, has_bias: bool, has_mask: bool,
    block_q: int, block_k: int,
):
    """dk, dv — grid (B, H, nk, nq), q-block innermost."""
    idx = 0
    bias_ref = mask_ref = None
    if has_bias:
        bias_ref = rest[idx]; idx += 1
    if has_mask:
        mask_ref = rest[idx]; idx += 1
    dk_ref, dv_ref, dk_acc, dv_acc = rest[idx : idx + 4]

    j = pl.program_id(2)  # k block
    i = pl.program_id(3)  # q block (inner)
    nq = pl.num_programs(3)
    qoff = qoff_ref[0]
    limit = limit_ref[0]

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    run = j * block_k < limit
    if causal:
        run = jnp.logical_and(run, j * block_k <= qoff + i * block_q + block_q - 1)
    if window > 0:
        run = jnp.logical_and(
            run, (j + 1) * block_k - 1 >= qoff + i * block_q - window + 1
        )

    @pl.when(run)
    def _body():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        rows = qoff + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        cols = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        keep = cols < limit
        if causal:
            keep = jnp.logical_and(keep, cols <= rows)
        if window > 0:
            keep = jnp.logical_and(keep, rows - cols < window)
        if has_mask:
            keep = jnp.logical_and(keep, mask_ref[0, :][None, :] != 0)
        p = jnp.where(keep, jnp.exp(s - lse_ref[0, 0]), 0.0)
        do = do_ref[0, 0].astype(jnp.float32)
        # dv += p^T dO
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v_ref[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0])
        # dk += ds^T q   (q is pre-scaled, so this is grad wrt unscaled k)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward_pallas(
    q, k, v, bias, mask, q_offset, limit, out, lse, g,
    *, causal, window, block_q, block_k, interpret,
):
    B, H, T, D = q.shape
    S = k.shape[2]
    Tp = _cdiv(T, block_q) * block_q
    Sp = _cdiv(S, block_k) * block_k
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )
    lse = lse[..., None]

    def padT(x):
        return x if x.shape[2] == Tp else jnp.pad(
            x, ((0, 0), (0, 0), (0, Tp - x.shape[2])) + ((0, 0),) * (x.ndim - 3)
        )

    def padS(x):
        return x if x.shape[2] == Sp else jnp.pad(
            x, ((0, 0), (0, 0), (0, Sp - x.shape[2])) + ((0, 0),) * (x.ndim - 3)
        )

    qp, gp, lsep, deltap = padT(q), padT(g), padT(lse), padT(delta)
    kp, vp = padS(k), padS(v)

    has_bias = bias is not None
    has_mask = mask is not None
    biasp = None
    bb = hb = False
    if has_bias:
        bb = bias.shape[0] > 1
        hb = bias.shape[1] > 1
        biasp = jnp.pad(
            bias.astype(jnp.float32),
            ((0, 0), (0, 0), (0, Tp - bias.shape[2]), (0, Sp - bias.shape[3])),
        )
    maskp = None
    if has_mask:
        maskp = mask.astype(jnp.int32)
        if maskp.shape[1] != Sp:
            maskp = jnp.pad(maskp, ((0, 0), (0, Sp - maskp.shape[1])))

    nq, nk = Tp // block_q, Sp // block_k

    common_in = [qp, kp, vp, gp, lsep, deltap]

    def specs(order):
        """order: 'qk' for dq grid (b,h,i,j); 'kq' for dkv grid (b,h,j,i)."""
        if order == "qk":
            qi = lambda b, h, i, j, *_: (b, h, i, 0)
            ki = lambda b, h, i, j, *_: (b, h, j, 0)
            qr = lambda b, h, i, j, *_: (b, h, i, 0)
            bi = lambda b, h, i, j, *_, bb=bb, hb=hb: (
                b if bb else 0, h if hb else 0, i, j)
            mi = lambda b, h, i, j, *_: (b, j)
        else:
            qi = lambda b, h, j, i, *_: (b, h, i, 0)
            ki = lambda b, h, j, i, *_: (b, h, j, 0)
            qr = lambda b, h, j, i, *_: (b, h, i, 0)
            bi = lambda b, h, j, i, *_, bb=bb, hb=hb: (
                b if bb else 0, h if hb else 0, i, j)
            mi = lambda b, h, j, i, *_: (b, j)
        sp = [
            pl.BlockSpec((1, 1, block_q, D), qi),   # q
            pl.BlockSpec((1, 1, block_k, D), ki),   # k
            pl.BlockSpec((1, 1, block_k, D), ki),   # v
            pl.BlockSpec((1, 1, block_q, D), qi),   # dO
            pl.BlockSpec((1, 1, block_q, 1), qr),   # lse
            pl.BlockSpec((1, 1, block_q, 1), qr),   # delta
        ]
        extra = []
        if has_bias:
            sp.append(pl.BlockSpec((1, 1, block_q, block_k), bi))
            extra.append(biasp)
        if has_mask:
            sp.append(pl.BlockSpec((1, block_k), mi))
            extra.append(maskp)
        return sp, extra, qi, ki, bi

    # --- dq (+ dbias) ---
    sp, extra, qi, ki, bi = specs("qk")
    out_shapes = [jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype)]
    out_specs = [pl.BlockSpec((1, 1, block_q, D), qi)]
    if has_bias:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (bias.shape[0], bias.shape[1], Tp, Sp), jnp.float32
            )
        )
        out_specs.append(pl.BlockSpec((1, 1, block_q, block_k), bi))
    dq_out = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, causal=causal, window=window, has_bias=has_bias,
            has_mask=has_mask, block_q=block_q, block_k=block_k,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, nq, nk),
            in_specs=sp,
            out_specs=tuple(out_specs) if has_bias else out_specs[0],
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=tuple(out_shapes) if has_bias else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * Tp * Sp * D,
            bytes_accessed=(qp.size + kp.size * 2 + gp.size) * 4,
            transcendentals=B * H * Tp * Sp,
        ),
        interpret=interpret,
    )(q_offset, limit, *common_in, *extra)
    if has_bias:
        dq, dbias = dq_out
        dbias = dbias[:, :, :T, :S].astype(bias.dtype)
    else:
        dq, dbias = dq_out, None
    dq = dq[:, :, :T, :]

    # --- dk, dv ---
    sp, extra, qi, ki, bi = specs("kq")
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, causal=causal, window=window, has_bias=has_bias,
            has_mask=has_mask, block_q=block_q, block_k=block_k,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, nk, nq),
            in_specs=sp,
            out_specs=(
                pl.BlockSpec((1, 1, block_k, D), ki),
                pl.BlockSpec((1, 1, block_k, D), ki),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Sp, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, Sp, D), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * Tp * Sp * D,
            bytes_accessed=(qp.size + kp.size * 2 + gp.size) * 4,
            transcendentals=B * H * Tp * Sp,
        ),
        interpret=interpret,
    )(q_offset, limit, *common_in, *extra)
    return dq, dk[:, :, :S, :], dv[:, :, :S, :], dbias


def _flash_bwd(causal, window, block_q, block_k, interpret, tri, res, g):
    q, k, v, bias, mask, q_offset, limit, out, lse = res
    B, H = q.shape[0], q.shape[1]
    # The Pallas backward emits dbias per (q-block, k-block) cell, so a
    # broadcast bias dim would need a cross-grid reduction; fall back to
    # the XLA recompute for that case (BEiT [1,H,T,S] tables at short T —
    # dense backward is cheap there, and the fused-table path avoids a
    # materialized bias altogether).
    needs_reduce = bias is not None and (
        (bias.shape[0] == 1 and B > 1) or (bias.shape[1] == 1 and H > 1)
    )
    if needs_reduce:
        def f(q, k, v, bias):
            return _ref_attention(q, k, v, bias, mask, q_offset, limit, causal, window)
        _, vjp = jax.vjp(f, q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
    else:
        dq, dk, dv, dbias = _flash_backward_pallas(
            q, k, v, bias, mask, q_offset, limit, out, lse, g,
            causal=causal, window=window, block_q=block_q, block_k=block_k,
            interpret=interpret,
        )
    zero_i = np.zeros(q_offset.shape, jax.dtypes.float0)
    dmask = None if mask is None else np.zeros(mask.shape, jax.dtypes.float0)
    return (dq, dk, dv, dbias, dmask, zero_i, zero_i)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, S, H, D]
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,  # [B|1, H|1, T, S]
    key_padding_mask: Optional[jax.Array] = None,  # bool [B, S]
    scale: Optional[float] = None,
    causal: bool = False,
    q_offset: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
    window: int = 0,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention entry point; layout matches ops.attention.attention."""
    B, T, H, D = q.shape
    S = k.shape[1]
    if scale is None:
        scale = D**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q = min(block_q, _cdiv(T, 8) * 8 if T < block_q else block_q)
    block_k = min(block_k, _cdiv(S, 8) * 8 if S < block_k else block_k)

    qt = (q * scale).swapaxes(1, 2)
    kt = k.swapaxes(1, 2)
    vt = v.swapaxes(1, 2)
    qoff = jnp.reshape(
        jnp.zeros((), jnp.int32) if q_offset is None else q_offset.astype(jnp.int32), (1,)
    )
    limit = jnp.reshape(
        jnp.asarray(S, jnp.int32) if kv_len is None else kv_len.astype(jnp.int32), (1,)
    )
    mask = None if key_padding_mask is None else key_padding_mask.astype(jnp.int32)

    # Triangular-grid causal schedule: measured perf-neutral vs the dense
    # grid's pl.when skipping on v5e (PERFORMANCE.md), so opt-in only.
    tri = bool(os.environ.get("UNILM_TPU_TRI_FLASH")) and bool(
        causal and window == 0 and q_offset is None and kv_len is None and T == S
    )
    if tri:
        block_q = block_k = min(block_q, block_k)

    out = _flash(
        qt, kt, vt, bias, mask, qoff, limit, causal, window, block_q, block_k,
        interpret, tri
    )
    return out.swapaxes(1, 2)
