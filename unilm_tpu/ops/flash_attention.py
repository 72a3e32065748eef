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

# VMEM cap for the [block_q, Sp] dbias row accumulator in the broadcast-bias
# backward (see _bwd_dq_kernel bias_acc_b): 6 MB leaves room for the q/k/v
# blocks alongside it.
_BIAS_ACC_VMEM_BUDGET = 6 * 2**20



def _dot_kwargs(dtype):
    """Per-dtype matmul precision kwargs for in-kernel dots.

    The precision kwarg must be OMITTED whenever possible: even an
    explicit precision=None (let alone DEFAULT) steers Mosaic into a
    ~2.5x slower matmul mode than leaving the kwarg out (measured on the
    Pix2Struct tower, 64 ms -> 161 ms). The single necessary override:
    bf16 operands under a global 'highest'/'float32'
    jax_default_matmul_precision must force DEFAULT, because Mosaic
    rejects fp32 contract precision on bf16 vectors outright ('Bad lhs
    type' — the test conftest sets highest globally).
    """
    try:
        global_prec = jax.config.jax_default_matmul_precision
    except AttributeError:
        global_prec = None
    # Normalize: newer JAX versions may store a Precision enum / pair here
    # rather than the config string — compare on the lowered string form.
    name = str(global_prec).lower() if global_prec is not None else ""
    if any(k in name for k in ("highest", "float32", "high", "tensorfloat32")):
        if dtype != jnp.float32:
            return {"precision": jax.lax.Precision.DEFAULT}
    return {}

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
    has_tri: bool,
    full_kv: bool,
    block_q: int,
    block_k: int,
):
    idx = 0
    bias_ref = mask_ref = tri_ref = None
    if has_bias:
        bias_ref = rest[idx]
        idx += 1
    if has_mask:
        mask_ref = rest[idx]
        idx += 1
    if has_tri:
        tri_ref = rest[idx]
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
    LOG2E = 1.4426950408889634
    LN2 = 0.6931471805599453

    r0 = qoff + i * block_q          # first query row of this block
    c0 = j * block_k                 # first key column

    # block-level skip: causal block fully above the diagonal, window block
    # fully below, or block fully beyond the valid kv prefix
    run = c0 < limit
    if causal:
        run = jnp.logical_and(run, c0 <= r0 + block_q - 1)
    if window > 0:
        run = jnp.logical_and(run, c0 + block_k - 1 >= r0 - window + 1)

    # Mask-free fast body when every (row, col) pair in the block is
    # visible: the VPU softmax passes dominate at small D (measured), and
    # iota/compare/where masking nearly doubles them. A per-key padding
    # mask makes every block masked, so the fast/diag bodies are omitted
    # STATICALLY then (a dead pl.when body still costs VMEM scratch and
    # hurts pipelining — measured 2.5x on the Pix2Struct tower).
    two_bodies = not has_mask
    # With a statically-full kv (no kv_len) and no per-key mask/window, the
    # masked body can never run: non-causal blocks are all fully visible,
    # and causal square blocking covers everything with {skip, diag, full}.
    # Omit it STATICALLY — a never-taken pl.when body still costs compiled
    # code + VMEM scratch and hurts the pipeline.
    no_masked_body = (
        full_kv and not has_mask and window == 0 and (not causal or has_tri)
    )
    full = jnp.zeros((), bool)
    if two_bodies:
        full = jnp.logical_and(run, c0 + block_k <= limit)
        if causal:
            full = jnp.logical_and(full, c0 + block_k - 1 <= r0)
        if window > 0:
            full = jnp.logical_and(full, r0 + block_q - 1 - c0 < window)

    def _compute_s():
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        return s

    def _accumulate(p, m_new, m_prev):
        alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    # Diagonal blocks (square blocking, r0 == c0, nothing else masked) use a
    # VMEM-resident static triangular additive mask: one add replaces the
    # iota/compare/where chain; exp2(NEG_INF - m) underflows to exactly 0.
    diag = jnp.zeros((), bool)
    if has_tri:
        diag = jnp.logical_and(run, r0 == c0)
        diag = jnp.logical_and(diag, c0 + block_k <= limit)

    if two_bodies:
        @pl.when(full)
        def _body_fast():
            s = _compute_s()
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            _accumulate(p, m_new, m_prev)

    if has_tri:
        @pl.when(diag)
        def _body_diag():
            s = _compute_s() + tri_ref[:]
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            _accumulate(p, m_new, m_prev)

    if not no_masked_body:
        @pl.when(
            jnp.logical_and(
                run, jnp.logical_not(jnp.logical_or(full, diag))
            )
        )
        def _body_masked():
            s = _compute_s()
            rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = c0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            keep = cols < limit
            if causal:
                keep = jnp.logical_and(keep, cols <= rows)
            if window > 0:
                keep = jnp.logical_and(keep, rows - cols < window)
            if has_mask:
                keep = jnp.logical_and(keep, mask_ref[0, 0, :][None, :] != 0)
            s = jnp.where(keep, s, NEG_INF)

            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            # keep-guard: a row fully masked in its first running block has
            # m_new = NEG_INF and exp(s - m_new) would be exp(0) = 1
            p = jnp.where(keep, jnp.exp(s - m_new), 0.0)
            _accumulate(p, m_new, m_prev)

    @pl.when(j == nk - 1)
    def _finish():
        l = l_ref[:, :1]
        out = acc_ref[:] / jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        # row log-sum-exp of the (pre-scaled) logits, consumed by the
        # backward kernels' in-kernel softmax recompute; 0 for dead rows.
        # Stored LANE-major (transposed) into a [B, H*nq, 1, bq] buffer: a
        # [B, H, Tp, 1] output would be tile-padded 128x in HBM (measured
        # 600 MB/layer at BEiT-B batch 512 — the peak training allocation).
        lse = jnp.where(
            l > 0.0, m_ref[:, :1] + jnp.log(jnp.maximum(l, 1e-37)), 0.0
        )
        lse_ref[0, 0] = jnp.transpose(lse)


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
    full_kv: bool = False,
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
        # stream at input dtype; kernels cast blocks to f32 on add
        inputs.append(bias)
    if has_mask:
        if mask.shape[1] != Sp:
            mask = jnp.pad(mask, ((0, 0), (0, Sp - mask.shape[1])))
        # [B, 1, Sp]: a (1, block_k) block over [B, Sp] violates Mosaic's
        # last-two-dims tiling rule whenever B > 1 (sublane 1 != B)
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j, *_: (b, 0, j))
        )
        inputs.append(mask.astype(jnp.int32)[:, None, :])

    # static triangular mask for diagonal blocks (square blocking only)
    has_tri = causal and window == 0 and not has_mask and block_q == block_k
    if has_tri:
        rr = jnp.arange(block_q)[:, None]
        cc = jnp.arange(block_k)[None, :]
        tri = jnp.where(cc <= rr, 0.0, NEG_INF).astype(jnp.float32)
        in_specs.append(
            pl.BlockSpec((block_q, block_k), lambda b, h, i, j, *_: (0, 0))
        )
        inputs.append(tri)

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        window=window,
        has_bias=has_bias,
        has_mask=has_mask,
        has_tri=has_tri,
        full_kv=full_kv and Sp == S,  # padding adds masked columns
        block_q=block_q,
        block_k=block_k,
    )

    flops = 4 * B * H * Tp * Sp * D
    nq = Tp // block_q
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec(
                    (1, 1, 1, block_q),
                    lambda b, h, i, j, *_, nq=nq: (b, h * nq + i, 0, 0),
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, D), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H * nq, 1, block_q), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q.size * 4 + k.size * 4 * 2, transcendentals=B * H * Tp * Sp
        ),
        interpret=interpret,
    )(q_offset, limit, *inputs)
    return out[:, :, :T, :], lse.reshape(B, H, Tp)[:, :, :T]




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
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        cols = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        keep = cols < limit
        # causal masking only bites on the diagonal block (j < i: all valid)
        rows = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        keep = jnp.logical_and(keep, jnp.logical_or(cols <= rows, j < i))
        if has_mask:
            keep = jnp.logical_and(keep, mask_ref[0, 0, :][None, :] != 0)
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
            **_dot_kwargs(q_ref.dtype),
        )
        acc_ref[:] = acc_ref[:] * alpha + pv

    @pl.when(j == i)
    def _finish():
        l = l_ref[:, :1]
        out = acc_ref[:] / jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0] = out.astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m_ref[:, :1] + jnp.log(jnp.maximum(l, 1e-37)), 0.0)
        lse_ref[0, 0] = jnp.transpose(lse)  # lane-major: see _flash_kernel


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
        # stream at input dtype; kernels cast blocks to f32 on add
        inputs.append(bias)
    if has_mask:
        if mask.shape[1] != Tp:
            mask = jnp.pad(mask, ((0, 0), (0, Tp - mask.shape[1])))

        def mmap(b, h, t, *_):
            _, j = _tri_ij(t)
            return (b, 0, j)

        in_specs.append(pl.BlockSpec((1, 1, block), mmap))
        inputs.append(mask.astype(jnp.int32)[:, None, :])

    kernel = functools.partial(
        _flash_tri_kernel,
        has_bias=has_bias,
        has_mask=has_mask,
        block_q=block,
        block_k=block,
    )
    def lmap(b, h, t, *_):
        i, _ = _tri_ij(t)
        return (b, h * nblk + i, 0, 0)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 1, block, D), qmap),
                pl.BlockSpec((1, 1, 1, block), lmap),
            ),
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),
                pltpu.VMEM((block, 128), jnp.float32),
                pltpu.VMEM((block, 128), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H * nblk, 1, block), jnp.float32),
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
    return out[:, :, :T, :], lse.reshape(B, H, Tp)[:, :, :T]

def _vit_kernel(
    q_ref,  # [1, Tp, H*D] (natural projection layout — no transpose)
    k_ref,  # [1, Sp, H*D]
    v_ref,
    *rest,
    num_heads: int, head_dim: int, scale: float, has_bias: bool,
):
    """Layout-native fused encoder attention (ViT/BEiT/LayoutLMv3 shapes).

    One grid step per batch item; heads are lane-slices of the natural
    [T, H*D] projection output, so the kernel needs NO [B,H,T,D] transposes
    around it (measured ~1.5 ms/layer of relayout in-model at BEiT-B
    shapes). Scale and log2(e) are folded into the per-head q slice; the
    softmax runs in the log2 domain on the VMEM-resident score plane.
    kv padding is pre-folded into the (resident) bias; fully fast path only:
    non-causal, full kv, no key-padding mask.
    """
    bias_ref = rest[0] if has_bias else None
    o_ref = rest[1] if has_bias else rest[0]
    LOG2E = 1.4426950408889634
    # bf16 fast softmax: exp2 on the max-shifted scores in bf16 halves the
    # VPU cost of the [Tp, Sp] plane (the kernel's VPU/MXU balance point at
    # ViT shapes — 0.66 -> 0.52 ms/layer at BEiT-B B=128). Error vs the f32
    # softmax is ~2 output ulps (max 0.016 on O(1) outputs), below the bf16
    # matmul noise floor. f32 inputs (parity tests) keep the exact path.
    fast = q_ref.dtype != jnp.float32
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0, :, sl] * jnp.asarray(scale * LOG2E, q_ref.dtype)
        s = jax.lax.dot_general(
            qh, k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )  # [Tp, Sp]
        if has_bias:
            # bias is pre-scaled by log2(e) and pre-masked outside
            s = s + bias_ref[0, h if bias_ref.shape[1] > 1 else 0].astype(jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        if fast:
            p = jnp.exp2((s - m).astype(q_ref.dtype))
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        else:
            p = jnp.exp2(s - m).astype(v_ref.dtype)
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p, v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        o_ref[0, :, sl] = (o * (1.0 / l)).astype(o_ref.dtype)


def _vit_forward(q, k, v, bias, scale, interpret):
    """[B, T, H, D] inputs; non-causal full-kv fused attention."""
    B, T, H, D = q.shape
    S = k.shape[1]
    Tp = _cdiv(T, 8) * 8
    Sp = _cdiv(S, 8) * 8
    qf = q.reshape(B, T, H * D)
    kf = k.reshape(B, S, H * D)
    vf = v.reshape(B, S, H * D)
    if Tp != T:
        qf = jnp.pad(qf, ((0, 0), (0, Tp - T), (0, 0)))
    if Sp != S:
        kf = jnp.pad(kf, ((0, 0), (0, Sp - S), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Sp - S), (0, 0)))

    LOG2E = 1.4426950408889634
    if bias is None and Sp != S:
        colmask = jnp.where(jnp.arange(Sp) < S, 0.0, NEG_INF).astype(jnp.float32)
        bias = jnp.broadcast_to(colmask[None, None, None, :], (1, 1, Tp, Sp))
    elif bias is not None:
        # Pre-scale in f32, stream at the input dtype (bf16 halves the
        # per-layer HBM read; the kernel adds the block into f32 scores).
        bias = (bias.astype(jnp.float32) * LOG2E).astype(bias.dtype)
        if bias.shape[2] != Tp or bias.shape[3] != Sp:
            bias = jnp.pad(
                bias,
                ((0, 0), (0, 0), (0, Tp - bias.shape[2]), (0, Sp - bias.shape[3])),
                constant_values=NEG_INF,
            )
    has_bias = bias is not None

    in_specs = [
        pl.BlockSpec((1, Tp, H * D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Sp, H * D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Sp, H * D), lambda b: (b, 0, 0)),
    ]
    inputs = [qf, kf, vf]
    if has_bias:
        bb = bias.shape[0] > 1
        in_specs.append(
            pl.BlockSpec(
                (1, bias.shape[1], Tp, Sp),
                lambda b, *, bb=bb: (b if bb else 0, 0, 0, 0),
            )
        )
        inputs.append(bias)

    out = pl.pallas_call(
        functools.partial(
            _vit_kernel, num_heads=H, head_dim=D, scale=scale, has_bias=has_bias,
        ),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, Tp, H * D), lambda b: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, H * D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        # NOTE: deliberately no cost_estimate — a CostEstimate on this call
        # measurably slows the kernel (~0.16 ms/call at BEiT-B B=128; the
        # scheduler appears to pad the pipeline to the stated cost).
        interpret=interpret,
    )(*inputs)
    return out[:, :T].reshape(B, T, H, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_encoder_attention(q, k, v, bias, scale, interpret=False):
    """Non-causal full-kv fused attention on [B, T, H, D] (encoder hot path).

    No transposes: heads are lane-slices of the projection output. Backward
    is the dense XLA recompute (these are short-sequence shapes where the
    dense backward is cheap and bias gradients may need broadcast reduction).
    """
    return _vit_forward(q, k, v, bias, scale, interpret)


def _vit_bwd_kernel(
    q_ref,   # [1, Tp, H*D]  (natural projection layout, unscaled)
    k_ref,   # [1, Sp, H*D]
    v_ref,
    do_ref,  # [1, Tp, H*D]
    *rest,
    num_heads: int, head_dim: int, scale: float, has_bias: bool,
    bias_b: bool, bias_h: int,
):
    """One-pass encoder attention backward (BEiT/DiT/LayoutLMv3 training).

    One grid step per batch item, heads looped in-kernel, the whole
    [Tp, Sp] plane in VMEM. p is recomputed from q/k/v (+ pre-scaled
    bias) in f32 — NO residuals are read. Note the forward's bf16 fast
    path computes p via bf16 exp2, so the recomputed p here matches the
    exact-softmax function rather than the forward's fast-softmax output
    bit-for-bit; the difference is bf16 rounding noise (<=2^-8 relative)
    and is the accepted precision contract (gradients of the exact
    function are the better estimator). delta = rowsum(p * dp) replaces
    sum(dO * O), so lse/out never leave the chip. dbias for a batch-broadcast bias ([1, H, T, S] rel-pos
    tables) accumulates across the whole batch sweep inside the
    VMEM-resident output block.

    Replaces the dense XLA recompute backward whose materialized
    [B, H, T, S] f32 logits were the peak training allocation
    (1.17 GB/layer at BEiT-B batch 512) and kept training throughput
    HBM-bound. Reference hot path: beit/engine_for_finetuning.py:35
    train_one_epoch -> modeling_finetune.py Attention (torch autograd).
    """
    idx = 0
    bias_ref = rest[idx] if has_bias else None
    idx += 1 if has_bias else 0
    dq_ref, dk_ref, dv_ref = rest[idx], rest[idx + 1], rest[idx + 2]
    dbias_ref = rest[idx + 3] if has_bias else None

    b = pl.program_id(0)
    LOG2E = 1.4426950408889634

    if has_bias:
        # batch-broadcast bias: the dbias block is revisited across every
        # b — zero once, accumulate, flushed after the last step
        @pl.when(jnp.logical_or(b == 0, bias_b))
        def _zero_dbias():
            dbias_ref[:] = jnp.zeros_like(dbias_ref)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0, :, sl] * jnp.asarray(scale * LOG2E, q_ref.dtype)
        s2 = jax.lax.dot_general(
            qh, k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )  # [Tp, Sp], log2-domain
        if has_bias:
            # bias is pre-scaled by log2(e) and pre-masked outside (same
            # convention as _vit_kernel)
            s2 = s2 + bias_ref[0, h if bias_h > 1 else 0].astype(jnp.float32)
        m = jnp.max(s2, axis=1, keepdims=True)
        e = jnp.exp2(s2 - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)  # natural-domain softmax

        do = do_ref[0, :, sl].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[0, :, sl].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )  # [Tp, Sp]
        delta = jnp.sum(p * dp, axis=1, keepdims=True)  # rowsum(p*dp) == sum(dO*O)
        ds = p * (dp - delta)  # grad wrt natural-domain logits
        if has_bias:
            hb_idx = h if bias_h > 1 else 0
            dbias_ref[0, hb_idx] = dbias_ref[0, hb_idx] + ds
        dsl = ds.astype(k_ref.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            dsl, k_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        ) * scale).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (jax.lax.dot_general(
            dsl, q_ref[0, :, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        ) * scale).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            p.astype(do_ref.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        ).astype(dv_ref.dtype)


def _vit_bwd_profitable(B, H, T, S, D, bias_h, itemsize: int = 2) -> bool:
    """VMEM budget for the one-pass backward: four [Tp, Sp] f32 planes,
    double-buffered q/k/v/do + dq/dk/dv blocks ([Tp, H*D] layout — heads
    are lane slices, no per-head padding), resident bias + dbias."""
    Tp, Sp = _cdiv(T, 8) * 8, _cdiv(S, 8) * 8
    lanes = _cdiv(H * D, 128) * 128
    lanes_s = _cdiv(Sp, 128) * 128
    io = 7 * max(Tp, Sp) * lanes * itemsize * 2
    plane = 4 * Tp * lanes_s * 4
    b = 2 * max(bias_h, 1) * Tp * lanes_s * 4
    return io + plane + b <= 12 * 1024 * 1024


def _vit_backward(q, k, v, bias, g, scale, interpret):
    """[B, T, H, D] inputs; one-pass fused backward. Returns dq/dk/dv
    (+ dbias when bias is not None)."""
    B, T, H, D = q.shape
    S = k.shape[1]
    Tp = _cdiv(T, 8) * 8
    Sp = _cdiv(S, 8) * 8
    qf = q.reshape(B, T, H * D)
    kf = k.reshape(B, S, H * D)
    vf = v.reshape(B, S, H * D)
    gf = g.reshape(B, T, H * D)
    if Tp != T:
        qf = jnp.pad(qf, ((0, 0), (0, Tp - T), (0, 0)))
        gf = jnp.pad(gf, ((0, 0), (0, Tp - T), (0, 0)))
    if Sp != S:
        kf = jnp.pad(kf, ((0, 0), (0, Sp - S), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, Sp - S), (0, 0)))

    LOG2E = 1.4426950408889634
    had_bias = bias is not None
    if bias is None and Sp != S:
        colmask = jnp.where(jnp.arange(Sp) < S, 0.0, NEG_INF).astype(jnp.float32)
        bias = jnp.broadcast_to(colmask[None, None, None, :], (1, 1, Tp, Sp))
    elif bias is not None:
        # Pre-scale in f32, stream at the input dtype (bf16 halves the
        # per-layer HBM read; the kernel adds the block into f32 scores).
        bias = (bias.astype(jnp.float32) * LOG2E).astype(bias.dtype)
        if bias.shape[2] != Tp or bias.shape[3] != Sp:
            bias = jnp.pad(
                bias,
                ((0, 0), (0, 0), (0, Tp - bias.shape[2]), (0, Sp - bias.shape[3])),
                constant_values=NEG_INF,
            )
    has_bias = bias is not None

    in_specs = [
        pl.BlockSpec((1, Tp, H * D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Sp, H * D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Sp, H * D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Tp, H * D), lambda b: (b, 0, 0)),
    ]
    inputs = [qf, kf, vf, gf]
    bias_b = False
    bias_h = 0
    if has_bias:
        bias_b = bias.shape[0] > 1
        bias_h = bias.shape[1]
        in_specs.append(
            pl.BlockSpec(
                (1, bias_h, Tp, Sp),
                lambda b, *, bb=bias_b: (b if bb else 0, 0, 0, 0),
            )
        )
        inputs.append(bias)

    out_specs = [
        pl.BlockSpec((1, Tp, H * D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Sp, H * D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Sp, H * D), lambda b: (b, 0, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, Tp, H * D), q.dtype),
        jax.ShapeDtypeStruct((B, Sp, H * D), k.dtype),
        jax.ShapeDtypeStruct((B, Sp, H * D), v.dtype),
    ]
    if has_bias:
        out_specs.append(
            pl.BlockSpec(
                (1, bias_h, Tp, Sp),
                lambda b, *, bb=bias_b: (b if bb else 0, 0, 0, 0),
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((bias.shape[0], bias_h, Tp, Sp), jnp.float32)
        )

    res = pl.pallas_call(
        functools.partial(
            _vit_bwd_kernel, num_heads=H, head_dim=D, scale=scale,
            has_bias=has_bias, bias_b=bias_b, bias_h=bias_h,
        ),
        grid_spec=pl.GridSpec(
            grid=(B,), in_specs=in_specs, out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Tp * Sp * D,
            bytes_accessed=(qf.size + kf.size * 2 + gf.size) * 2 * 2,
            transcendentals=B * H * Tp * Sp,
        ),
        interpret=interpret,
    )(*inputs)
    dq = res[0][:, :T].reshape(B, T, H, D)
    dk = res[1][:, :S].reshape(B, S, H, D)
    dv = res[2][:, :S].reshape(B, S, H, D)
    if not had_bias:
        return dq, dk, dv, None
    # ds is the grad wrt the NATURAL-domain logits (p*(dp-delta)); bias
    # enters those logits with coefficient 1, so dbias needs no log2(e)
    # factor despite the pre-scaled kernel input.
    dbias = res[3][:, :, :T, :S]
    return dq, dk, dv, dbias


def _vit_ref(q, k, v, bias, scale):
    logits = jnp.einsum(
        "bthd,bshd->bhts", q * scale, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _vit_fwd(q, k, v, bias, scale, interpret=False):
    return _vit_forward(q, k, v, bias, scale, interpret), (q, k, v, bias)


def _vit_bwd(scale, interpret, res, g):
    q, k, v, bias = res
    B, T, H, D = q.shape
    S = k.shape[1]
    bias_h = 0 if bias is None else bias.shape[1]
    if (
        not os.environ.get("UNILM_TPU_ENCODER_DENSE_BWD")
        and _vit_bwd_profitable(B, H, T, S, D, bias_h, q.dtype.itemsize)
    ):
        dq, dk, dv, dbias = _vit_backward(q, k, v, bias, g, scale, interpret)
        if bias is None:
            return dq, dk, dv, None
        return dq, dk, dv, dbias[
            :, :, : bias.shape[2], : bias.shape[3]
        ].astype(bias.dtype)
    # Whole-plane one-pass inadmissible (the [Tp, Sp] plane set exceeds
    # VMEM right at the document-AI shapes, B=32 T=S=709): the blocked
    # one-pass doc backward streams the bias per q-block and accumulates
    # dk/dv in VMEM. Replaces the dense-XLA vjp (materialized [B,H,T,S]
    # f32 logits, ~8 ms/layer) and the blocked-flash vjp (~12 ms/layer
    # with relayout) that round 3 fell back to here.
    from unilm_tpu.ops.doc_attention import doc_backward
    from unilm_tpu.ops.doc_attention import supports as doc_supports

    if doc_supports(q, k, bias, causal=False, window=0, kv_len=None,
                    q_offset=None):
        dq, dk, dv, dbias = doc_backward(
            q, k, v, bias, None, g, scale, interpret=interpret)
        if bias is None:
            return dq, dk, dv, None
        return dq, dk, dv, dbias.astype(bias.dtype)
    if bias is None:
        _, vjp = jax.vjp(lambda q, k, v: _vit_ref(q, k, v, None, scale), q, k, v)
        return (*vjp(g), None)
    _, vjp = jax.vjp(lambda q, k, v, b: _vit_ref(q, k, v, b, scale), q, k, v, bias)
    return vjp(g)


fused_encoder_attention.defvjp(_vit_fwd, _vit_bwd)


def _onepass_kernel(
    qoff_ref, limit_ref,
    q_ref,  # [1, H, Tp, D]
    k_ref,  # [1, H, Sp, D]
    v_ref,
    *rest,
    causal: bool, window: int, has_bias: bool, has_mask: bool,
    num_heads: int, t_pad: int, s_pad: int, fast: bool,
):
    """Short-sequence fused attention: one grid step per batch item, all
    heads looped in-kernel, the whole [Tp, Sp] score plane held in VMEM.

    Replaces the reference's plain bmm+softmax hot loop for ViT-class
    shapes (beit/modeling_finetune.py:120-139): at T≈200 the blocked flash
    grid is per-step-overhead bound (measured 6.4 TF/s) and the XLA path is
    HBM-bound on materialized [B,H,T,S] logits; this kernel keeps logits
    in VMEM and keeps the (head-broadcast) bias resident across the whole
    batch sweep.
    """
    idx = 0
    bias_ref = mask_ref = None
    if has_bias:
        bias_ref = rest[idx]; idx += 1
    if has_mask:
        mask_ref = rest[idx]; idx += 1
    o_ref, lse_ref = rest[idx], rest[idx + 1]

    # Fast path (set by the wrapper: full static kv, no causal/window/mask):
    # column masking for kv padding is pre-folded into the padded bias, so
    # the per-element cost is one add + one exp.
    if not fast:
        qoff = qoff_ref[0]
        limit = limit_ref[0]
        rows = qoff + jax.lax.broadcasted_iota(jnp.int32, (t_pad, s_pad), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t_pad, s_pad), 1)
        keep = cols < limit
        if causal:
            keep = jnp.logical_and(keep, cols <= rows)
        if window > 0:
            keep = jnp.logical_and(keep, rows - cols < window)
        if has_mask:
            keep = jnp.logical_and(keep, mask_ref[0, 0, :][None, :] != 0)

    for h in range(num_heads):
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )  # [Tp, Sp]
        if has_bias:
            s = s + bias_ref[0, h if bias_ref.shape[1] > 1 else 0].astype(jnp.float32)
        if fast:
            # log2-domain softmax: exp2 is the native VPU op (exp costs an
            # extra multiply per element when lowered); scale s once, emit
            # lse back in the natural domain for the backward kernels.
            s2 = s * 1.4426950408889634
            m = jnp.max(s2, axis=1, keepdims=True)
            p = jnp.exp2(s2 - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                **_dot_kwargs(q_ref.dtype),
            )
            o_ref[0, h] = (o / l).astype(o_ref.dtype)
            # lane-major [B, H, Tp] lse (see _flash_kernel): one (Tp,1)
            # transpose per head
            lse_ref[0, h] = jnp.transpose((m + jnp.log2(l)) * 0.6931471805599453)[0]
            continue
        s = jnp.where(keep, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.where(keep, jnp.exp(s - m), 0.0)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        o_ref[0, h] = (o / jnp.where(l > 0.0, l, 1.0)).astype(o_ref.dtype)
        lse_ref[0, h] = jnp.transpose(
            jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-37)), 0.0)
        )[0]


def _flash_forward_onepass(
    q, k, v, bias, mask, q_offset, limit, *, causal, window, full_kv, interpret,
):
    """[B, H, T, D] pre-scaled q; whole-S-in-VMEM fused attention."""
    B, H, T, D = q.shape
    S = k.shape[2]
    Tp = _cdiv(T, 8) * 8
    Sp = _cdiv(S, 128) * 128  # lane-dim of the score plane: keep it aligned
    if Tp != T:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))

    in_specs = [
        pl.BlockSpec((1, H, Tp, D), lambda b, *_: (b, 0, 0, 0)),
        pl.BlockSpec((1, H, Sp, D), lambda b, *_: (b, 0, 0, 0)),
        pl.BlockSpec((1, H, Sp, D), lambda b, *_: (b, 0, 0, 0)),
    ]
    inputs = [q, k, v]
    has_mask = mask is not None
    fast = full_kv and not causal and window == 0 and not has_mask
    if fast and bias is None and Sp != S:
        # fold kv-padding masking into a bias so the kernel's fast path has
        # no masking work: [1, 1, Tp, Sp] with -inf on padded columns
        colmask = jnp.where(jnp.arange(Sp) < S, 0.0, NEG_INF).astype(jnp.float32)
        bias = jnp.broadcast_to(colmask[None, None, None, :], (1, 1, Tp, Sp))
    has_bias = bias is not None
    if has_bias:
        Hb = bias.shape[1]
        if bias.shape[2] != Tp or bias.shape[3] != Sp:
            pad_t, pad_s = Tp - bias.shape[2], Sp - bias.shape[3]
            bias = jnp.pad(
                bias,
                ((0, 0), (0, 0), (0, pad_t), (0, pad_s)),
                constant_values=NEG_INF if fast else 0.0,
            )
        bb = bias.shape[0] > 1
        in_specs.append(
            pl.BlockSpec(
                (1, Hb, Tp, Sp),
                lambda b, *_, bb=bb: (b if bb else 0, 0, 0, 0),
            )
        )
        # stream at input dtype; kernels cast blocks to f32 on add
        inputs.append(bias)
    if has_mask:
        if mask.shape[1] != Sp:
            mask = jnp.pad(mask, ((0, 0), (0, Sp - mask.shape[1])))
        in_specs.append(pl.BlockSpec((1, 1, Sp), lambda b, *_: (b, 0, 0)))
        inputs.append(mask.astype(jnp.int32)[:, None, :])

    kernel = functools.partial(
        _onepass_kernel,
        causal=causal, window=window, has_bias=has_bias, has_mask=has_mask,
        num_heads=H, t_pad=Tp, s_pad=Sp, fast=fast,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, H, Tp, D), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, Tp), lambda b, *_: (b, 0, 0)),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Sp * D,
            bytes_accessed=(q.size + k.size * 2) * 2,
            transcendentals=B * H * Tp * Sp,
        ),
        interpret=interpret,
    )(q_offset, limit, *inputs)
    return out[:, :, :T, :], lse[:, :, :T]


# VMEM budget for choosing the one-pass kernel (bytes; ~half of 16 MB VMEM,
# leaving room for double-buffered q/k/v/out blocks and temporaries)
_ONEPASS_VMEM_BUDGET = 8 * 1024 * 1024


def _onepass_profitable(B, H, T, S, D, bias, window, itemsize: int = 2) -> bool:
    if T > 2048 or S > 2048:
        return False
    Tp, Sp = _cdiv(T, 8) * 8, _cdiv(S, 128) * 128
    lanes_d = max(D, 128)  # D<128 pads lanes in VMEM
    # double-buffered q/k/v at the operand dtype's width (fp32 = 4 bytes)
    qkv = 3 * H * max(Tp, Sp) * lanes_d * itemsize * 2
    plane = 4 * Tp * Sp * 4  # s/p/keep temporaries fp32
    b = 0
    if bias is not None:
        b = bias.shape[1] * Tp * Sp * 4
    return qkv + plane + b <= _ONEPASS_VMEM_BUDGET


def _flash_impl(q, k, v, bias, mask, q_offset, limit, causal, window, block_q,
                block_k, interpret, tri, full_kv=False):
    if tri:
        return _flash_forward_tri(
            q, k, v, bias, mask, q_offset, limit, block=block_q,
            interpret=interpret,
        )
    B, H, T, D = q.shape
    S = k.shape[2]
    if _onepass_profitable(B, H, T, S, D, bias, window, q.dtype.itemsize):
        return _flash_forward_onepass(
            q, k, v, bias, mask, q_offset, limit,
            causal=causal, window=window, full_kv=full_kv, interpret=interpret,
        )
    return _flash_forward(
        q, k, v, bias, mask, q_offset, limit,
        causal=causal, window=window, block_q=block_q, block_k=block_k,
        interpret=interpret, full_kv=full_kv,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13)
)
def _flash(q, k, v, bias, mask, q_offset, limit, causal, window, block_q, block_k,
           interpret, tri=False, full_kv=False):
    return _flash_impl(q, k, v, bias, mask, q_offset, limit, causal, window,
                       block_q, block_k, interpret, tri, full_kv)[0]


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
               block_k, interpret, tri=False, full_kv=False):
    out, lse = _flash_impl(q, k, v, bias, mask, q_offset, limit, causal, window,
                           block_q, block_k, interpret, tri, full_kv)
    return out, (q, k, v, bias, mask, q_offset, limit, out, lse)


def _lane_col(ref, h):
    """Column h of a (1, bq, H) row-stat block as (bq, 1), via one-hot
    lane reduce (dynamic lane indexing is Mosaic-illegal)."""
    blk = ref[0]
    sel = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1) == h
    return jnp.sum(jnp.where(sel, blk, 0.0), axis=1, keepdims=True)


def _bwd_dq_kernel(
    qoff_ref, limit_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    *rest,
    causal: bool, window: int, has_bias: bool, has_mask: bool,
    block_q: int, block_k: int, bias_acc_b: bool = False, acc_nk: int = 0,
):
    """dq (and per-block dbias) — grid (B, H, nq, nk), k-block innermost.

    Split bodies like the forward: fully-visible blocks take a mask-free
    path (the kernels are VPU-bound at small D; iota/compare/where masking
    nearly doubles the plane passes).

    bias_acc_b mode (grid (H, nq, B, nk), batch third): the bias is
    broadcast over batch ([1, H, T, S] rel-pos tables — BEiT/DiT/LayoutLMv3
    training), so dbias must SUM over B. A [block_q, Sp] VMEM row
    accumulator collects ds across every (b, j) step for the current (h, i)
    and flushes once at the last step — without this, broadcast-bias
    training falls back to a dense XLA backward that materializes the
    [B, H, T, S] logits (1.17 GB/layer at BEiT-B batch 512)."""
    idx = 0
    bias_ref = mask_ref = None
    if has_bias:
        bias_ref = rest[idx]; idx += 1
    if has_mask:
        mask_ref = rest[idx]; idx += 1
    if has_bias:
        dq_ref, dbias_ref, acc_ref = rest[idx], rest[idx + 1], rest[idx + 2]
        dbias_acc = rest[idx + 3] if bias_acc_b else None
    else:
        dq_ref, acc_ref = rest[idx], rest[idx + 1]
        dbias_ref = None

    if bias_acc_b:
        h = pl.program_id(0)
        i = pl.program_id(1)
        b = pl.program_id(2)
        nb = pl.num_programs(2)
    else:
        h = pl.program_id(1)
        i = pl.program_id(2)
        b = nb = None
    j = pl.program_id(3)
    nk = pl.num_programs(3)
    qoff = qoff_ref[0]
    limit = limit_ref[0]
    r0 = qoff + i * block_q
    c0 = j * block_k

    # lse/delta arrive TRANSPOSED [B, Tp, H] (compact HBM tiling — the
    # natural [B, H, Tp, 1] layout tile-pads 128x, 600 MB/layer at BEiT-B
    # batch 512). Column h of the (bq, H) block is extracted with a one-hot
    # lane reduce: pure VPU, no Mosaic relayout.
    lse_col = _lane_col(lse_ref, h)
    delta_col = _lane_col(delta_ref, h)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = c0 < limit
    if causal:
        run = jnp.logical_and(run, c0 <= r0 + block_q - 1)
    if window > 0:
        run = jnp.logical_and(run, c0 + block_k - 1 >= r0 - window + 1)

    full = jnp.zeros((), bool)
    if not has_mask:
        full = jnp.logical_and(run, c0 + block_k <= limit)
        if causal:
            full = jnp.logical_and(full, c0 + block_k - 1 <= r0)
        if window > 0:
            full = jnp.logical_and(full, r0 + block_q - 1 - c0 < window)

    def _compute_s():
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        return s

    def _grads(p):
        do = do_ref[0, 0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        ds = p * (dp - delta_col)
        if has_bias and bias_acc_b:
            # single k-block: static full-width store (blocks clamp to
            # non-128-multiples at short S, where dynamic column offsets
            # are Mosaic-illegal); multi-block requires block_k % 128 == 0
            # (guaranteed by the host-side bias_acc_b gate).
            col = slice(None) if acc_nk == 1 else pl.ds(j * block_k, block_k)
            prev = jnp.where(b == 0, 0.0, dbias_acc[:, col])
            dbias_acc[:, col] = prev + ds
        elif has_bias:
            dbias_ref[0, 0] = ds
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )

    if not has_mask:
        @pl.when(full)
        def _body_fast():
            _grads(jnp.exp(_compute_s() - lse_col))

    @pl.when(jnp.logical_and(run, jnp.logical_not(full)))
    def _body_masked():
        s = _compute_s()
        rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = c0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        keep = cols < limit
        if causal:
            keep = jnp.logical_and(keep, cols <= rows)
        if window > 0:
            keep = jnp.logical_and(keep, rows - cols < window)
        if has_mask:
            keep = jnp.logical_and(keep, mask_ref[0, 0, :][None, :] != 0)
        _grads(jnp.where(keep, jnp.exp(s - lse_col), 0.0))

    if has_bias and bias_acc_b:
        @pl.when(jnp.logical_and(jnp.logical_not(run), b == 0))
        def _zero_dbias_col():
            col = slice(None) if acc_nk == 1 else pl.ds(j * block_k, block_k)
            dbias_acc[:, col] = jnp.zeros((block_q, block_k), jnp.float32)

        @pl.when(jnp.logical_and(b == nb - 1, j == nk - 1))
        def _finish_bias():
            dbias_ref[0, 0] = dbias_acc[:]
    elif has_bias:
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

    h = pl.program_id(1)
    j = pl.program_id(2)  # k block
    i = pl.program_id(3)  # q block (inner)
    nq = pl.num_programs(3)
    qoff = qoff_ref[0]
    limit = limit_ref[0]

    r0 = qoff + i * block_q
    c0 = j * block_k

    # transposed [B, Tp, H] row stats — see _bwd_dq_kernel
    lse_col = _lane_col(lse_ref, h)
    delta_col = _lane_col(delta_ref, h)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    run = c0 < limit
    if causal:
        run = jnp.logical_and(run, c0 <= r0 + block_q - 1)
    if window > 0:
        run = jnp.logical_and(run, c0 + block_k - 1 >= r0 - window + 1)

    full = jnp.zeros((), bool)
    if not has_mask:
        full = jnp.logical_and(run, c0 + block_k <= limit)
        if causal:
            full = jnp.logical_and(full, c0 + block_k - 1 <= r0)
        if window > 0:
            full = jnp.logical_and(full, r0 + block_q - 1 - c0 < window)

    def _compute_s():
        s = jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        if has_bias:
            s = s + bias_ref[0, 0].astype(jnp.float32)
        return s

    def _grads(p):
        do = do_ref[0, 0].astype(jnp.float32)
        # dv += p^T dO
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        dp = jax.lax.dot_general(
            do, v_ref[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        ds = p * (dp - delta_col)
        # dk += ds^T q   (q is pre-scaled, so this is grad wrt unscaled k)
        dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )

    if not has_mask:
        @pl.when(full)
        def _body_fast():
            _grads(jnp.exp(_compute_s() - lse_col))

    @pl.when(jnp.logical_and(run, jnp.logical_not(full)))
    def _body_masked():
        s = _compute_s()
        rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = c0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        keep = cols < limit
        if causal:
            keep = jnp.logical_and(keep, cols <= rows)
        if window > 0:
            keep = jnp.logical_and(keep, rows - cols < window)
        if has_mask:
            keep = jnp.logical_and(keep, mask_ref[0, 0, :][None, :] != 0)
        _grads(jnp.where(keep, jnp.exp(s - lse_col), 0.0))

    @pl.when(i == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


# Scoped-VMEM target for the fused one-pass backward (per-core limit is
# 16 MB): dk/dv accumulators + double-buffered input blocks + score planes.
_FUSED_VMEM_TARGET = 13 * 2**20


def _fused_bwd_blocks(S, D, block_q, block_k):
    """Backward block sizes for the fused kernel: start from the forward's
    blocks and halve the larger until the VMEM estimate fits (the backward
    is free to re-block — its lse/delta residuals are full [B, H, T]).
    Returns (bq, bk) or None when even 256-blocks don't fit (huge S)."""
    if S * D * 4 * 2 > 2 * 2**20:
        # dk/dv accumulators past 2 MB leave too little for the score
        # planes (measured: Sp=8192/D=64 blows scoped VMEM even at
        # 512-blocks) — long-context backward stays on the split kernels.
        return None
    bq, bk = min(block_q, 1024), min(block_k, 1024)
    while True:
        Sp = _cdiv(S, bk) * bk
        est = (
            2 * Sp * D * 4              # dk/dv resident f32 accumulators
            + 4 * bq * bk * 4           # score/softmax/dp/ds planes f32
            + 2 * 2 * (bq + bk) * D * 2 # double-buffered bf16 in blocks
            + 2 * bq * D * 4            # dq out block f32
        )
        if est <= _FUSED_VMEM_TARGET:
            return bq, bk
        if bq <= 256 and bk <= 256:
            return None
        if bq >= bk and bq > 256:
            bq //= 2
        else:
            bk //= 2


def _bwd_fused_kernel(
    qoff_ref, limit_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    *rest,
    causal: bool, window: int, has_mask: bool,
    block_q: int, block_k: int,
):
    """One-pass dq+dk+dv — grid (B, H, nq, nk), k-block innermost.

    The two-kernel backward recomputes the score/softmax planes twice (7
    matmul planes total) and streams q/k/v/dO from HBM twice. Here dk and dv
    accumulate in place in their VMEM-resident [Sp, D] f32 output blocks
    (constant index map per (b, h)), so one recompute serves all three
    grads: 5 matmul planes, half the HBM traffic. Used when bias is None and
    2*Sp*D*4 fits _FUSED_KV_VMEM_BUDGET; split fast/masked bodies as in the
    two-kernel path."""
    idx = 0
    mask_ref = None
    if has_mask:
        mask_ref = rest[idx]; idx += 1
    dq_ref, dk_ref, dv_ref = rest[idx : idx + 3]

    h = pl.program_id(1)
    i = pl.program_id(2)
    j = pl.program_id(3)
    qoff = qoff_ref[0]
    limit = limit_ref[0]
    r0 = qoff + i * block_q
    c0 = j * block_k

    # transposed [B, Tp, H] row stats — see _bwd_dq_kernel
    lse_col = _lane_col(lse_ref, h)
    delta_col = _lane_col(delta_ref, h)

    @pl.when(j == 0)
    def _init_dq():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_dkv():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    run = c0 < limit
    if causal:
        run = jnp.logical_and(run, c0 <= r0 + block_q - 1)
    if window > 0:
        run = jnp.logical_and(run, c0 + block_k - 1 >= r0 - window + 1)

    full = jnp.zeros((), bool)
    if not has_mask:
        full = jnp.logical_and(run, c0 + block_k <= limit)
        if causal:
            full = jnp.logical_and(full, c0 + block_k - 1 <= r0)
        if window > 0:
            full = jnp.logical_and(full, r0 + block_q - 1 - c0 < window)

    def _compute_s():
        return jax.lax.dot_general(
            q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )

    def _grads(p):
        do = do_ref[0, 0].astype(jnp.float32)
        row = pl.ds(j * block_k, block_k)
        # dv[j] += p^T dO
        dv_ref[0, 0, row] = dv_ref[0, 0, row] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        dp = jax.lax.dot_general(
            do, v_ref[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        ds = p * (dp - delta_col)
        dsc = ds.astype(q_ref.dtype)
        # dq[i] += ds k   (q pre-scaled: grads are wrt unscaled k)
        dq_ref[0, 0] = dq_ref[0, 0] + jax.lax.dot_general(
            dsc, k_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )
        # dk[j] += ds^T q
        dk_ref[0, 0, row] = dk_ref[0, 0, row] + jax.lax.dot_general(
            dsc, q_ref[0, 0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            **_dot_kwargs(q_ref.dtype),
        )

    if not has_mask:
        @pl.when(full)
        def _body_fast():
            _grads(jnp.exp(_compute_s() - lse_col))

    @pl.when(jnp.logical_and(run, jnp.logical_not(full)))
    def _body_masked():
        s = _compute_s()
        rows = r0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = c0 + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        keep = cols < limit
        if causal:
            keep = jnp.logical_and(keep, cols <= rows)
        if window > 0:
            keep = jnp.logical_and(keep, rows - cols < window)
        if has_mask:
            keep = jnp.logical_and(keep, mask_ref[0, 0, :][None, :] != 0)
        _grads(jnp.where(keep, jnp.exp(s - lse_col), 0.0))


def _flash_backward_fused(
    q, k, v, mask, q_offset, limit, lse, delta, g,
    *, causal, window, block_q, block_k, interpret,
):
    """Single-pallas-call backward (no bias). Returns (dq, dk, dv)."""
    B, H, T, D = q.shape
    S = k.shape[2]
    Tp = _cdiv(T, block_q) * block_q
    Sp = _cdiv(S, block_k) * block_k

    def padT(x):
        return x if x.shape[2] == Tp else jnp.pad(
            x, ((0, 0), (0, 0), (0, Tp - x.shape[2])) + ((0, 0),) * (x.ndim - 3)
        )

    def padS(x):
        return x if x.shape[2] == Sp else jnp.pad(
            x, ((0, 0), (0, 0), (0, Sp - x.shape[2])) + ((0, 0),) * (x.ndim - 3)
        )

    qp, gp = padT(q), padT(g)
    kp, vp = padS(k), padS(v)
    lsep = jnp.transpose(padT(lse), (0, 2, 1))
    deltap = jnp.transpose(padT(delta), (0, 2, 1))

    nq, nk = Tp // block_q, Sp // block_k
    qi = lambda b, h, i, j, *_: (b, h, i, 0)
    ki = lambda b, h, i, j, *_: (b, h, j, 0)
    qr = lambda b, h, i, j, *_: (b, i, 0)
    kv_full = lambda b, h, i, j, *_: (b, h, 0, 0)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), qi),   # q
        pl.BlockSpec((1, 1, block_k, D), ki),   # k
        pl.BlockSpec((1, 1, block_k, D), ki),   # v
        pl.BlockSpec((1, 1, block_q, D), qi),   # dO
        pl.BlockSpec((1, block_q, H), qr),      # lse  [B, Tp, H]
        pl.BlockSpec((1, block_q, H), qr),      # delta
    ]
    inputs = [qp, kp, vp, gp, lsep, deltap]
    has_mask = mask is not None
    if has_mask:
        maskp = mask.astype(jnp.int32)
        if maskp.shape[1] != Sp:
            maskp = jnp.pad(maskp, ((0, 0), (0, Sp - maskp.shape[1])))
        in_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j, *_: (b, 0, j)))
        inputs.append(maskp[:, None, :])

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, causal=causal, window=window,
            has_mask=has_mask, block_q=block_q, block_k=block_k,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, H, nq, nk),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 1, block_q, D), qi),
                pl.BlockSpec((1, 1, Sp, D), kv_full),
                pl.BlockSpec((1, 1, Sp, D), kv_full),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Sp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Sp, D), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * Tp * Sp * D,
            bytes_accessed=(qp.size + kp.size * 2 + gp.size) * 2,
            transcendentals=B * H * Tp * Sp,
        ),
        interpret=interpret,
    )(q_offset, limit, *inputs)
    return (
        dq[:, :, :T, :].astype(q.dtype),
        dk[:, :, :S, :].astype(k.dtype),
        dv[:, :, :S, :].astype(v.dtype),
    )


def _flash_backward_pallas(
    q, k, v, bias, mask, q_offset, limit, out, lse, g,
    *, causal, window, block_q, block_k, interpret,
):
    B, H, T, D = q.shape
    S = k.shape[2]
    Tp = _cdiv(T, block_q) * block_q
    Sp = _cdiv(S, block_k) * block_k
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    def padT(x):
        return x if x.shape[2] == Tp else jnp.pad(
            x, ((0, 0), (0, 0), (0, Tp - x.shape[2])) + ((0, 0),) * (x.ndim - 3)
        )

    def padS(x):
        return x if x.shape[2] == Sp else jnp.pad(
            x, ((0, 0), (0, 0), (0, Sp - x.shape[2])) + ((0, 0),) * (x.ndim - 3)
        )

    qp, gp = padT(q), padT(g)
    kp, vp = padS(k), padS(v)
    # Row stats go in TRANSPOSED, [B, Tp, H]: the natural [B, H, Tp, 1]
    # operand layout tile-pads the minor dim 1 -> 128 in HBM (600 MB/layer
    # at BEiT-B batch 512). Kernels select column h with a one-hot reduce.
    lsep = jnp.transpose(padT(lse), (0, 2, 1))
    deltap = jnp.transpose(padT(delta), (0, 2, 1))

    has_bias = bias is not None
    has_mask = mask is not None
    biasp = None
    bb = hb = False
    if has_bias:
        bb = bias.shape[0] > 1
        hb = bias.shape[1] > 1
        biasp = jnp.pad(
            bias,
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
            qr = lambda b, h, i, j, *_: (b, i, 0)
            bi = lambda b, h, i, j, *_, bb=bb, hb=hb: (
                b if bb else 0, h if hb else 0, i, j)
            mi = lambda b, h, i, j, *_: (b, 0, j)
        else:
            qi = lambda b, h, j, i, *_: (b, h, i, 0)
            ki = lambda b, h, j, i, *_: (b, h, j, 0)
            qr = lambda b, h, j, i, *_: (b, i, 0)
            bi = lambda b, h, j, i, *_, bb=bb, hb=hb: (
                b if bb else 0, h if hb else 0, i, j)
            mi = lambda b, h, j, i, *_: (b, 0, j)
        sp = [
            pl.BlockSpec((1, 1, block_q, D), qi),   # q
            pl.BlockSpec((1, 1, block_k, D), ki),   # k
            pl.BlockSpec((1, 1, block_k, D), ki),   # v
            pl.BlockSpec((1, 1, block_q, D), qi),   # dO
            pl.BlockSpec((1, block_q, H), qr),      # lse  [B, Tp, H]
            pl.BlockSpec((1, block_q, H), qr),      # delta
        ]
        extra = []
        if has_bias:
            sp.append(pl.BlockSpec((1, 1, block_q, block_k), bi))
            extra.append(biasp)
        if has_mask:
            sp.append(pl.BlockSpec((1, 1, block_k), mi))
            extra.append(maskp[:, None, :])
        return sp, extra, qi, ki, bi

    # --- dq (+ dbias) ---
    # Batch-broadcast bias ([1, H, T, S] rel-pos tables) with B > 1: dbias
    # sums over batch, so the grid puts B third with a [block_q, Sp] VMEM
    # row accumulator per (h, i). See _bwd_dq_kernel docstring.
    bias_acc_b = (
        has_bias and bias.shape[0] == 1 and B > 1
        and (hb or H == 1)
        and block_q * Sp * 4 <= _BIAS_ACC_VMEM_BUDGET
        and (nk == 1 or block_k % 128 == 0)
    )
    sp, extra, qi, ki, bi = specs("qk")
    if bias_acc_b:
        # index maps take grid ids (h, i, b, j)
        qi = lambda h, i, b, j, *_: (b, h, i, 0)
        ki = lambda h, i, b, j, *_: (b, h, j, 0)
        qr = lambda h, i, b, j, *_: (b, i, 0)
        bi = lambda h, i, b, j, *_, hb=hb: (0, h if hb else 0, i, j)
        mi = lambda h, i, b, j, *_: (b, 0, j)
        sp = [
            pl.BlockSpec((1, 1, block_q, D), qi),   # q
            pl.BlockSpec((1, 1, block_k, D), ki),   # k
            pl.BlockSpec((1, 1, block_k, D), ki),   # v
            pl.BlockSpec((1, 1, block_q, D), qi),   # dO
            pl.BlockSpec((1, block_q, H), qr),      # lse  [B, Tp, H]
            pl.BlockSpec((1, block_q, H), qr),      # delta
        ]
        sp.append(pl.BlockSpec((1, 1, block_q, block_k), bi))
        if has_mask:
            sp.append(pl.BlockSpec((1, 1, block_k), mi))
        grid = (H, nq, B, nk)
        semantics = ("parallel", "parallel", "arbitrary", "arbitrary")
        dbias_spec = pl.BlockSpec(
            (1, 1, block_q, Sp),
            lambda h, i, b, j, *_, hb=hb: (0, h if hb else 0, i, 0))
        scratch = [pltpu.VMEM((block_q, D), jnp.float32),
                   pltpu.VMEM((block_q, Sp), jnp.float32)]
    else:
        grid = (B, H, nq, nk)
        semantics = ("parallel", "parallel", "parallel", "arbitrary")
        dbias_spec = pl.BlockSpec((1, 1, block_q, block_k), bi)
        scratch = [pltpu.VMEM((block_q, D), jnp.float32)]
    out_shapes = [jax.ShapeDtypeStruct((B, H, Tp, D), q.dtype)]
    out_specs = [pl.BlockSpec(
        (1, 1, block_q, D),
        (lambda h, i, b, j, *_: (b, h, i, 0)) if bias_acc_b else qi)]
    if has_bias:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (bias.shape[0], bias.shape[1], Tp, Sp), jnp.float32
            )
        )
        out_specs.append(dbias_spec)
    dq_out = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, causal=causal, window=window, has_bias=has_bias,
            has_mask=has_mask, block_q=block_q, block_k=block_k,
            bias_acc_b=bias_acc_b, acc_nk=nk,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=sp,
            out_specs=tuple(out_specs) if has_bias else out_specs[0],
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shapes) if has_bias else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
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


def _flash_bwd(causal, window, block_q, block_k, interpret, tri, full_kv, res, g):
    q, k, v, bias, mask, q_offset, limit, out, lse = res
    B, H = q.shape[0], q.shape[1]
    # dbias with a broadcast dim needs a cross-grid reduction. The batch
    # case ([1, H, T, S] rel-pos tables, B > 1) is handled in-kernel by the
    # bias_acc_b row accumulator when Sp fits the VMEM budget; the remaining
    # broadcast-head case (and oversized Sp) falls back to the XLA
    # recompute.
    needs_reduce = False
    if bias is not None:
        nk_ = _cdiv(k.shape[2], block_k)
        Sp_ = nk_ * block_k
        acc_ok = (bias.shape[0] == 1 and (bias.shape[1] > 1 or H == 1)
                  and block_q * Sp_ * 4 <= _BIAS_ACC_VMEM_BUDGET
                  and (nk_ == 1 or block_k % 128 == 0))
        needs_reduce = (
            (bias.shape[0] == 1 and B > 1 and not acc_ok)
            or (bias.shape[1] == 1 and H > 1)
        )
    if needs_reduce:
        def f(q, k, v, bias):
            return _ref_attention(q, k, v, bias, mask, q_offset, limit, causal, window)
        _, vjp = jax.vjp(f, q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
    elif (
        bias is None
        and os.environ.get("UNILM_TPU_FUSED_BWD")
        and (fblk := _fused_bwd_blocks(k.shape[2], q.shape[3], block_q, block_k))
        is not None
    ):
        # OPT-IN: measured SLOWER than the split kernels at D=64 (33 vs 73
        # TF/s on the 1.3B GPT shape — the per-step dk/dv read-modify-write
        # is VPU-bound at small D); roughly ties at D=128. Kept for
        # D>=128-dominant workloads and as the reference one-pass schedule.
        # See PERFORMANCE.md "fused one-pass backward".
        # one-pass fused backward: dk/dv accumulate in VMEM-resident output
        # blocks, one softmax recompute serves dq+dk+dv
        delta = jnp.sum(
            g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
        dq, dk, dv = _flash_backward_fused(
            q, k, v, mask, q_offset, limit, lse, delta, g,
            causal=causal, window=window, block_q=fblk[0], block_k=fblk[1],
            interpret=interpret,
        )
        dbias = None
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

    # Square blocking for causal (no window/kpm): enables the static
    # triangular diagonal-block mask, and 1024-blocks amortize per-step
    # overhead best (measured: 108 TF/s at T=4096 vs 57 with 512-blocks;
    # bias blocks add 4 MB f32 per 1024-block, so cap at 512 then).
    if (causal and window == 0 and key_padding_mask is None and T == S
            and q_offset is None):
        big = 1024 if bias is None else 512
        blk = min(big, max(block_q, block_k))
        if S < blk:
            blk = _cdiv(S, 8) * 8
        block_q = block_k = blk

    # Triangular-grid causal schedule: measured perf-neutral vs the dense
    # grid's pl.when skipping on v5e (PERFORMANCE.md), so opt-in only.
    tri = bool(os.environ.get("UNILM_TPU_TRI_FLASH")) and bool(
        causal and window == 0 and q_offset is None and kv_len is None and T == S
    )
    if tri:
        block_q = block_k = min(block_q, block_k)

    # full_kv (static): the kv prefix is the whole cache AND queries start
    # at 0 — both are needed before masked-body elision / pad-fold fast
    # paths are safe (a nonzero q_offset puts causal crossings off the
    # r0 == c0 diagonal).
    out = _flash(
        qt, kt, vt, bias, mask, qoff, limit, causal, window, block_q, block_k,
        interpret, tri, kv_len is None and q_offset is None
    )
    return out.swapaxes(1, 2)
