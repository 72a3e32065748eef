"""Blocked one-pass encoder attention for document-AI shapes (S <= 2048).

The hot shape of LayoutLMv3/TrOCR/DiT fine-tuning is B~32, T=S~709, H=12,
D=64 with a per-example [B, H, T, S] additive bias and a key-padding mask.
Round 3 served it with three paths, all bad in backward: the one-pass ViT
kernel (flash_attention._vit_bwd) needs the whole [Tp, Sp] plane set in
VMEM and stops being admissible right at these shapes, so training fell to
either the dense XLA vjp (materialized [B,H,T,S] f32 logits, ~8 ms/layer)
or the blocked-flash vjp (~12 ms/layer with relayout). Profiled roofline
for the same work is ~1 ms fwd / ~2 ms bwd.

This kernel pair is the shape-targeted design:
- LAYOUT-NATIVE [B, T, H*D] refs like the ViT kernel: heads are static
  lane slices of the natural projection output, zero transposes around
  the pallas calls (pad/copy churn was ~3.6 ms/layer on the blocked path).
- Grid (B, head-groups, q-blocks). Head groups are LANE-ALIGNED block
  slices of the [T, H*D] projection (group width a multiple of 128 lanes,
  so the BlockSpec does the dynamic offset and the in-kernel head slices
  stay static); within a group heads are looped in-kernel. k/v group
  blocks are VMEM-resident across the q-block sweep; the bias streams one
  [hg, bq, Sp] block per step — the bias is the big operand
  (2*H bytes/element) and is read exactly once per pass.
- Backward accumulates dk/dv IN the VMEM-resident output block across the
  sequential q-block sweep — no [B, nq*H, S, D] partial tensors in HBM
  (round 4's backward HBM blow-up) and no XLA-side reduction.
- Backward optionally emits the logit gradient `ds` in bf16 as the dbias
  output — the input to LayoutLMv3's shared-table gradient collector
  (ops/bucket_bias.bias_grad_collector); bf16 noise there is below the
  bf16 matmul floor of the [nb, H] table contraction it feeds.
- Softmax runs in the log2 domain (exp2, scale folded into q) with the
  bf16 fast path of the ViT kernel; f32 inputs keep the exact-softmax
  path for parity tests.

Reference hot path: layoutlmv3 examples/run_funsd_cord.py fine-tune via HF
Trainer -> modeling_layoutlmv3.py:318-321 (bias add) + torch autograd.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import flax.struct

from unilm_tpu.ops.flash_attention import _cdiv, _dot_kwargs

NEG_INF = -1e30
LOG2E = 1.4426950408889634


@flax.struct.dataclass
class HeadMajorBias:
    """Marks a bias stored [H, B|1, T, S] instead of [B|1, H, T, S].

    Head-major is the NATURAL output order of the one-hot MXU bias lookup
    (bucket_bias.materialize_bias layout='hbts'): [H, B*T*S] reshapes into
    it for free, where the [B, H, *] order costs a 386 MB while-loop
    transpose (~16 ms/step at the FUNSD shape). The doc kernels stream
    either order — only the BlockSpec index map changes."""

    hbts: jax.Array


def _doc_fwd_kernel(
    q_ref,     # [1, bq, H*D] (pre-scaled by scale*log2e)
    k_ref,     # [1, Sp, H*D] resident per b
    v_ref,
    kpm_ref,   # [1, 1, Sp] i32 (1 = valid; padding cols folded in)
    *rest,     # [bias_ref [1, hg|1, bq, Sp] | [hg, 1, bq, Sp]] + o_ref
    group_heads: int, head_dim: int, has_bias: bool, bias_h: int,
    hmajor: bool = False,
):
    bias_ref = rest[0] if has_bias else None
    o_ref = rest[1] if has_bias else rest[0]
    fast = q_ref.dtype != jnp.float32
    col_ok = kpm_ref[0] != 0
    for h in range(group_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
        )  # [bq, Sp] log2-domain
        if has_bias:
            if hmajor:
                s = s + bias_ref[h, 0].astype(jnp.float32) * LOG2E
            else:
                s = s + bias_ref[0, h if bias_h > 1 else 0].astype(jnp.float32) * LOG2E
        s = jnp.where(col_ok, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        if fast:
            p = jnp.exp2((s - m).astype(q_ref.dtype))
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        else:
            p = jnp.exp2(s - m).astype(v_ref.dtype)
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p, v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
        )
        o_ref[0, :, sl] = (o * (1.0 / l)).astype(o_ref.dtype)


def _doc_bwd_kernel(
    q_ref,     # [1, bq, H*D] (unscaled)
    k_ref,     # [1, Sp, H*D] resident per b
    v_ref,
    do_ref,    # [1, bq, H*D]
    kpm_ref,   # [1, 1, Sp] i32
    *rest,     # [bias_ref] + dq_ref, dk_ref, dv_ref [+ ds_ref] + 2 scratch
    group_heads: int, head_dim: int, scale: float, has_bias: bool,
    bias_h: int, emit_ds: bool, n_qblocks: int, hmajor: bool = False,
):
    idx = 1 if has_bias else 0
    bias_ref = rest[0] if has_bias else None
    dq_ref, dk_ref, dv_ref = rest[idx], rest[idx + 1], rest[idx + 2]
    ds_ref = rest[idx + 3] if emit_ds else None
    dk_acc, dv_acc = rest[-2], rest[-1]  # VMEM f32 scratch [Sp, hg*D]

    i = pl.program_id(2)

    # dk/dv accumulate across the sequential q-block sweep in f32 VMEM
    # scratch; the LAST q-block writes the output in its final dtype —
    # emitting f32 and slicing/casting in XLA cost ~0.8 ms/layer
    @pl.when(i == 0)
    def _zero():
        dk_acc[...] = jnp.zeros(dk_acc.shape, dk_acc.dtype)
        dv_acc[...] = jnp.zeros(dv_acc.shape, dv_acc.dtype)

    col_ok = kpm_ref[0] != 0
    for h in range(group_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0, :, sl] * jnp.asarray(scale * LOG2E, q_ref.dtype)
        s = jax.lax.dot_general(
            qh, k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
        )
        if has_bias:
            if hmajor:
                s = s + bias_ref[h, 0].astype(jnp.float32) * LOG2E
            else:
                s = s + bias_ref[0, h if bias_h > 1 else 0].astype(jnp.float32) * LOG2E
        s = jnp.where(col_ok, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp2(s - m)
        p = e * (1.0 / jnp.sum(e, axis=1, keepdims=True))  # natural softmax

        do = do_ref[0, :, sl].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[0, :, sl].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
        )
        delta = jnp.sum(p * dp, axis=1, keepdims=True)  # == rowsum(dO*O)
        ds = p * (dp - delta)  # grad wrt natural-domain logits
        if emit_ds:
            if hmajor:
                ds_ref[h, 0] = ds.astype(ds_ref.dtype)
            else:
                ds_ref[0, h] = ds.astype(ds_ref.dtype)
        dsl = ds.astype(k_ref.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            dsl, k_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
        ) * scale).astype(dq_ref.dtype)
        dk_acc[:, sl] += jax.lax.dot_general(
            dsl, q_ref[0, :, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
        ) * scale
        dv_acc[:, sl] += jax.lax.dot_general(
            p.astype(do_ref.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
        )

    @pl.when(i == n_qblocks - 1)
    def _emit():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _prep(q, k, v, bias, kpm, block_q):
    B, T, H, D = q.shape
    S = k.shape[1]
    Tp8 = _cdiv(T, 8) * 8
    bq = Tp8 if Tp8 <= block_q else block_q
    Tp = _cdiv(T, bq) * bq
    Sp = _cdiv(S, 8) * 8

    def padt(x, n):
        return x if x.shape[1] == n else jnp.pad(
            x, ((0, 0), (0, n - x.shape[1]), (0, 0)))

    qf = padt(q.reshape(B, T, H * D), Tp)
    kf = padt(k.reshape(B, S, H * D), Sp)
    vf = padt(v.reshape(B, S, H * D), Sp)
    if kpm is None:
        kpm = jnp.ones((B, S), jnp.int32)
    else:
        kpm = kpm.astype(jnp.int32)
    if Sp != S:
        kpm = jnp.pad(kpm, ((0, 0), (0, Sp - S)))
    kpm = kpm[:, None, :]  # [B, 1, Sp]: legal (1, 1, Sp) block tiling
    if bias is not None and (bias.shape[2] != Tp or bias.shape[3] != Sp):
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, Tp - bias.shape[2]),
                   (0, Sp - bias.shape[3])))
    return qf, kf, vf, kpm, bias, bq, Tp, Sp


def _pick_groups(H, D, bq, Sp, bwd, has_bias):
    """Largest head-group count-per-group hg with hg*D % 128 == 0 whose
    VMEM working set (double-buffered streams + resident accumulators +
    f32 score temporaries) stays under ~12 MB."""
    budget = 12 * 1024 * 1024
    for hg in [h for h in (H, H // 2, H // 3, H // 4, H // 6) if h]:
        if H % hg or (hg * D) % 128:
            continue
        lanes = hg * D
        stream = (4 if has_bias else 0) * hg * bq * Sp * 2   # bias in x2buf
        if bwd:
            stream += (4 if has_bias else 0) * hg * bq * Sp * 2  # ds out x2
            stream += 2 * Sp * lanes * 4                         # dk/dv f32
            stream += 5 * bq * Sp * 4                            # temporaries
        else:
            stream += 3 * bq * Sp * 4
        stream += 4 * Sp * lanes * 2 + 6 * bq * lanes * 2        # k/v + q/o
        if stream <= budget:
            return hg
    # nothing fits the budget: take the SMALLEST lane-aligned group
    return min(
        (h for h in range(1, H + 1) if H % h == 0 and (h * D) % 128 == 0),
        default=H)


def _bias_spec(bias, hg, bq, Sp, hmajor):
    if hmajor:  # bias [H, B|1, T, S]
        bb = bias.shape[1] > 1
        return pl.BlockSpec(
            (hg, 1, bq, Sp),
            lambda b, g, i, *, bb=bb: (g, b if bb else 0, i, 0))
    bb = bias.shape[0] > 1
    bh = bias.shape[1] > 1
    return pl.BlockSpec(
        (1, hg if bh else 1, bq, Sp),
        lambda b, g, i, *, bb=bb, bh=bh: (b if bb else 0, g if bh else 0, i, 0))


def _doc_fwd_impl(q, k, v, bias, kpm, scale, block_q, interpret,
                  hmajor=False):
    B, T, H, D = q.shape
    S = k.shape[1]
    qf, kf, vf, kpmf, biasf, bq, Tp, Sp = _prep(q, k, v, bias, kpm, block_q)
    qs = qf * jnp.asarray(scale * LOG2E, qf.dtype)
    nq = Tp // bq
    has_bias = biasf is not None
    per_head_bias = has_bias and (hmajor or biasf.shape[1] > 1)
    hg = _pick_groups(H, D, bq, Sp, bwd=False, has_bias=per_head_bias)
    G = H // hg
    hgD = hg * D

    in_specs = [
        pl.BlockSpec((1, bq, hgD), lambda b, g, i: (b, i, g)),
        pl.BlockSpec((1, Sp, hgD), lambda b, g, i: (b, 0, g)),
        pl.BlockSpec((1, Sp, hgD), lambda b, g, i: (b, 0, g)),
        pl.BlockSpec((1, 1, Sp), lambda b, g, i: (b, 0, 0)),
    ]
    inputs = [qs, kf, vf, kpmf]
    if has_bias:
        in_specs.append(_bias_spec(biasf, hg, bq, Sp, hmajor))
        inputs.append(biasf)

    out = pl.pallas_call(
        functools.partial(_doc_fwd_kernel, group_heads=hg, head_dim=D,
                          has_bias=has_bias, hmajor=hmajor,
                          bias_h=biasf.shape[1] if has_bias else 0),
        grid=(B, G, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, hgD), lambda b, g, i: (b, i, g)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, H * D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    return out[:, :T].reshape(B, T, H, D)


def doc_backward(q, k, v, bias, kpm, g, scale,
                 block_q: int = 256, interpret: bool = False,
                 ds_dtype=jnp.bfloat16, hmajor: bool = False):
    """Blocked one-pass backward. Returns (dq, dk, dv, dbias|None).

    Usable directly as the backward for ANY non-causal full-kv attention at
    these shapes (flash_attention._vit_bwd routes here when its resident
    plane set exceeds VMEM). dbias is emitted in ds_dtype (bf16 by
    default; f32 inputs keep f32 for exact-parity runs) and reduced over
    batch/heads when the bias was broadcast there."""
    B, T, H, D = q.shape
    S = k.shape[1]
    qf, kf, vf, kpmf, biasf, bq, Tp, Sp = _prep(q, k, v, bias, kpm, block_q)
    gf = g.reshape(B, T, H * D)
    if Tp != T:
        gf = jnp.pad(gf, ((0, 0), (0, Tp - T), (0, 0)))
    nq = Tp // bq
    has_bias = biasf is not None
    emit_ds = has_bias
    if q.dtype == jnp.float32:
        ds_dtype = jnp.float32
    per_head_bias = has_bias and (hmajor or biasf.shape[1] > 1)
    hg = _pick_groups(H, D, bq, Sp, bwd=True, has_bias=per_head_bias)
    G = H // hg
    hgD = hg * D

    in_specs = [
        pl.BlockSpec((1, bq, hgD), lambda b, g_, i: (b, i, g_)),
        pl.BlockSpec((1, Sp, hgD), lambda b, g_, i: (b, 0, g_)),
        pl.BlockSpec((1, Sp, hgD), lambda b, g_, i: (b, 0, g_)),
        pl.BlockSpec((1, bq, hgD), lambda b, g_, i: (b, i, g_)),
        pl.BlockSpec((1, 1, Sp), lambda b, g_, i: (b, 0, 0)),
    ]
    inputs = [qf, kf, vf, gf, kpmf]
    if has_bias:
        in_specs.append(_bias_spec(biasf, hg, bq, Sp, hmajor))
        inputs.append(biasf)

    out_specs = [
        pl.BlockSpec((1, bq, hgD), lambda b, g_, i: (b, i, g_)),
        pl.BlockSpec((1, Sp, hgD), lambda b, g_, i: (b, 0, g_)),
        pl.BlockSpec((1, Sp, hgD), lambda b, g_, i: (b, 0, g_)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, Tp, H * D), q.dtype),
        jax.ShapeDtypeStruct((B, Sp, H * D), k.dtype),
        jax.ShapeDtypeStruct((B, Sp, H * D), v.dtype),
    ]
    if emit_ds:
        if hmajor:
            out_specs.append(pl.BlockSpec(
                (hg, 1, bq, Sp), lambda b, g_, i: (g_, b, i, 0)))
            out_shapes.append(
                jax.ShapeDtypeStruct((H, B, Tp, Sp), jnp.dtype(ds_dtype)))
        else:
            out_specs.append(pl.BlockSpec(
                (1, hg, bq, Sp), lambda b, g_, i: (b, g_, i, 0)))
            out_shapes.append(
                jax.ShapeDtypeStruct((B, H, Tp, Sp), jnp.dtype(ds_dtype)))

    res = pl.pallas_call(
        functools.partial(_doc_bwd_kernel, group_heads=hg, head_dim=D,
                          scale=scale, has_bias=has_bias, hmajor=hmajor,
                          bias_h=biasf.shape[1] if has_bias else 0,
                          emit_ds=emit_ds, n_qblocks=nq),
        grid=(B, G, nq),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=[pltpu.VMEM((Sp, hgD), jnp.float32),
                        pltpu.VMEM((Sp, hgD), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    dq = res[0][:, :T].reshape(B, T, H, D)
    dk = res[1][:, :S].reshape(B, S, H, D)
    dv = res[2][:, :S].reshape(B, S, H, D)
    if not has_bias:
        return dq, dk, dv, None
    ds = res[3][:, :, :T, :S]
    if hmajor:  # ds [H, B, T, S]
        if bias.shape[1] == 1 and B > 1:
            ds = jnp.sum(ds.astype(jnp.float32), axis=1, keepdims=True)
    else:
        if bias.shape[0] == 1 and B > 1:
            ds = jnp.sum(ds.astype(jnp.float32), axis=0, keepdims=True)
        if bias.shape[1] == 1 and H > 1:
            ds = jnp.sum(ds.astype(jnp.float32), axis=1, keepdims=True)
    return dq, dk, dv, ds.astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _doc_attention(q, k, v, bias, key_padding_mask, scale,
                   block_q, interpret, hmajor):
    return _doc_fwd_impl(q, k, v, bias, key_padding_mask, scale,
                         block_q, interpret, hmajor)


def _doc_attention_fwd(q, k, v, bias, kpm, scale, block_q, interpret, hmajor):
    out = _doc_fwd_impl(q, k, v, bias, kpm, scale, block_q, interpret, hmajor)
    return out, (q, k, v, bias, kpm)


def _doc_attention_bwd(scale, block_q, interpret, hmajor, res, g):
    q, k, v, bias, kpm = res
    dq, dk, dv, dbias = doc_backward(
        q, k, v, bias, kpm, g, scale, block_q=block_q, interpret=interpret,
        hmajor=hmajor)
    # bool/int primals take float0 cotangents (like bucket_bias's collector
    # bwd; a same-dtype zeros array is fragile under stricter JAX versions)
    import numpy as _np

    f0 = None if kpm is None else _np.zeros(kpm.shape, jax.dtypes.float0)
    return dq, dk, dv, dbias, f0


_doc_attention.defvjp(_doc_attention_fwd, _doc_attention_bwd)


def doc_attention(q, k, v, bias, key_padding_mask, scale,
                  block_q: int = 256, interpret: bool = False):
    """Non-causal full-kv attention, [B, T, H, D], S <= 2048.

    bias: optional [B|1, H|1, T, S] additive logit bias, or a
    HeadMajorBias wrapping [H, B|1, T, S] (any float dtype — stream it
    bf16: it is read once per layer-pass and the kernel adds it into f32
    scores). key_padding_mask: optional bool [B, S]."""
    hmajor = isinstance(bias, HeadMajorBias)
    if hmajor:
        bias = bias.hbts
    return _doc_attention(q, k, v, bias, key_padding_mask, scale,
                          block_q, interpret, hmajor)


def supports(q, k, bias, *, causal, window, kv_len, q_offset) -> bool:
    """Admissibility. With a per-head bias the streamed [H, bq, Sp] block
    bounds S at 1024 (VMEM); without, the full 2048."""
    B, T, H, D = q.shape
    S = k.shape[1]
    if causal or window or kv_len is not None or q_offset is not None:
        return False
    if T <= 8 or S > 2048:
        return False
    if (H * D) % 128 != 0 or D % 8 != 0 or H * D > 4096:
        return False
    if isinstance(bias, HeadMajorBias):
        b = bias.hbts
        return (b.ndim == 4 and b.shape[0] == H and b.shape[1] in (1, B)
                and b.shape[2] == T and b.shape[3] == S and S <= 1024)
    if bias is not None:
        if bias.ndim != 4 or bias.shape[0] not in (1, B):
            return False
        if bias.shape[1] not in (1, H):
            return False
        if bias.shape[2] != T or bias.shape[3] != S:
            return False
        if bias.shape[1] > 1 and S > 1024:
            return False
    return True
