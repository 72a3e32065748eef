"""Fused bucket-bias flash attention: the bias tile is reconstructed in-VMEM.

LayoutLMv3's 1D+2D bucketed relative attention bias
(layoutlmv3/layoutlmft/models/layoutlmv3/modeling_layoutlmv3.py:507-577,
added to logits as (rel_pos + rel_2d_pos)/sqrt(d) at :318-321) is a
rank-deficient function of tiny inputs: per-example [B, T] positions / bbox
centers bucketed into <=64 bins per table, then looked up in learned
[nb, H] tables. Round 3 materialized the resulting [B, H, T, S] bias and
streamed it through the blocked flash kernel — the stream (plus the f32
dbias it forced in the backward) kept the FUNSD train step at 0.245 MFU.

This op never materializes the bias. The host packs the three bucket
planes into ONE [B, T, S] int32 (6 bits per field); the kernels rebuild
each [block_q, 128]-lane bias chunk in-VMEM with Mosaic's lane-wise
dynamic gather (`jnp.take_along_axis` on a 128-lane operand — the one
gather form the TPU vector unit supports natively) from VMEM-resident
[ntab, H, 128] tables. The packed plane is 4 bytes/element vs
2*H bytes/element for a bf16 bias — and it is DMA'd once per q-block and
reused across all H head steps (the head grid dimension is innermost, so
the block index map is constant in h and Pallas skips the re-fetch).

Backward: the kernel recomputes the bias chunks the same way, emits
dq / per-q-block partial dk,dv / and the logit gradient ds in bf16; the
table gradients are ONE one-hot MXU contraction of ds against the packed
plane per table (the transpose of the forward lookup), done in XLA —
[nb, H] outputs, no [B, H, T, S] f32 dbias anywhere.

Scope: non-causal full-kv self-attention with S <= 2048 (the whole key
axis fits one VMEM block, so no online-softmax state) — exactly the
document-AI encoder shapes (FUNSD 709, 1024-box docs). Everything else
falls back to the materialized-bias paths in ops/attention.py.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unilm_tpu.ops.flash_attention import _cdiv, _dot_kwargs

NEG_INF = -1e30
FIELD_BITS = 6  # up to 64 buckets per table
FIELD_MASK = (1 << FIELD_BITS) - 1
MAX_TABLES = 3


@flax.struct.dataclass
class BucketBias:
    """Symbolic attention bias: packed bucket planes + per-head tables.

    packed: [B|1, T, S] int32, table t's bucket ids in bits [6t, 6t+6).
    tables: tuple of [nb_t, H] float arrays (nb_t <= 64).
    scale:  static float multiplied into the tables before the lookup
            (LayoutLMv3's 1/sqrt(head_dim), modeling:318-321).
    vbias:  optional [B, H, T, S] zero tensor from `bias_grad_collector`.
            When set, the per-layer kernels route the logit gradient `ds`
            to it instead of contracting per layer: JAX sums the layers'
            cotangents (bias tables are shared across layers, so the true
            table grad is contract(sum_layers ds)) and the collector does
            ONE one-hot contraction per step instead of num_layers — the
            per-layer contraction was the round-4 bwd HBM blow-up (each
            layer materialized a [B*T*S, 128] one-hot).
    """

    packed: jax.Array
    tables: Tuple[jax.Array, ...]
    scale: float = flax.struct.field(pytree_node=False, default=1.0)
    vbias: Optional[jax.Array] = None


def pack_bucket_planes(*planes: jax.Array) -> jax.Array:
    """Pack up to 3 int bucket planes (values < 64) into one int32 plane."""
    assert 1 <= len(planes) <= MAX_TABLES
    out = planes[0].astype(jnp.int32)
    for t, p in enumerate(planes[1:], start=1):
        out = out | (p.astype(jnp.int32) << (FIELD_BITS * t))
    return out


def unpack_field(packed: jax.Array, t: int) -> jax.Array:
    return (packed >> (FIELD_BITS * t)) & FIELD_MASK


def materialize_bias(bb: BucketBias, dtype=jnp.float32,
                     layout: str = "bhts") -> jax.Array:
    """Dense bias — the XLA fallback / test oracle.

    One-hot MXU lookup, not a gather: `table[f]` serializes on the TPU
    scalar path (29x slower measured — models/layoutlmv3._bucket_take).

    layout='bhts' -> [B|1, H, T, S] (the public attention convention);
    layout='hbts' -> [H, B|1, T, S]: the one-hot dot's NATURAL output
    order ([H, B*T*S] reshapes into it for free). The [B,H,*] transpose of
    a 386 MB plane lowers to an XLA while-loop worth ~16 ms/step at the
    FUNSD shape — head-major kills it; ops/doc_attention streams either
    layout (HeadMajorBias wrapper)."""
    B, T, S = bb.packed.shape
    # fold the 1/sqrt(d) scale into the tiny [nb, H] tables up front and
    # accumulate the per-table planes in the OUTPUT dtype: the epilogue
    # `(bias * scale).astype(dtype)` was a full [H,B,T,S] f32 multiply+cast
    # pass (~3.4 ms/step at the FUNSD shape) and f32 plane adds another
    # ~2 ms — both invisible below the bf16 the bias ships at anyway.
    acc_t = jnp.float32 if dtype == jnp.float32 else dtype
    bias = None
    for t, table in enumerate(bb.tables):
        f = unpack_field(bb.packed, t)  # [B, T, S] — KEEP 3D: the 4D
        # dot_general below lowers to a fused one-hot multiply-reduce with
        # NO flatten retile; the flat [H, BTS] form forced two while-loop
        # retiles worth ~17 ms/step at the FUNSD shape (16x measured).
        nb, H = table.shape
        oh = jax.nn.one_hot(f, nb, dtype=dtype)  # [B, T, S, nb] (fused)
        g = jax.lax.dot_general(
            (table.T * bb.scale).astype(dtype), oh, (((1,), (3,)), ((), ())),
            preferred_element_type=acc_t,
        )  # [H, B, T, S]
        bias = g if bias is None else bias + g
    if layout == "bhts":
        bias = jnp.moveaxis(bias, 0, 1)
    return bias.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def bias_grad_collector(tables, packed, shape, dtype, scale,
                        layout="bhts"):
    """Zero [B, H, T, S] tensor whose COTANGENT is the summed logit grad.

    Forward is a lazy zeros (never an operand of any kernel, so XLA keeps
    it a broadcast constant). Backward receives g = sum over layers of the
    bf16 `ds` each fused attention layer emitted, and produces the table
    gradients with a single one-hot MXU contraction per table — the exact
    transpose of the forward lookup, amortized over every layer that
    shares the tables (all of them: modeling_layoutlmv3.py:318 computes
    the bias once and adds it in every layer)."""
    del tables, packed, scale, layout
    return jnp.zeros(shape, dtype)


def _collector_fwd(tables, packed, shape, dtype, scale, layout="bhts"):
    return jnp.zeros(shape, dtype), (tuple(tables), packed)


def _collector_bwd(shape, dtype, scale, layout, res, g):
    tables, packed = res
    # Multi-dim dot_generals against the 3D bucket plane: XLA lowers them
    # to fused one-hot multiply-reduces with NO flatten retile (the flat
    # [H, N] x [N, nb] form cost two ~20 ms while-loop retiles per step at
    # the FUNSD shape — 41x measured).
    if layout == "hbts":  # [H, B, T, S]: the doc-kernel streaming layout
        H, B, T, S = shape
        gf = g
        if packed.shape[0] == 1 and B > 1:
            gf = jnp.sum(gf.astype(jnp.float32), axis=1, keepdims=True)
        contract = (((1, 2, 3), (0, 1, 2)), ((), ()))  # over (B, T, S)
    else:
        B, H, T, S = shape
        gf = g
        if packed.shape[0] == 1 and B > 1:
            gf = jnp.sum(gf.astype(jnp.float32), axis=0, keepdims=True)
        gf = jnp.moveaxis(gf, 1, 0)  # [H, B, T, S] (small B*H loop, rare path)
        contract = (((1, 2, 3), (0, 1, 2)), ((), ()))
    dtables = []
    for t, table in enumerate(tables):
        nb = table.shape[0]
        f = (packed >> (FIELD_BITS * t)) & FIELD_MASK  # [B, T, S]
        oh = jax.nn.one_hot(f, nb, dtype=gf.dtype)  # [B, T, S, nb] (fused)
        dtab = jax.lax.dot_general(
            gf, oh, contract, preferred_element_type=jnp.float32,
        )  # [H, nb]
        dtables.append((dtab.T * scale).astype(table.dtype))
    f0 = np.zeros(packed.shape, jax.dtypes.float0)
    return tuple(dtables), f0


bias_grad_collector.defvjp(_collector_fwd, _collector_bwd)


def _pack_tables(tables: Sequence[jax.Array], scale: float) -> jax.Array:
    """[ntab, H, 128] f32: transposed, bias-scale folded in, lane-padded."""
    rows = []
    for tab in tables:
        t = (tab.astype(jnp.float32) * scale).T  # [H, nb]
        rows.append(jnp.pad(t, ((0, 0), (0, 128 - t.shape[1]))))
    return jnp.stack(rows, axis=0)


def _gather_bias_chunk(tt_ref, idx, h, ntab: int):
    """Rebuild one [bq, 128] f32 bias chunk from packed indices `idx`."""
    bq = idx.shape[0]
    acc = None
    for t in range(ntab):
        f = (idx >> (FIELD_BITS * t)) & FIELD_MASK
        row = tt_ref[t, pl.ds(h, 1), :]  # [1, 128]
        g = jnp.take_along_axis(jnp.broadcast_to(row, (bq, 128)), f, axis=1)
        acc = g if acc is None else acc + g
    return acc


def _build_bias(bias_ref, p_ref, kpm_ref, tt_ref, h, *, ntab: int, sp: int):
    """Fill the [bq, Sp] f32 bias scratch (padded/masked cols -> NEG_INF)."""
    for c in range(sp // 128):
        sl = slice(c * 128, (c + 1) * 128)
        acc = _gather_bias_chunk(tt_ref, p_ref[0, :, sl], h, ntab)
        bias_ref[:, sl] = jnp.where(kpm_ref[0, :, sl] != 0, acc, NEG_INF)


def _bb_fwd_kernel(
    q_ref,    # [1, 1, bq, D] (pre-scaled)
    k_ref,    # [1, 1, Sp, D]
    v_ref,
    p_ref,    # [1, bq, Sp] i32 packed buckets (constant over h steps)
    kpm_ref,  # [1, 1, Sp] i32 (1 = valid)
    tt_ref,   # [ntab, H, 128] f32 tables (resident)
    o_ref,    # [1, 1, bq, D]
    lse_ref,  # [1, 1, 1, bq]
    bias_ref,  # scratch [bq, Sp] f32
    *, ntab: int, sp: int,
):
    h = pl.program_id(2)
    _build_bias(bias_ref, p_ref, kpm_ref, tt_ref, h, ntab=ntab, sp=sp)
    s = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
    ) + bias_ref[:]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
    )
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)
    lse_ref[0, 0] = jnp.transpose(m + jnp.log(l))


def _bb_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref,
    lse_ref,    # [1, 1, 1, bq]
    delta_ref,  # [1, 1, 1, bq]
    p_ref, kpm_ref, tt_ref,
    dq_ref,   # [1, 1, bq, D]
    dkp_ref,  # [1, 1, Sp, D] f32 partial (per q-block)
    dvp_ref,
    ds_ref,   # [1, 1, bq, Sp] bf16 logit grads (feeds the table contraction)
    bias_ref,
    *, ntab: int, sp: int,
):
    h = pl.program_id(2)
    _build_bias(bias_ref, p_ref, kpm_ref, tt_ref, h, ntab=ntab, sp=sp)
    s = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
    ) + bias_ref[:]
    lse_col = jnp.transpose(lse_ref[0, 0])  # [bq, 1]
    # masked/padded columns carry bias = NEG_INF -> p underflows to exactly 0
    prob = jnp.exp(s - lse_col)
    do = do_ref[0, 0].astype(jnp.float32)
    dvp_ref[0, 0] = jax.lax.dot_general(
        prob, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
    )
    dp = jax.lax.dot_general(
        do, v_ref[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
    )
    ds = prob * (dp - jnp.transpose(delta_ref[0, 0]))
    ds_ref[0, 0] = ds.astype(ds_ref.dtype)
    dsc = ds.astype(k_ref.dtype)
    dq_ref[0, 0] = jax.lax.dot_general(
        dsc, k_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
    ).astype(dq_ref.dtype)
    dkp_ref[0, 0] = jax.lax.dot_general(
        dsc, q_ref[0, 0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, **_dot_kwargs(q_ref.dtype),
    )


def _pad_to(x, axis, size):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _bb_impl(qs, k, v, packed, kpm, tt, cfg, interpret):
    """qs: [B, H, Tp, D] pre-scaled; k/v: [B, H, Sp, D]; packed [Bp, Tp, Sp];
    kpm [B, 1, Sp] i32; tt [ntab, H, 128]. Returns (out, lse[B, H, nq, bq])."""
    ntab, bq, bcast_p = cfg[:3]
    B, H, Tp, D = qs.shape
    Sp = k.shape[2]
    nq = Tp // bq

    qi = lambda b, i, h: (b, h, i, 0)
    kv = lambda b, i, h: (b, h, 0, 0)
    pi = lambda b, i, h: (0 if bcast_p else b, i, 0)
    in_specs = [
        pl.BlockSpec((1, 1, bq, D), qi),
        pl.BlockSpec((1, 1, Sp, D), kv),
        pl.BlockSpec((1, 1, Sp, D), kv),
        pl.BlockSpec((1, bq, Sp), pi),
        pl.BlockSpec((1, 1, Sp), lambda b, i, h: (b, 0, 0)),
        pl.BlockSpec((ntab, H, 128), lambda b, i, h: (0, 0, 0)),
    ]
    out, lse = pl.pallas_call(
        functools.partial(_bb_fwd_kernel, ntab=ntab, sp=Sp),
        grid=(B, nq, H),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, bq, D), qi),
            # [B, H*nq, 1, bq]: sublane dim 1 == array dim (Mosaic tiling
            # rule), lane-major rows — same layout as _flash_forward's lse
            pl.BlockSpec((1, 1, 1, bq), lambda b, i, h, nq=nq: (b, h * nq + i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, D), qs.dtype),
            jax.ShapeDtypeStruct((B, H * nq, 1, bq), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((bq, Sp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tp * Sp * D,
            bytes_accessed=(qs.size + 2 * k.size) * qs.dtype.itemsize
            + B * Tp * Sp * 4,
            transcendentals=B * H * Tp * Sp,
        ),
        interpret=interpret,
    )(qs, k, v, packed, kpm, tt)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _bb_attn(qs, k, v, packed, kpm, tt, vbias, cfg, interpret):
    # vbias (a zeros from bias_grad_collector, or None) is never read: it
    # exists so the backward can hand the logit gradient `ds` to the
    # model-level collector instead of contracting tables per layer.
    return _bb_impl(qs, k, v, packed, kpm, tt, cfg, interpret)[0]


def _bb_attn_fwd(qs, k, v, packed, kpm, tt, vbias, cfg, interpret):
    out, lse = _bb_impl(qs, k, v, packed, kpm, tt, cfg, interpret)
    return out, (qs, k, v, packed, kpm, tt, out, lse)


def _bb_attn_bwd(cfg, interpret, res, g):
    ntab, bq, bcast_p, T, S, vdtype = cfg
    has_vbias = vdtype is not None
    qs, k, v, packed, kpm, tt, out, lse = res
    B, H, Tp, D = qs.shape
    Sp = k.shape[2]
    nq = Tp // bq
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(B, H * nq, 1, bq)

    qi = lambda b, i, h: (b, h, i, 0)
    kv = lambda b, i, h: (b, h, 0, 0)
    pi = lambda b, i, h: (0 if bcast_p else b, i, 0)
    ri = lambda b, i, h, nq=nq: (b, h * nq + i, 0, 0)
    in_specs = [
        pl.BlockSpec((1, 1, bq, D), qi),
        pl.BlockSpec((1, 1, Sp, D), kv),
        pl.BlockSpec((1, 1, Sp, D), kv),
        pl.BlockSpec((1, 1, bq, D), qi),       # dO
        pl.BlockSpec((1, 1, 1, bq), ri),       # lse
        pl.BlockSpec((1, 1, 1, bq), ri),       # delta
        pl.BlockSpec((1, bq, Sp), pi),
        pl.BlockSpec((1, 1, Sp), lambda b, i, h: (b, 0, 0)),
        pl.BlockSpec((ntab, H, 128), lambda b, i, h: (0, 0, 0)),
    ]
    dq, dkp, dvp, ds = pl.pallas_call(
        functools.partial(_bb_bwd_kernel, ntab=ntab, sp=Sp),
        grid=(B, nq, H),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, bq, D), qi),
            # per-q-block dk/dv partials, summed over nq outside
            pl.BlockSpec((1, 1, Sp, D), lambda b, i, h: (b, i * H + h, 0, 0)),
            pl.BlockSpec((1, 1, Sp, D), lambda b, i, h: (b, i * H + h, 0, 0)),
            pl.BlockSpec((1, 1, bq, Sp), qi),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Tp, D), qs.dtype),
            jax.ShapeDtypeStruct((B, nq * H, Sp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, nq * H, Sp, D), jnp.float32),
            # ds feeds only the [nb, H] table contraction; bf16 noise there
            # is below the bf16 matmul floor, and halving the write matters
            # (it is the largest backward HBM term). f32 inputs keep f32 ds
            # for exact-parity runs.
            jax.ShapeDtypeStruct(
                (B, H, Tp, Sp),
                jnp.float32 if qs.dtype == jnp.float32 else jnp.bfloat16,
            ),
        ),
        scratch_shapes=[pltpu.VMEM((bq, Sp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=11 * B * H * Tp * Sp * D,
            bytes_accessed=(qs.size * 2 + 2 * k.size) * qs.dtype.itemsize
            + B * Tp * Sp * (4 + 2 * H),
            transcendentals=B * H * Tp * Sp,
        ),
        interpret=interpret,
    )(qs, k, v, g, lse, delta, packed, kpm, tt)

    dk = dkp.reshape(B, nq, H, Sp, D).sum(axis=1).astype(k.dtype)
    dv = dvp.reshape(B, nq, H, Sp, D).sum(axis=1).astype(v.dtype)

    f0 = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    if has_vbias:
        # Route ds to the shared bias_grad_collector: one contraction per
        # STEP instead of per layer. ds carries zeros at padded/masked
        # positions (bias = NEG_INF there), so the slice loses nothing.
        dvbias = ds[:, :, :T, :S].astype(vdtype)
        return dq, dk, dv, f0(packed), f0(kpm), jnp.zeros_like(tt), dvbias

    # --- standalone path (no collector): table gradients via one one-hot
    # MXU contraction of ds against the packed plane per table (the
    # transpose of the forward lookup; cf. the 29x gather-vs-matmul finding
    # in models/layoutlmv3._bucket_take). ds already carries zeros at
    # masked/padded positions, so no re-masking is needed.
    if bcast_p:
        dsf = jnp.sum(ds.astype(jnp.float32), axis=0)  # [H, Tp, Sp]
        flat = dsf.reshape(H, -1)
        pk = packed[0].reshape(-1)
    else:
        flat = jnp.moveaxis(ds, 1, 0).reshape(H, -1)  # [H, B*Tp*Sp]
        pk = packed.reshape(-1)
    dtt = []
    for t in range(ntab):
        f = (pk >> (FIELD_BITS * t)) & FIELD_MASK
        oh = jax.nn.one_hot(f, 128, dtype=flat.dtype)  # [N, 128]
        dtab = jax.lax.dot_general(
            flat, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, 128]
        dtt.append(dtab)
    dtt = jnp.stack(dtt, axis=0).astype(tt.dtype)  # [ntab, H, 128]

    return dq, dk, dv, f0(packed), f0(kpm), dtt, None


_bb_attn.defvjp(_bb_attn_fwd, _bb_attn_bwd)


def supports(q, k, bb: BucketBias, *, causal, window, kv_len, q_offset) -> bool:
    B, T, H, D = q.shape
    S = k.shape[1]
    if causal or window or kv_len is not None or q_offset is not None:
        return False
    if T <= 8 or S > 2048 or D > 256:
        return False
    if not (1 <= len(bb.tables) <= MAX_TABLES):
        return False
    if any(t.shape[0] > (1 << FIELD_BITS) or t.shape[1] != H for t in bb.tables):
        return False
    if bb.packed.shape[0] not in (1, B):
        return False
    if bb.vbias is not None and bb.vbias.shape != (B, H, T, S):
        return False
    return bb.packed.shape[1] == T and bb.packed.shape[2] == S


def bucket_bias_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, S, H, D]
    v: jax.Array,
    bb: BucketBias,
    key_padding_mask: Optional[jax.Array] = None,  # bool [B, S]
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    block_q: Optional[int] = None,
) -> jax.Array:
    """Entry point; layout matches ops.attention.attention."""
    B, T, H, D = q.shape
    S = k.shape[1]
    if scale is None:
        scale = D**-0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    Sp = _cdiv(S, 128) * 128
    # Whole-T q-block when it fits VMEM (<= 1024 rows: bias scratch + s
    # stay under ~12 MB): nq == 1 means the backward's per-q-block dk/dv
    # partials degenerate to a single [B, H, Sp, D] write — no [B, nq*H,
    # Sp, D] f32 partial tensors, the round-4 bwd OOM term.
    Tp8 = _cdiv(T, 8) * 8
    if block_q is None:  # auto: whole-T q-block when it fits VMEM
        block_q = 1024
    bq = Tp8 if Tp8 <= block_q else min(block_q, Tp8)
    Tp = _cdiv(T, bq) * bq

    qs = _pad_to((q * scale).swapaxes(1, 2), 2, Tp)
    kt = _pad_to(k.swapaxes(1, 2), 2, Sp)
    vt = _pad_to(v.swapaxes(1, 2), 2, Sp)
    packed = _pad_to(_pad_to(bb.packed, 1, Tp), 2, Sp)
    if key_padding_mask is None:
        kpm = jnp.ones((B, S), jnp.int32)
    else:
        kpm = key_padding_mask.astype(jnp.int32)
    kpm = _pad_to(kpm, 1, Sp)[:, None, :]
    tt = _pack_tables(bb.tables, bb.scale)

    vbias = bb.vbias
    if vbias is not None:
        # Table grads flow ONLY through the collector; cut the tt path so
        # they are not double-counted.
        tt = jax.lax.stop_gradient(tt)
    vdtype = None if vbias is None else jnp.dtype(vbias.dtype).name
    cfg = (len(bb.tables), bq, packed.shape[0] == 1 and B > 1, T, S, vdtype)
    out = _bb_attn(qs, kt, vt, packed, kpm, tt, vbias, cfg, interpret)
    return out[:, :, :T, :].swapaxes(1, 2)
