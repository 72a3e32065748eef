"""Symbolic bucketed attention bias: packed planes, one-hot MXU lookup,
shared-table gradient collector.

LayoutLMv3's 1D+2D bucketed relative attention bias
(layoutlmv3/layoutlmft/models/layoutlmv3/modeling_layoutlmv3.py:507-577,
added to logits as (rel_pos + rel_2d_pos)/sqrt(d) at :318-321) is a
rank-deficient function of tiny inputs: per-example [B, T] positions / bbox
centers bucketed into <=64 bins per table, then looked up in learned
[nb, H] tables. This module carries the machinery the production fused
path (models/layoutlmv3.py fused_bias) is built on:

- `pack_bucket_planes`: up to three <64-bucket planes packed into one
  [B, T, S] int32 (6 bits per field).
- `materialize_bias`: the planes -> dense bias via a multi-dim one-hot
  dot_general (an MXU contraction — the naive `table[f]` gather
  serializes on the TPU scalar path, 29x slower measured), emitted
  head-major so no 386 MB transpose ever runs.
- `bias_grad_collector`: tables are shared by every layer, so the true
  table gradient is ONE one-hot contraction of the layer-SUMMED logit
  grads; the collector's zero tensor rides the bias and receives that
  sum as its cotangent.

HISTORY (prove-or-prune, round 5): this module used to also carry an
in-kernel Pallas attention (`bucket_bias_attention`) that rebuilt bias
tiles in-VMEM from the packed plane instead of streaming a materialized
bias. It was measured SLOWER than materialize+stream at every supported
shape (the VPU lane-gather costs ~2.5 ms/layer-pass vs ~0.5 ms of HBM
stream at FUNSD S=709, same ratio at S=2048 since both scale with T*S),
and its claimed S>2048 memory-pressure niche was outside its own support
envelope (whole-S-in-VMEM design caps at S<=2048). No workload ever
dispatched to it, so it was deleted; see PERFORMANCE.md for the ablation
row. The streaming path (materialize head-major + ops/doc_attention)
is the production LayoutLMv3 bias path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

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
