"""Int8 weight-only quantization for bandwidth-bound decode.

The reference serves its flagship models in fp16 (`kosmos-2.5/inference.py:132`
`model.half().cuda()`); it has no weight quantization anywhere. On TPU the
autoregressive decode step is HBM-bandwidth-bound: every decoder weight is
streamed from HBM once per token, so at bs<=8 the step time is ~= bytes(W)/BW.
Storing the decoder matmul weights as int8 with per-output-channel symmetric
scales halves that stream (the MXU math stays bf16: each weight block is
dequantized in VMEM right before its dot, so no dequantized copy ever exists
in HBM).

Design notes (TPU/Mosaic):
- `int8_matmul` is a Pallas kernel over a (n_blocks, k_blocks) grid with an
  f32 VMEM accumulator; k is the minor (fastest) grid axis so the output
  block stays resident across the contraction. The weight block is loaded as
  int8 (the HBM win), converted to the activation dtype in VMEM, and fed to
  the MXU with fp32 accumulation. Per-channel scales are applied once at the
  final k step, in f32, before the cast to the activation dtype.
- Quantization error: symmetric per-column int8 on xavier-initialized
  transformer weights gives ~3e-3 relative matmul error — below bf16 decode
  noise; logit parity is asserted in tests/test_quant.py.
- The dot precision kwarg follows ops/flash_attention._dot_kwargs (Mosaic
  rejects fp32-precision bf16 matmuls and slows down on explicit kwargs).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unilm_tpu.ops.flash_attention import _dot_kwargs

# VMEM-friendly default blocking: a [2048, 512] int8 weight block is 1 MB
# (2 MB with the dequantized bf16 copy), leaving room for double-buffering.
_BLOCK_K = 2048
_BLOCK_N = 512


def quantize_int8(w: jax.Array, axis: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-channel int8 quantization.

    `axis` is the CONTRACTION axis (reduced by the matmul); scales are kept
    per output channel so they can be applied to the f32 accumulator after
    the dot. Returns (w_i8 same shape, scale [out_channels] f32).
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wi = jnp.round(w.astype(jnp.float32) / jnp.expand_dims(scale, axis))
    wi = jnp.clip(wi, -127, 127).astype(jnp.int8)
    return wi, scale.astype(jnp.float32)


def _int8_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_kb: int,
                        matvec: bool = False):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w = w_ref[...].astype(x.dtype)  # int8 -> compute dtype, in VMEM
    if matvec:
        # M == 1 (bs=1 decode): a [1, K] x [K, N] matvec leaves the MXU's
        # systolic rows idle (measured 14.9 ms/token vs the 1.6 ms int8
        # weight-stream floor). Elementwise multiply + sublane-reduce runs
        # the same FMAs on the VPU at full lane width.
        prod = w.astype(jnp.float32) * x.reshape(-1, 1).astype(jnp.float32)
        acc_ref[...] += jnp.sum(prod, axis=0, keepdims=True)
    else:
        acc_ref[...] += jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, **_dot_kwargs(x.dtype)
        )

    @pl.when(kb == n_kb - 1)
    def _emit():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _pick_block(dim: int, cap: int) -> Optional[int]:
    """Largest divisor of `dim` that is <= cap and a multiple of 128 (lane
    width), or `dim` itself when it already fits. None if no clean split."""
    if dim <= cap:
        return dim
    for blk in range(cap, 127, -128):
        if dim % blk == 0:
            return blk
    return None


@functools.partial(
    jax.jit, static_argnames=("interpret", "out_dtype", "bk", "bn")
)
def _int8_matmul_2d(x, w_i8, scale, interpret=False, out_dtype=None,
                    bk=None, bn=None):
    M, K = x.shape
    N = w_i8.shape[1]
    out_dtype = out_dtype or x.dtype
    bk = bk or _pick_block(K, 4096 if K <= 4096 else _BLOCK_K)
    bn = bn or _pick_block(N, _BLOCK_N)
    # block M too: prefill pushes [T~2k, K] activations through the same
    # projections — an unblocked (M, bk) x block + f32 accumulator blows
    # scoped VMEM right at the 2053-token kosmos-2.5 prompt
    bm = M if M <= 512 else 512
    Mp = -(-M // bm) * bm
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    n_kb = K // bk
    kernel = functools.partial(_int8_matmul_kernel, n_kb=n_kb,
                               matvec=Mp == 1)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm, N // bn, n_kb),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mb, nb, kb: (mb, kb)),
            pl.BlockSpec((bk, bn), lambda mb, nb, kb: (kb, nb)),
            pl.BlockSpec((1, bn), lambda mb, nb, kb: (0, nb)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mb, nb, kb: (mb, nb)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w_i8, scale.reshape(1, N))
    return out[:M]


def _xla_int8_matmul(x, w_i8, scale):
    """Fallback (CPU, or shapes the kernel blocking can't split): dequantize
    via the f32 accumulator — numerically identical to the kernel."""
    acc = jax.lax.dot_general(
        x, w_i8.astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * scale.astype(jnp.float32)).astype(x.dtype)


def int8_matmul(
    x: jax.Array,  # [..., K] activation (bf16/f32)
    w_i8: jax.Array,  # [K, N] int8
    scale: jax.Array,  # [N] f32 per-output-channel
    interpret: Optional[bool] = None,
) -> jax.Array:
    """x @ dequant(w_i8, scale) without materializing the dequantized weight.

    f32 accumulation, per-column scale applied once, result in x.dtype.
    """
    K, N = w_i8.shape
    assert x.shape[-1] == K, (x.shape, w_i8.shape)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    x2 = x.reshape(M, K)
    if (
        _pick_block(N, _BLOCK_N) is None
        or _pick_block(K, 4096 if K <= 4096 else _BLOCK_K) is None
        or K % 128
        or N % 128
    ):
        return _xla_int8_matmul(x, w_i8, scale)
    # pad rows to the sublane width so tiny decode batches stay legal tiles
    Mp = max(8, -(-M // 8) * 8)
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    out = _int8_matmul_2d(x2, w_i8, scale, interpret=interpret,
                          out_dtype=x.dtype)
    return out[:M].reshape(*lead, N)


class QuantDense(nn.Module):
    """Drop-in Dense twin whose kernel lives in HBM as int8 + f32 scales.

    Parameters are CONVERSION-ONLY: `init` produces zero weights / unit
    scales; real values come from `quantize_dense_tree` applied to a trained
    fp/bf16 param tree. Param names (`kernel_i8`, `scale`, `bias`) mirror
    Dense so the converted tree drops into the same module path.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    use_kernel: bool = True  # False: XLA dequant-dot (fuses a scanned
    # stack's per-layer dynamic-slice into the dot; the Pallas custom call
    # forces the slice to materialize — the int8 stream paid twice)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        K = x.shape[-1]
        wi = self.param(
            "kernel_i8", nn.initializers.zeros, (K, self.features), jnp.int8
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        x = x.astype(self.dtype)
        if self.use_kernel:
            y = int8_matmul(x, wi, scale)
        else:
            y = _xla_int8_matmul(x, wi, scale)
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(y.dtype)
        return y


def quantize_dense_tree(params, predicate=None):
    """Replace every 2D `kernel` leaf with `kernel_i8` + `scale` (per-output-
    channel), leaving biases and everything else untouched. 3D kernels
    [L, K, N] (scan_layers stacked trees) quantize per layer per output
    channel — scale [L, N] — so nn.scan's axis-0 slice hands QuantDense its
    expected ([K, N] int8, [N] f32) pair.

    `predicate(path_tuple)` can restrict which modules are quantized (e.g.
    only the decoder layers, keeping embeddings full-precision).
    """

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            p = path + (k,)
            if (
                k == "kernel"
                and hasattr(v, "ndim")
                and v.ndim in (2, 3)
                and (predicate is None or predicate(p))
            ):
                wi, scale = quantize_int8(v, axis=v.ndim - 2)
                out["kernel_i8"] = wi
                out["scale"] = scale
            else:
                out[k] = walk(v, p)
        return out

    return walk(params, ())
