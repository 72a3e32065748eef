"""Attention ops: XLA reference implementation + dispatch to Pallas flash.

Reference semantics: torchscale MultiheadAttention
(kosmos-2/torchscale/torchscale/component/multihead_attention.py:148-176):
scaled QK^T, additive attn_mask/bias, key-padding mask to -inf, fp32 softmax,
then PV. Batch-major [B, T, H, D] throughout (vs the reference's [T, B*H, D]).

The dispatcher keeps mask structure symbolic (causal flag, window, kv_len,
key-padding) so the Pallas kernel can apply it block-wise without ever
materializing an [T, S] mask in HBM; only the XLA fallback materializes it.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large-negative instead of -inf: keeps softmax NaN-free


def fa_on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def make_causal_mask(q_positions: jax.Array, k_positions: jax.Array) -> jax.Array:
    """Bool [T, S]; True = may attend (k_pos <= q_pos)."""
    return k_positions[None, :] <= q_positions[:, None]


def make_window_mask(q_positions: jax.Array, k_positions: jax.Array, window: int) -> jax.Array:
    """Sliding-window band (cf. YOCO sliding_window_attention.py): 0 <= q-k < window."""
    diff = q_positions[:, None] - k_positions[None, :]
    return (diff < window) & (diff >= 0)


def dot_product_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, S, H, D]
    v: jax.Array,  # [B, S, H, D]
    *,
    bias: Optional[jax.Array] = None,  # additive [B|1, H|1, T, S]
    mask: Optional[jax.Array] = None,  # bool, broadcastable to [B, H, T, S]
    scale: Optional[float] = None,  # default D**-0.5
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """XLA reference attention with fp32 softmax. Returns [B, T, H, D]."""
    out_dtype = q.dtype
    depth = q.shape[-1]
    if scale is None:
        scale = depth**-0.5
    # bf16 inputs: keep logits/bias in bf16 (the reference's fp16-autocast
    # behavior — bmm emits fp16, softmax upcasts) to halve HBM traffic on the
    # [B, H, T, S] tensor; fp32 inputs keep full-precision logits.
    acc_dtype = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k, preferred_element_type=acc_dtype)
    if bias is not None:
        logits = logits + bias.astype(acc_dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.asarray(NEG_INF, acc_dtype))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(out_dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32).astype(
        out_dtype
    )


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,  # additive [B|1, H|1, T, S]
    key_padding_mask: Optional[jax.Array] = None,  # bool [B, S], True = valid
    scale: Optional[float] = None,
    causal: bool = False,
    q_offset: Optional[jax.Array] = None,  # scalar position of q[0]
    kv_len: Optional[jax.Array] = None,  # valid prefix length of k/v (decode)
    window: int = 0,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    use_flash: bool = True,
    flash_block_q: int = 512,
    flash_block_k: int = 1024,
) -> jax.Array:
    """Dispatching attention front-end. Returns [B, T, H, D]."""
    B, T, H, D = q.shape
    S = k.shape[1]

    # Symbolic bucketed bias (LayoutLMv3 1D+2D tables, ops/bucket_bias.py):
    # materialize via the one-hot MXU lookup and fall through to the
    # ordinary dispatch below (the streaming doc kernel takes it from
    # there). The in-kernel VPU-gather rebuild was pruned in round 5 —
    # measured slower than materialize+stream at every supported shape
    # (ops/bucket_bias.py module docstring, PERFORMANCE.md).
    from unilm_tpu.ops.bucket_bias import BucketBias

    if isinstance(bias, BucketBias):
        from unilm_tpu.ops import bucket_bias as bb

        bias = bb.materialize_bias(bias, q.dtype)

    # Head-major [H, B, T, S] bias (doc_attention.HeadMajorBias — the
    # one-hot bias lookup's natural output order; LayoutLMv3's fused-bias
    # path): stream it directly through the doc kernel. Anywhere the
    # kernel doesn't apply, transpose to the public [B, H, T, S] order
    # and fall through.
    from unilm_tpu.ops import doc_attention as da

    if isinstance(bias, da.HeadMajorBias):
        from unilm_tpu.ops import flash_attention as fa

        if (
            use_flash
            and dropout_rate == 0.0
            and T > 8
            and fa.is_available()
            and da.supports(q, k, bias, causal=causal, window=window,
                            kv_len=kv_len, q_offset=q_offset)
        ):
            return da.doc_attention(
                q, k, v, bias, key_padding_mask,
                scale if scale is not None else D**-0.5,
                interpret=not fa_on_tpu(),
            )
        bias = jnp.moveaxis(bias.hbts, 0, 1)

    # Measured crossover on v5e (PERFORMANCE.md): the blocked flash grid wins
    # at long S and always for sliding windows (avoids O(T*S) HBM traffic);
    # below ~1K keys the one-pass fused kernel (whole-S-in-VMEM, grid over
    # batch) beats the XLA path, which is HBM-bound on materialized logits.
    if use_flash and dropout_rate == 0.0 and T > 8:
        from unilm_tpu.ops import flash_attention as fa

        # Encoder hot path (BEiT/ViT/LayoutLMv3): non-causal, full kv, no
        # key-padding mask, short S -> layout-native fused kernel with no
        # transposes around the pallas call. Its backward is the one-pass
        # Pallas recompute kernel (_vit_bwd_kernel) — the dense XLA
        # fallback's [B,H,T,S] f32 logits were the peak training
        # allocation (1.17 GB/layer at BEiT-B batch 512).
        if (
            not causal
            and not window
            and key_padding_mask is None
            and kv_len is None
            and q_offset is None
            and S < 1024
            and fa.is_available()
            and fa.supports(q, k, bias, window)
            and fa._onepass_profitable(B, H, T, S, D, bias, window, q.dtype.itemsize)
        ):
            return fa.fused_encoder_attention(
                q, k, v, bias,
                scale if scale is not None else D**-0.5,
                not fa_on_tpu(),
            )

        # A full per-example bias ([B,H,T,S], LayoutLMv3's 1D+2D bucket
        # bias) moves the crossover far left: the dense fallback reads the
        # bias AND materializes [B,H,T,S] logits + fp32 probs (3 full-plane
        # round-trips/layer-pass), while the blocked kernel streams the bias
        # once and keeps scores in VMEM. One-pass can't take these shapes
        # (the resident [H,Tp,Sp] bias plane exceeds its VMEM budget), so
        # without this the hot DocAI shape (S=709) ran dense XLA.
        # Blocked one-pass doc kernel (ops/doc_attention.py): every
        # remaining non-causal S <= 2048 encoder case the whole-plane ViT
        # kernel can't take — key-padding masks, full per-example biases
        # (LayoutLMv3/TrOCR/DiT fine-tuning), and the mid-size plain
        # shapes whose one-pass VMEM check fails (TrOCR's 580-token DeiT
        # encoder ran DENSE XLA attention, 70 ms of its 211 ms step).
        # Streams the bias once per pass, accumulates dk/dv in VMEM, and
        # emits a bf16 dbias — replacing the dense-XLA / blocked-flash
        # backwards that ran 4-6x over roofline here.
        from unilm_tpu.ops import doc_attention as da

        if (
            not causal
            and not window
            and fa.is_available()
            and da.supports(q, k, bias, causal=causal, window=window,
                            kv_len=kv_len, q_offset=q_offset)
        ):
            return da.doc_attention(
                q, k, v, bias, key_padding_mask,
                scale if scale is not None else D**-0.5,
                interpret=not fa_on_tpu(),
            )

        # B == 1 per-example biases never reach this crossover: the doc
        # kernel above takes every non-causal biased shape at S <= 1024
        # (incl. batch-1 single-document inference), so this clause only
        # steers the S > 1024 long-bias remainder to the blocked kernel.
        per_example_bias = (
            bias is not None and bias.shape[0] == B > 1 and bias.shape[1] == H
        )
        profitable = (
            S >= 1024 or (window and window > 0)
            or (per_example_bias and S >= 512)
        )

        if profitable and fa.is_available() and fa.supports(q, k, bias, window):
            return fa.flash_attention(
                q,
                k,
                v,
                bias=bias,
                key_padding_mask=key_padding_mask,
                scale=scale,
                causal=causal,
                q_offset=q_offset,
                kv_len=kv_len,
                window=window,
                block_q=flash_block_q,
                block_k=flash_block_k,
            )

    # ---- XLA fallback: materialize the combined mask -----------------------
    q_pos = jnp.arange(T) + (q_offset if q_offset is not None else 0)
    k_pos = jnp.arange(S)
    mask = None

    def _and(a, b):
        return b if a is None else a & b

    if key_padding_mask is not None:
        mask = _and(mask, key_padding_mask[:, None, None, :])
    if causal:
        mask = _and(mask, make_causal_mask(q_pos, k_pos)[None, None])
    if window and window > 0:
        mask = _and(mask, make_window_mask(q_pos, k_pos, window)[None, None])
    if kv_len is not None:
        mask = _and(mask, (k_pos < kv_len)[None, None, None, :])

    return dot_product_attention(
        q,
        k,
        v,
        bias=bias,
        mask=mask,
        scale=scale,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
    )
