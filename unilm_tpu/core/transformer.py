"""Encoder/Decoder stacks — the Magneto core.

Capability-equivalent of torchscale architecture/{encoder,decoder}.py:
pre/post-LN, DeepNorm residual alpha, sub-LN, DropPath, per-layer MoE every
`moe_freq`, T5 relative bias, xPos rotary, encoder-decoder cross attention,
incremental decoding. Batch-major, static shapes, jit/pjit-friendly.

Models (L4) compose these stacks with their own embedding front-ends and
attention-bias providers (BEiT 2D table, LayoutLMv3 1D+2D buckets).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.core.attention import MultiheadAttention
from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.layers import (DropPath, FeedForward, LayerScale,
                                   make_norm, scaled_init)
from unilm_tpu.core import positional
from unilm_tpu.core.positional import RelativePositionBias
from unilm_tpu.ops.attention import attention, fa_on_tpu


def _remat_policy(cfg: TransformerConfig):
    """Map cfg.remat_policy to a jax.checkpoint policy. 'dots' keeps every
    matmul output (MXU work is never redone in backward — only elementwise
    ops recompute), trading ~2x activation memory for the ~4/3 FLOP overhead
    of full remat. None = save nothing (fairseq --checkpoint-activations)."""
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if cfg.remat_policy == "full":
        return None
    raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")


def _ln(cfg: TransformerConfig, name: str):
    return make_norm(cfg, name)


def _ffn_init_scale(cfg: TransformerConfig) -> float:
    return (1.0 / cfg.deepnorm_init_div) * cfg.subln_init_mul


def _build_ffn(cfg: TransformerConfig, layer_idx: int, name: str = "ffn"):
    """Dense FFN or MoE depending on moe_freq (decoder.py:73-87)."""
    is_moe = cfg.moe_freq > 0 and (layer_idx + 1) % cfg.moe_freq == 0
    if is_moe:
        from unilm_tpu.core.moe import MoELayer

        return MoELayer(cfg, name="moe"), True
    return FeedForward(cfg, init_scale=_ffn_init_scale(cfg), name=name), False


class EncoderLayer(nn.Module):
    """torchscale EncoderLayer (encoder.py:27-153) + BEiT LayerScale option."""

    cfg: TransformerConfig
    layer_idx: int = 0
    drop_path: float = 0.0
    layer_scale_init: float = 0.0  # BEiT gamma (0 = off)
    alpha: float = 1.0  # deepnorm residual scale

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        key_padding_mask: Optional[jax.Array] = None,
        attn_bias: Optional[jax.Array] = None,
        split_mask: Optional[jax.Array] = None,  # multiway modality mask
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        dp = DropPath(self.drop_path, name="drop_path") if self.drop_path > 0 else None
        ls = (
            (lambda n: LayerScale(cfg.embed_dim, self.layer_scale_init, name=n))
            if self.layer_scale_init > 0
            else None
        )
        if cfg.multiway:
            from unilm_tpu.core.multiway import MultiwayNorm

            norm = lambda name: (
                lambda y: MultiwayNorm(
                    epsilon=cfg.layernorm_eps, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, rms=cfg.norm_type == "rmsnorm",
                    name=name,
                )(y, split_mask)
            )
        else:
            norm = lambda name: _ln(cfg, name)

        # --- self attention -------------------------------------------------
        residual = x
        if cfg.normalize_before:
            x = norm("self_attn_layer_norm")(x)
        x = MultiheadAttention(cfg, self_attention=True, name="self_attn")(
            x,
            key_padding_mask=key_padding_mask,
            attn_bias=attn_bias,
            split_mask=split_mask,
            deterministic=deterministic,
        )
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        if ls:
            x = ls("gamma_1")(x)
        if dp:
            x = dp(x, deterministic=deterministic)
        x = residual * self.alpha + x
        if not cfg.normalize_before:
            x = norm("self_attn_layer_norm")(x)

        # --- ffn / moe --------------------------------------------------------
        residual = x
        if cfg.normalize_before:
            x = norm("final_layer_norm")(x)
        if cfg.multiway and not (cfg.moe_freq > 0 and (self.layer_idx + 1) % cfg.moe_freq == 0):
            # whole-FFN duplication (torchscale MultiwayWrapper(ffn))
            a = FeedForward(cfg, init_scale=_ffn_init_scale(cfg), name="ffn_A")(
                x, deterministic=deterministic
            )
            ffn_b = FeedForward(cfg, init_scale=_ffn_init_scale(cfg), name="ffn_B")
            if split_mask is not None:
                b = ffn_b(x, deterministic=deterministic)
                m = split_mask[None, :, None] if split_mask.ndim == 1 else split_mask[..., None]
                x = jnp.where(m, b, a)
            else:
                # text-only call: ffn_B params must still exist (checkpoint
                # shape stability) but carry no compute or gradient — create
                # them at init time only, never run the branch in apply.
                if self.is_initializing():
                    ffn_b(x[:1, :1], deterministic=deterministic)
                x = a
        else:
            ffn, is_moe = _build_ffn(cfg, self.layer_idx)
            x = ffn(x, deterministic=deterministic)
        if isinstance(x, tuple):  # MoE returns (out, aux_loss)
            x, aux = x
            self.sow("losses", "moe_aux", aux)
        if ls:
            x = ls("gamma_2")(x)
        if dp:
            x = dp(x, deterministic=deterministic)
        x = residual * self.alpha + x
        if not cfg.normalize_before:
            x = norm("final_layer_norm")(x)
        return x


def _decoder_layer_body(
    mdl: nn.Module,
    cfg: TransformerConfig,
    layer_idx: int,
    drop_path: float,
    has_cross_attention: bool,
    alpha: float,
    x: jax.Array,
    encoder_out: Optional[jax.Array],
    self_key_padding_mask: Optional[jax.Array],
    encoder_padding_mask: Optional[jax.Array],
    self_attn_bias: Optional[jax.Array],
    cross_attn_bias: Optional[jax.Array],
    causal: bool,
    mode: str,
    cache_size: int,
    cache_pos: Optional[jax.Array],
    deterministic: bool,
) -> jax.Array:
    """One decoder layer (torchscale decoder.py:22-208). Shared by the
    looped DecoderLayer and the scanned adapter so both build IDENTICAL
    param subtrees (self_attn / encoder_attn / ffn / *_layer_norm) directly
    under the calling module."""
    dp = DropPath(drop_path, name="drop_path") if drop_path > 0 else None

    def _mln(name):
        # submodules attach to `mdl` (the caller is inside its compact scope)
        return make_norm(cfg, name)

    # --- causal self attention ------------------------------------------
    residual = x
    if cfg.normalize_before:
        x = _mln("self_attn_layer_norm")(x)
    x = MultiheadAttention(
        cfg, self_attention=True, use_xpos=cfg.xpos_rel_pos, name="self_attn"
    )(
        x,
        key_padding_mask=self_key_padding_mask,
        attn_bias=self_attn_bias,
        causal=causal,
        mode=mode,
        cache_size=cache_size,
        cache_pos=cache_pos,
        deterministic=deterministic,
    )
    x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
    if dp:
        x = dp(x, deterministic=deterministic)
    x = residual * alpha + x
    if not cfg.normalize_before:
        x = _mln("self_attn_layer_norm")(x)

    # --- cross attention ---------------------------------------------------
    if has_cross_attention:
        residual = x
        if cfg.normalize_before:
            x = _mln("encoder_attn_layer_norm")(x)
        x = MultiheadAttention(
            cfg, self_attention=False, use_xpos=cfg.xpos_rel_pos, name="encoder_attn"
        )(
            x,
            key=encoder_out,
            key_padding_mask=encoder_padding_mask,
            attn_bias=cross_attn_bias,
            mode=mode,
            deterministic=deterministic,
        )
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        if dp:
            x = dp(x, deterministic=deterministic)
        x = residual * alpha + x
        if not cfg.normalize_before:
            x = _mln("encoder_attn_layer_norm")(x)

    # --- ffn / moe -----------------------------------------------------------
    ffn, is_moe = _build_ffn(cfg, layer_idx)
    residual = x
    if cfg.normalize_before:
        x = _mln("final_layer_norm")(x)
    x = ffn(x, deterministic=deterministic)
    if isinstance(x, tuple):
        x, aux = x
        mdl.sow("losses", "moe_aux", aux)
    if dp:
        x = dp(x, deterministic=deterministic)
    x = residual * alpha + x
    if not cfg.normalize_before:
        x = _mln("final_layer_norm")(x)
    return x


class DecoderLayer(nn.Module):
    """torchscale DecoderLayer (decoder.py:22-208)."""

    cfg: TransformerConfig
    layer_idx: int = 0
    drop_path: float = 0.0
    has_cross_attention: bool = False
    alpha: float = 1.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoder_out: Optional[jax.Array] = None,
        *,
        self_key_padding_mask: Optional[jax.Array] = None,
        encoder_padding_mask: Optional[jax.Array] = None,
        self_attn_bias: Optional[jax.Array] = None,
        cross_attn_bias: Optional[jax.Array] = None,
        causal: bool = True,
        mode: str = "train",
        cache_size: int = 0,
        cache_pos: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        return _decoder_layer_body(
            self, self.cfg, self.layer_idx, self.drop_path,
            self.has_cross_attention, self.alpha,
            x, encoder_out, self_key_padding_mask, encoder_padding_mask,
            self_attn_bias, cross_attn_bias, causal, mode, cache_size,
            cache_pos, deterministic,
        )


class _ScanDecoderLayer(nn.Module):
    """nn.scan body (TRAIN mode): one homogeneous decoder layer, positional
    traced inputs (nn.scan silently DROPS call kwargs), static flags as
    attributes. Builds the same param subtree as DecoderLayer so a looped
    checkpoint stacks straight in (stack_layer_params)."""

    cfg: TransformerConfig
    has_cross_attention: bool = False
    alpha: float = 1.0
    causal: bool = True
    mode: str = "train"
    cache_size: int = 0
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, encoder_out, self_key_padding_mask,
                 encoder_padding_mask, self_attn_bias, cross_attn_bias,
                 cache_pos):
        y = _decoder_layer_body(
            self, self.cfg, 0, 0.0, self.has_cross_attention, self.alpha,
            x, encoder_out, self_key_padding_mask, encoder_padding_mask,
            self_attn_bias, cross_attn_bias, self.causal, self.mode,
            self.cache_size, cache_pos, self.deterministic,
        )
        return y, None


# --------------------------------------------------------------------------- #
# Scanned prefill/decode: carry-threaded KV page pool
# --------------------------------------------------------------------------- #
#
# Why not flax scanned 'cache' variables (variable_axes={"cache": 1}) for
# generation? Lifted-scan variables become scan xs/ys: every decode step
# re-stacks the ENTIRE stacked KV cache through slice/update/stack copies —
# measured 11.7 ms/tok vs 4.0 looped on the kosmos-2.5 bs=1 int8 config
# (the cache-size sweep pinned it: 2.6 ms at cache=256 vs 11.7 at 6052).
# Instead the pool is ONE Decoder-level variable threaded through the scan
# CARRY: per-step writes are in-place row scatters on the loop-carried
# buffer, and the decode read is the kv_len-bounded slab-streaming kernel
# (ops/paged_attention._run_decode_kernel) — so a step reads only
# ceil(len/slab) slabs, not the whole cache_size buffer (the looped XLA
# path reads/masks all of it: ~0.9 GB/step at the kosmos cache=6052).
#
# Pool layout [B, L*PP, page, H*D]: batch-LEADING so generation's beam
# gather (runtime.generate._gather_beams) works unchanged, H*D FLAT so the
# slab tiles are lane-aligned (a [.., H, D] view lane-pads D; see
# run_decode_append_attention). Layer i owns pages [i*PP, (i+1)*PP).


def _scan_pool_geometry(cache_size: int):
    """(page, chunk, pages_per_layer): PP chunk-aligned so every layer run
    is slab-aligned. Long caches use 512-token slabs (64x8); short ones
    (TrOCR's ~34-token beam decode) use 32-token slabs with page=16 — the
    bf16 sublane minimum, so the slab kernel still applies and the decode
    never falls back to the gather path (whose [.., H, D] head-split
    relayout-copies the whole slab)."""
    if cache_size >= 1024:
        page, chunk = 64, 8
    else:
        page, chunk = 16, 2
    pp = -(-cache_size // page)
    pp = -(-pp // chunk) * chunk
    return page, chunk, pp


class _ScanSelfAttention(nn.Module):
    """MultiheadAttention's scanned-generation twin: identical param names
    (q/k/v/out_proj + inner_attn_ln), KV in the carry-threaded page pool.
    The serving engine's PagedSelfAttention proved this param-mirror
    pattern (runtime/serving.py)."""

    cfg: TransformerConfig
    mode: str = "decode"  # prefill | decode
    causal: bool = True
    use_xpos: bool = False
    page: int = 64
    chunk: int = 8
    pages_per_layer: int = 0

    @nn.compact
    def __call__(self, x, k_pool, v_pool, scale_pool, li, start,
                 key_padding_mask, attn_bias):
        cfg = self.cfg
        H, D, E = cfg.num_heads, cfg.head_dim, cfg.embed_dim
        B, T = x.shape[0], x.shape[1]
        PP, page = self.pages_per_layer, self.page
        quantized = scale_pool is not None and jnp.ndim(scale_pool) > 0

        qk_init = scaled_init(nn.initializers.xavier_uniform(), 2**-0.5)
        vo_scale = (1.0 / cfg.deepnorm_init_div) * cfg.subln_init_mul
        v_init = scaled_init(nn.initializers.xavier_uniform(),
                             (2**-0.5) * vo_scale)
        o_init = scaled_init(nn.initializers.xavier_uniform(), vo_scale)
        from unilm_tpu.core.layers import make_dense, make_norm

        def proj(name, init):
            return make_dense(cfg, H * D, kernel_init=init, name=name)

        q = proj("q_proj", qk_init)(x).reshape(B, T, H, D)
        k_new = proj("k_proj", qk_init)(x).reshape(B, T, H, D)
        v_new = proj("v_proj", v_init)(x).reshape(B, T, H, D)

        if self.use_xpos:
            pos = start + jnp.arange(T)
            sin, cos, xsc = positional.xpos_sin_cos_scale(
                pos, jnp.zeros((), jnp.float32), D, cfg.xpos_scale_base)
            q = positional.apply_xpos(
                q.swapaxes(1, 2), sin, cos, xsc).swapaxes(1, 2)
            k_new = positional.apply_xpos(
                k_new.swapaxes(1, 2), sin, cos, 1.0 / xsc).swapaxes(1, 2)
            qscale = positional.length_extrapolation_qscale(
                pos, start + T, cfg.scale_length, jnp.float32)
            q = (q * qscale[None, :, None, None]).astype(q.dtype)

        scale = cfg.attn_scale if cfg.attn_scale is not None else D**-0.5

        if self.mode == "prefill":
            # one-shot prompt: the pool was empty (start == 0), so attention
            # runs over the fresh K/V directly; rows land in the pool after.
            # Decoder-level decode biases (T5 rel-pos) span cache_size keys;
            # slice to the fresh-KV length.
            if attn_bias is not None:
                attn_bias = attn_bias[..., :T]
            out = attention(
                q, k_new, v_new, bias=attn_bias,
                key_padding_mask=key_padding_mask, scale=scale,
                causal=self.causal, use_flash=cfg.use_flash,
                flash_block_q=cfg.flash_block_q,
                flash_block_k=cfg.flash_block_k,
            )
            k_pool, v_pool, scale_pool = self._scatter_rows(
                k_pool, v_pool, scale_pool, k_new, v_new, li, start,
                quantized)
        else:
            from unilm_tpu.ops.paged_attention import (
                kernel_supported, run_decode_append_attention)

            if (T == 1 and attn_bias is None and key_padding_mask is None
                    and fa_on_tpu()
                    and kernel_supported(H, D, page, k_pool.dtype)
                    # int8 sidecar blocks are [1, 8, chunk*page]: the lane
                    # dim must be tile-legal (short-cache geometry is
                    # chunk*page=32 — XLA fallback there)
                    and (not quantized or self.chunk * page >= 128)):
                LPP = k_pool.shape[1]
                kp3 = k_pool.reshape(B * LPP, page, H * D)
                vp3 = v_pool.reshape(B * LPP, page, H * D)
                bases = jnp.arange(B, dtype=jnp.int32) * LPP + li * PP
                lengths = jnp.full((B,), start, jnp.int32)
                if quantized:
                    sp3 = scale_pool.reshape(
                        B * LPP // self.chunk, 8, self.chunk * page)
                    out, kp3, vp3, sp3 = run_decode_append_attention(
                        q, k_new, v_new, kp3, vp3, bases, lengths,
                        max_pages=PP, scale=scale, chunk=self.chunk,
                        scale_pool=sp3)
                    scale_pool = sp3.reshape(scale_pool.shape)
                else:
                    out, kp3, vp3 = run_decode_append_attention(
                        q, k_new, v_new, kp3, vp3, bases, lengths,
                        max_pages=PP, scale=scale, chunk=self.chunk)
                k_pool = kp3.reshape(k_pool.shape)
                v_pool = vp3.reshape(v_pool.shape)
            else:
                # generic path (CPU tests, decode bias, GAD T>1 verify):
                # scatter the rows, gather this layer's slab, masked attention
                k_pool, v_pool, scale_pool = self._scatter_rows(
                    k_pool, v_pool, scale_pool, k_new, v_new, li, start,
                    quantized)
                kk = jax.lax.dynamic_slice_in_dim(
                    k_pool, li * PP, PP, axis=1).reshape(B, PP * page, H, D)
                vv = jax.lax.dynamic_slice_in_dim(
                    v_pool, li * PP, PP, axis=1).reshape(B, PP * page, H, D)
                if quantized:
                    # per-token scales for this layer's slabs: rows 0/1 of
                    # the [.., 8, chunk*page] sidecar blocks
                    spc = self.chunk * page
                    sl = jax.lax.dynamic_slice_in_dim(
                        scale_pool, li * PP // self.chunk, PP // self.chunk,
                        axis=1)  # [B, PP/chunk, 8, chunk*page]
                    ksc = sl[:, :, 0].reshape(B, PP * page)
                    vsc = sl[:, :, 1].reshape(B, PP * page)
                    kk = (kk.astype(cfg.dtype)
                          * ksc[:, :, None, None].astype(cfg.dtype))
                    vv = (vv.astype(cfg.dtype)
                          * vsc[:, :, None, None].astype(cfg.dtype))
                if attn_bias is not None:
                    # bias spans cache_size keys; the pool is chunk-rounded
                    # to PP*page. Pad with zeros (kv_len masks the tail).
                    padn = PP * page - attn_bias.shape[-1]
                    if padn > 0:
                        attn_bias = jnp.pad(
                            attn_bias, [(0, 0)] * (attn_bias.ndim - 1)
                            + [(0, padn)])
                    else:
                        attn_bias = attn_bias[..., :PP * page]
                if (key_padding_mask is not None
                        and key_padding_mask.shape[-1] != PP * page):
                    # caller's mask covers cache_size keys; pad the
                    # chunk-rounded tail as INVALID (kv_len masks it too)
                    key_padding_mask = jnp.pad(
                        key_padding_mask,
                        [(0, 0)] * (key_padding_mask.ndim - 1)
                        + [(0, PP * page - key_padding_mask.shape[-1])])
                out = attention(
                    q, kk, vv, bias=attn_bias,
                    key_padding_mask=key_padding_mask, scale=scale,
                    causal=self.causal, q_offset=start, kv_len=start + T,
                    use_flash=cfg.use_flash,
                    flash_block_q=cfg.flash_block_q,
                    flash_block_k=cfg.flash_block_k,
                )

        out = out.reshape(B, T, H * D)
        if cfg.subln:
            out = make_norm(cfg, "inner_attn_ln")(out)
        out = make_dense(cfg, E, kernel_init=o_init, name="out_proj")(out)
        return out, k_pool, v_pool, scale_pool

    def _scatter_rows(self, k_pool, v_pool, scale_pool, k_new, v_new, li,
                      start, quantized):
        B, T, H, D = k_new.shape
        pos = start + jnp.arange(T)
        pids = li * self.pages_per_layer + pos // self.page  # [T]
        offs = pos % self.page
        if quantized:
            from unilm_tpu.ops.paged_attention import quantize_kv_rows

            ki, vi, ks, vs = quantize_kv_rows(
                k_new.reshape(B * T, H * D), v_new.reshape(B * T, H * D))
            k_pool = k_pool.at[:, pids, offs].set(
                ki.reshape(B, T, H * D))
            v_pool = v_pool.at[:, pids, offs].set(
                vi.reshape(B, T, H * D))
            slab_ids = pids // self.chunk
            pos_in = (pids % self.chunk) * self.page + offs
            scale_pool = scale_pool.at[:, slab_ids, 0, pos_in].set(
                ks.reshape(B, T))
            scale_pool = scale_pool.at[:, slab_ids, 1, pos_in].set(
                vs.reshape(B, T))
        else:
            k_pool = k_pool.at[:, pids, offs].set(
                k_new.reshape(B, T, H * D).astype(k_pool.dtype))
            v_pool = v_pool.at[:, pids, offs].set(
                v_new.reshape(B, T, H * D).astype(v_pool.dtype))
        return k_pool, v_pool, scale_pool


class _ScanCrossAttention(nn.Module):
    """Cross-attention twin: static per-sequence K/V in a stacked
    [B, L, S, H, D] carry (prefill computes+stores, decode reads)."""

    cfg: TransformerConfig
    mode: str = "decode"

    @nn.compact
    def __call__(self, x, encoder_out, cross_k, cross_v, li,
                 encoder_padding_mask, attn_bias):
        cfg = self.cfg
        H, D, E = cfg.num_heads, cfg.head_dim, cfg.embed_dim
        B, T = x.shape[0], x.shape[1]
        assert not cfg.xpos_rel_pos, (
            "scan_layers cross-attention with xPos not implemented (no "
            "north-star model combines them; use the looped path)")

        qk_init = scaled_init(nn.initializers.xavier_uniform(), 2**-0.5)
        # sub-LN skips cross-attention projections (decoder.py:321-322)
        vo_scale = 1.0 / cfg.deepnorm_init_div
        v_init = scaled_init(nn.initializers.xavier_uniform(),
                             (2**-0.5) * vo_scale)
        o_init = scaled_init(nn.initializers.xavier_uniform(), vo_scale)
        from unilm_tpu.core.layers import make_dense

        q = make_dense(cfg, H * D, kernel_init=qk_init, name="q_proj")(
            x).reshape(B, T, H, D)
        if self.mode == "prefill":
            k = make_dense(cfg, H * D, kernel_init=qk_init, name="k_proj")(
                encoder_out).reshape(B, -1, H, D)
            v = make_dense(cfg, H * D, kernel_init=v_init, name="v_proj")(
                encoder_out).reshape(B, -1, H, D)
            cross_k = jax.lax.dynamic_update_slice_in_dim(
                cross_k, k[:, None].astype(cross_k.dtype), li, axis=1)
            cross_v = jax.lax.dynamic_update_slice_in_dim(
                cross_v, v[:, None].astype(cross_v.dtype), li, axis=1)
        else:
            # decode-first init unsupported (same as the looped path: the
            # cross cache must come from a prefill)
            k = jax.lax.dynamic_slice_in_dim(cross_k, li, 1, axis=1)[:, 0]
            v = jax.lax.dynamic_slice_in_dim(cross_v, li, 1, axis=1)[:, 0]
        Bkv = k.shape[0]
        if Bkv != B:
            # beam search: the cross cache is NOT tiled to beams (generate
            # _tile_cache skips it — tiling invited XLA to re-materialize
            # the K-way broadcast every step). Fold the K beams into the
            # query length instead: non-causal cross attention over shared
            # keys is exact under this reshape.
            assert B % Bkv == 0, (B, Bkv)
            G = B // Bkv
            out = attention(
                q.reshape(Bkv, G * T, H, D), k, v, bias=attn_bias,
                key_padding_mask=encoder_padding_mask, scale=cfg.attn_scale,
                causal=False, use_flash=cfg.use_flash,
                flash_block_q=cfg.flash_block_q,
                flash_block_k=cfg.flash_block_k,
            ).reshape(B, T, H, D)
        else:
            out = attention(
                q, k, v, bias=attn_bias,
                key_padding_mask=encoder_padding_mask, scale=cfg.attn_scale,
                causal=False, use_flash=cfg.use_flash,
                flash_block_q=cfg.flash_block_q,
                flash_block_k=cfg.flash_block_k,
            )
        out = out.reshape(B, T, H * D)
        out = make_dense(cfg, E, kernel_init=o_init, name="out_proj")(out)
        return out, cross_k, cross_v


class _ScanDecoderLayerKV(nn.Module):
    """nn.scan body for PREFILL/DECODE: carry = (x, k_pool, v_pool,
    cross_k, cross_v, layer_index); same param subtree as DecoderLayer."""

    cfg: TransformerConfig
    has_cross_attention: bool = False
    alpha: float = 1.0
    causal: bool = True
    mode: str = "decode"
    page: int = 64
    chunk: int = 8
    pages_per_layer: int = 0

    @nn.compact
    def __call__(self, carry, encoder_out, self_key_padding_mask,
                 encoder_padding_mask, self_attn_bias, cross_attn_bias,
                 start):
        cfg = self.cfg
        x, k_pool, v_pool, scale_pool, cross_k, cross_v, li = carry

        def _mln(name):
            return make_norm(cfg, name)

        residual = x
        if cfg.normalize_before:
            x = _mln("self_attn_layer_norm")(x)
        x, k_pool, v_pool, scale_pool = _ScanSelfAttention(
            cfg, mode=self.mode, causal=self.causal,
            use_xpos=cfg.xpos_rel_pos, page=self.page, chunk=self.chunk,
            pages_per_layer=self.pages_per_layer, name="self_attn",
        )(x, k_pool, v_pool, scale_pool, li, start, self_key_padding_mask,
          self_attn_bias)
        x = residual * self.alpha + x
        if not cfg.normalize_before:
            x = _mln("self_attn_layer_norm")(x)

        if self.has_cross_attention:
            residual = x
            if cfg.normalize_before:
                x = _mln("encoder_attn_layer_norm")(x)
            x, cross_k, cross_v = _ScanCrossAttention(
                cfg, mode=self.mode, name="encoder_attn",
            )(x, encoder_out, cross_k, cross_v, li, encoder_padding_mask,
              cross_attn_bias)
            x = residual * self.alpha + x
            if not cfg.normalize_before:
                x = _mln("encoder_attn_layer_norm")(x)

        ffn, _ = _build_ffn(cfg, 0)
        residual = x
        if cfg.normalize_before:
            x = _mln("final_layer_norm")(x)
        x = ffn(x, deterministic=True)
        x = residual * self.alpha + x
        if not cfg.normalize_before:
            x = _mln("final_layer_norm")(x)
        return (x, k_pool, v_pool, scale_pool, cross_k, cross_v,
                li + 1), None


def stack_layer_params(params: dict, num_layers: int, prefix: str = "layers_",
                       out_key: str = "layers") -> dict:
    """Convert a looped param (sub)tree {layers_0: t0, ...} into the
    scan_layers form {layers: stacked-on-axis-0}. Non-layer keys pass
    through. Works on any collection with the same naming (e.g. a decoder's
    'cache' tree is NOT converted — caches are created fresh by prefill)."""
    rest = {k: v for k, v in params.items() if not k.startswith(prefix)}
    trees = [params[f"{prefix}{i}"] for i in range(num_layers)]
    rest[out_key] = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)
    return rest


def unstack_layer_params(params: dict, num_layers: int, key: str = "layers",
                         prefix: str = "layers_") -> dict:
    """Inverse of stack_layer_params (scanned checkpoint -> looped tree)."""
    rest = {k: v for k, v in params.items() if k != key}
    stacked = params[key]
    for i in range(num_layers):
        rest[f"{prefix}{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return rest


class Encoder(nn.Module):
    """Bidirectional stack over pre-embedded inputs.

    Models own their embedding front-ends; this is the layer stack + final LN
    (torchscale Encoder, encoder.py:156-382). `attn_bias` may be one array
    shared by all layers or a per-layer sequence (BEiT per-block tables)."""

    cfg: TransformerConfig
    final_layer_norm: bool = True  # BEiT mean-pooling replaces it with fc_norm

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, E] already embedded
        *,
        key_padding_mask: Optional[jax.Array] = None,
        attn_bias: Any = None,  # array | sequence of arrays | callable(i)
        layer_scale_init: float = 0.0,
        multiway_split_mask: Optional[jax.Array] = None,  # [T] or [B,T] bool
        deterministic: bool = True,
        return_all_hiddens: bool = False,
    ):
        cfg = self.cfg
        alpha = cfg.deepnorm_alpha if cfg.deepnorm else 1.0
        if cfg.rel_pos_buckets > 0 and attn_bias is None:
            rel = RelativePositionBias(
                num_buckets=cfg.rel_pos_buckets,
                max_distance=cfg.max_rel_pos,
                num_heads=cfg.num_heads,
                bidirectional=True,
                dtype=cfg.dtype,
                name="relative_position",
            )
            attn_bias = rel(x.shape[1], x.shape[1])

        dpr = list(np.linspace(0, cfg.drop_path_rate, cfg.num_layers))
        hiddens = []
        for i in range(cfg.num_layers):
            if callable(attn_bias):
                bias_i = attn_bias(i)
            elif isinstance(attn_bias, (list, tuple)):
                bias_i = attn_bias[i]
            else:
                bias_i = attn_bias
            layer = EncoderLayer(
                cfg,
                layer_idx=i,
                drop_path=dpr[i],
                layer_scale_init=layer_scale_init,
                alpha=alpha,
                name=f"layers_{i}",
            )

            def run_layer(mdl, h, bias_j):
                return mdl(
                    h,
                    key_padding_mask=key_padding_mask,
                    attn_bias=bias_j,
                    split_mask=multiway_split_mask,
                    deterministic=deterministic,
                )

            if cfg.remat:
                # fairseq --checkpoint-activations equivalent: rematerialize
                # the layer in backward instead of keeping activations
                x = nn.remat(run_layer, policy=_remat_policy(cfg))(
                    layer, x, bias_i)
            else:
                x = run_layer(layer, x, bias_i)
            if return_all_hiddens:
                hiddens.append(x)
        if cfg.normalize_before and self.final_layer_norm:
            if cfg.multiway:
                from unilm_tpu.core.multiway import MultiwayNorm

                x = MultiwayNorm(
                    epsilon=cfg.layernorm_eps, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name="layer_norm",
                )(x, multiway_split_mask)
            else:
                x = _ln(cfg, "layer_norm")(x)
        if return_all_hiddens:
            return x, hiddens
        return x


class Decoder(nn.Module):
    """Causal / encoder-decoder stack over pre-embedded inputs.

    torchscale Decoder (decoder.py:211-499) minus the embedding front-end
    (owned by models) plus static-shape incremental decoding."""

    cfg: TransformerConfig
    has_cross_attention: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, E] already embedded
        encoder_out: Optional[jax.Array] = None,
        *,
        self_key_padding_mask: Optional[jax.Array] = None,
        encoder_padding_mask: Optional[jax.Array] = None,
        attn_bias: Optional[jax.Array] = None,  # external additive bias
        causal: bool = True,
        mode: str = "train",
        cache_size: int = 0,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        alpha = cfg.deepnorm_alpha if cfg.deepnorm else 1.0

        self_attn_bias = attn_bias
        if cfg.rel_pos_buckets > 0:
            rel = RelativePositionBias(
                num_buckets=cfg.rel_pos_buckets,
                max_distance=cfg.max_rel_pos,
                num_heads=cfg.num_heads,
                bidirectional=False,
                dtype=cfg.dtype,
                name="self_attn_relative_position",
            )
            if mode == "train":
                rel_bias = rel(x.shape[1], x.shape[1])
                self_attn_bias = rel_bias if self_attn_bias is None else self_attn_bias + rel_bias
            else:
                # decode: bias rows for current steps against full cache
                idx = self.variable("cache", "step", lambda: jnp.zeros((), jnp.int32))
                rel_bias = rel(x.shape[1], cache_size, step=idx.value)
                self_attn_bias = rel_bias if self_attn_bias is None else self_attn_bias + rel_bias
                idx.value = idx.value + x.shape[1]

        if cfg.scan_layers:
            # Dispatch-free stack: ONE lax.scan over axis-0-stacked params.
            # A 24-layer bs=1 decode step unrolled is 600+ tiny ops whose
            # per-op scheduling gaps dominate the weight-stream roofline;
            # scanned, XLA compiles one loop body.
            assert cfg.moe_freq == 0, "scan_layers requires dense layers"
            assert cfg.drop_path_rate == 0.0, (
                "scan_layers requires a uniform stack (no per-layer "
                "stochastic-depth schedule)")
            # scan carries need a fixed dtype; an f32 embedding front-end
            # (layernorm_embedding) meets bf16 layer outputs otherwise —
            # the looped path downcasts at layer 1's first op anyway
            x = x.astype(cfg.dtype)
            if mode == "train":
                body_cls = _ScanDecoderLayer
                if cfg.remat:
                    body_cls = nn.remat(
                        body_cls, policy=_remat_policy(cfg), prevent_cse=False)
                scan_cls = nn.scan(
                    body_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=nn.broadcast,
                    length=cfg.num_layers,
                )
                x, _ = scan_cls(
                    cfg, has_cross_attention=self.has_cross_attention,
                    alpha=alpha, causal=causal, mode=mode,
                    cache_size=cache_size, deterministic=deterministic,
                    name="layers",
                )(x, encoder_out, self_key_padding_mask,
                  encoder_padding_mask, self_attn_bias, None,
                  jnp.zeros((), jnp.int32))
                if cfg.normalize_before:
                    x = _ln(cfg, "layer_norm")(x)
                return x

            # ---- prefill/decode: carry-threaded KV page pool ------------
            assert cache_size > 0, "prefill/decode need cache_size"
            L, B, T = cfg.num_layers, x.shape[0], x.shape[1]
            H, D = cfg.num_heads, cfg.head_dim
            page, chunk, pp = _scan_pool_geometry(cache_size)
            kv_int8 = cfg.kv_cache_dtype == "int8"
            pool_dt = jnp.int8 if kv_int8 else cfg.dtype
            kp = self.variable(
                "cache", "kv_pool_key", jnp.zeros,
                (B, L * pp, page, H * D), pool_dt)
            vp = self.variable(
                "cache", "kv_pool_value", jnp.zeros,
                (B, L * pp, page, H * D), pool_dt)
            if kv_int8:
                sp = self.variable(
                    "cache", "kv_pool_scale", jnp.zeros,
                    (B, L * pp // chunk, 8, chunk * page), jnp.float32)
                spv = sp.value
            else:
                spv = jnp.zeros((), jnp.float32)  # dummy carry leaf
            idx = self.variable(
                "cache", "cache_index", lambda: jnp.zeros((), jnp.int32))
            start = (jnp.zeros((), jnp.int32) if mode == "prefill"
                     else idx.value)
            idx.value = start + T
            if self.has_cross_attention:
                if mode == "prefill":
                    S_enc = encoder_out.shape[1]
                    ck = self.variable(
                        "cache", "cross_key", jnp.zeros,
                        (B, L, S_enc, H, D), cfg.dtype)
                    cv = self.variable(
                        "cache", "cross_value", jnp.zeros,
                        (B, L, S_enc, H, D), cfg.dtype)
                else:
                    ck = self.variable("cache", "cross_key", None)
                    cv = self.variable("cache", "cross_value", None)
                ckv, cvv = ck.value, cv.value
            else:
                ckv = cvv = jnp.zeros((), cfg.dtype)  # dummy carry leaves
            scan_cls = nn.scan(
                _ScanDecoderLayerKV,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=L,
            )
            carry = (x, kp.value, vp.value, spv, ckv, cvv,
                     jnp.zeros((), jnp.int32))
            carry, _ = scan_cls(
                cfg, has_cross_attention=self.has_cross_attention,
                alpha=alpha, causal=causal, mode=mode, page=page,
                chunk=chunk, pages_per_layer=pp, name="layers",
            )(carry, encoder_out, self_key_padding_mask,
              encoder_padding_mask, self_attn_bias, None, start)
            x, kp.value, vp.value, spv, ckv, cvv, _ = carry
            if kv_int8:
                sp.value = spv
            if self.has_cross_attention:
                ck.value, cv.value = ckv, cvv
            if cfg.normalize_before:
                x = _ln(cfg, "layer_norm")(x)
            return x

        dpr = list(np.linspace(0, cfg.drop_path_rate, cfg.num_layers))
        for i in range(cfg.num_layers):
            layer = DecoderLayer(
                cfg,
                layer_idx=i,
                drop_path=dpr[i],
                has_cross_attention=self.has_cross_attention,
                alpha=alpha,
                name=f"layers_{i}",
            )

            def run_layer(mdl, h, bias_i, enc):
                return mdl(
                    h,
                    enc,
                    self_key_padding_mask=self_key_padding_mask,
                    encoder_padding_mask=encoder_padding_mask,
                    self_attn_bias=bias_i,
                    causal=causal,
                    mode=mode,
                    cache_size=cache_size,
                    deterministic=deterministic,
                )

            if cfg.remat and mode == "train":
                # fairseq --checkpoint-activations / torchscale
                # checkpoint_wrapper (decoder.py:351): rematerialize the layer
                # in backward. Decode mode mutates the cache collection, which
                # remat cannot wrap — and keeps no activations anyway.
                x = nn.remat(run_layer, policy=_remat_policy(cfg))(
                    layer, x, self_attn_bias, encoder_out)
            else:
                x = run_layer(layer, x, self_attn_bias, encoder_out)
        if cfg.normalize_before:
            x = _ln(cfg, "layer_norm")(x)
        return x
