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
from unilm_tpu.core.layers import DropPath, FeedForward, LayerScale, make_norm
from unilm_tpu.core.positional import RelativePositionBias


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
    """nn.scan body: one homogeneous decoder layer, positional traced inputs
    (nn.scan silently DROPS call kwargs), static flags as attributes.
    Builds the same param subtree as DecoderLayer so a looped checkpoint
    stacks straight in (stack_layer_params)."""

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
            # per-op scheduling gaps (~1.9 ms measured on v5e) dominate the
            # weight-stream roofline; scanned, XLA compiles one loop body.
            assert cfg.moe_freq == 0, "scan_layers requires dense layers"
            assert cfg.drop_path_rate == 0.0, (
                "scan_layers requires a uniform stack (no per-layer "
                "stochastic-depth schedule)")
            cache_pos = jnp.zeros((), jnp.int32)
            if mode != "train":
                # ONE stack-level counter replaces 24 per-layer scalars
                # (axis-1 cache stacking cannot represent 0-dim leaves)
                idx = self.variable(
                    "cache", "cache_index", lambda: jnp.zeros((), jnp.int32))
                cache_pos = (jnp.zeros((), jnp.int32) if mode == "prefill"
                             else idx.value)
                idx.value = cache_pos + x.shape[1]
            body_cls = _ScanDecoderLayer
            if cfg.remat and mode == "train":
                body_cls = nn.remat(
                    body_cls, policy=_remat_policy(cfg), prevent_cse=False)
            scan_cls = nn.scan(
                body_cls,
                variable_axes={"params": 0, "cache": 1},
                split_rngs={"params": True, "dropout": True},
                in_axes=nn.broadcast,
                length=cfg.num_layers,
            )
            x, _ = scan_cls(
                cfg, has_cross_attention=self.has_cross_attention, alpha=alpha,
                causal=causal, mode=mode, cache_size=cache_size,
                deterministic=deterministic, name="layers",
            )(x, encoder_out, self_key_padding_mask, encoder_padding_mask,
              self_attn_bias, None, cache_pos)
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
