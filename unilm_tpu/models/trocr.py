"""TrOCR: OCR encoder-decoder (vision encoder + text decoder + beam search).

Capability-equivalent of reference trocr/trocr_models.py:34-526:
- TrOCREncoder wraps a timm DeiT/BEiT ViT (:492-526) -> here a ViT encoder on
  the shared core (abs pos embed, optional DeiT distillation token)
- decoder = fairseq TransformerDecoder initialized from RoBERTa via
  state-dict surgery (:149-238) -> here the shared Decoder core with
  cross-attention; the converter performs the equivalent surgery on HF
  TrOCR/VisionEncoderDecoder checkpoints
- beam search via runtime.generate (static shapes; fairseq's
  reorder_encoder_out/reorder_incremental_state become batch-axis gathers)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.embedding import PatchEmbed
from unilm_tpu.core.transformer import Decoder, Encoder
from unilm_tpu.runtime import generate as gen


@dataclasses.dataclass(frozen=True)
class TrOCRConfig:
    # encoder (ViT/DeiT)
    img_size: int = 384
    patch_size: int = 16
    enc_dim: int = 768
    enc_layers: int = 12
    enc_heads: int = 12
    enc_ffn: int = 3072
    distilled: bool = True  # DeiT distillation token
    enc_eps: float = 1e-6
    # decoder
    vocab_size: int = 50265
    dec_dim: int = 1024
    dec_layers: int = 12
    dec_heads: int = 16
    dec_ffn: int = 4096
    max_positions: int = 512
    pos_offset: int = 2  # fairseq padding_idx+1 shift
    scale_embedding: bool = False
    layernorm_embedding: bool = True
    normalize_before: bool = False  # trocr-base decoder is post-LN
    share_input_output_embed: bool = False
    dec_eps: float = 1e-5
    activation: str = "gelu"
    dropout: float = 0.0
    enc_to_dec_proj: bool = False  # HF VisionEncoderDecoder dim-bridge
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    scan_layers: bool = False  # scan the DECODER stack (decode dispatch
    # killer — core/config.py scan_layers); the encoder keeps its loop
    # (one big prefill call, dispatch already amortized)
    quant_weights: bool = False  # int8 weight-only DECODER projections +
    # output head (conversion-only: quantize_trocr_decoder). bs=1 decode
    # is weight-stream-bound; the encoder stays full precision.

    def encoder_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.enc_dim, ffn_dim=self.enc_ffn, num_layers=self.enc_layers,
            num_heads=self.enc_heads, normalize_before=True, layernorm_eps=self.enc_eps,
            dtype=self.dtype, use_flash=self.use_flash, dropout=self.dropout,
        )

    def decoder_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            vocab_size=self.vocab_size, embed_dim=self.dec_dim, ffn_dim=self.dec_ffn,
            num_layers=self.dec_layers, num_heads=self.dec_heads,
            normalize_before=self.normalize_before, layernorm_eps=self.dec_eps,
            activation=self.activation, is_encoder_decoder=True,
            dtype=self.dtype, use_flash=self.use_flash, dropout=self.dropout,
            scan_layers=self.scan_layers, quant_weights=self.quant_weights,
        )

    @property
    def num_prefix_tokens(self) -> int:
        return 2 if self.distilled else 1


class ViTEncoder(nn.Module):
    """DeiT-style ViT (trocr/deit.py AdaptedVisionTransformer): conv patchify,
    cls (+distillation) token, learned abs positions, pre-LN blocks, final LN."""

    cfg: TrOCRConfig

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        tcfg = cfg.encoder_cfg()
        x = PatchEmbed(cfg.patch_size, cfg.enc_dim, tcfg.dtype, name="patch_embed")(images)
        B, N, E = x.shape
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, E))
        toks = [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, E))]
        if cfg.distilled:
            dist = self.param("dist_token", nn.initializers.zeros, (1, 1, E))
            toks.append(jnp.broadcast_to(dist.astype(x.dtype), (B, 1, E)))
        x = jnp.concatenate(toks + [x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, N + cfg.num_prefix_tokens, E),
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        return Encoder(tcfg, name="encoder")(x, deterministic=deterministic)


class TrOCRDecoder(nn.Module):
    """Text decoder with cross-attention over encoder tokens."""

    cfg: TrOCRConfig

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # [B, T]
        encoder_out: jax.Array,  # [B, S, E_enc]
        *,
        mode: str = "train",
        cache_size: int = 0,
        deterministic: bool = True,
        return_features: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        tcfg = cfg.decoder_cfg()
        B, T = tokens.shape

        embed = nn.Embed(
            cfg.vocab_size, cfg.dec_dim,
            embedding_init=nn.initializers.normal(cfg.dec_dim**-0.5),
            dtype=tcfg.dtype, name="embed_tokens",
        )
        x = embed(tokens)
        if cfg.scale_embedding:
            x = x * (cfg.dec_dim**0.5)

        if mode == "decode":
            stepv = self.variable("cache", "pos", lambda: jnp.zeros((), jnp.int32))
            positions = stepv.value + jnp.arange(T)
            stepv.value = stepv.value + T
        else:
            positions = jnp.arange(T)
            if mode == "prefill":
                stepv = self.variable("cache", "pos", lambda: jnp.zeros((), jnp.int32))
                stepv.value = jnp.asarray(T, jnp.int32)
        pos_table = self.param(
            "embed_positions",
            nn.initializers.normal(cfg.dec_dim**-0.5),
            (cfg.max_positions + cfg.pos_offset, cfg.dec_dim),
        )
        x = x + jnp.take(pos_table, positions + cfg.pos_offset, axis=0).astype(x.dtype)

        if cfg.layernorm_embedding:
            x = nn.LayerNorm(epsilon=cfg.dec_eps, name="layernorm_embedding")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        x = Decoder(tcfg, has_cross_attention=True, name="decoder")(
            x,
            encoder_out,
            mode=mode,
            cache_size=cache_size,
            deterministic=deterministic,
        )
        if return_features:
            # pre-logit decoder output for chunked-vocab CE (ops/fused_ce.py):
            # the [B, T, 50k] logits tensor never materializes in training.
            return x
        if cfg.share_input_output_embed:
            logits = embed.attend(x)
        elif cfg.quant_weights:
            from unilm_tpu.ops.quant import QuantDense

            # int8 head (use_kernel=False: the XLA dequant-dot runs at the
            # int8 stream roofline even at tiny M — see core/layers)
            logits = QuantDense(cfg.vocab_size, use_bias=False,
                                dtype=tcfg.dtype, use_kernel=False,
                                name="output_projection")(x)
        else:
            # dtype follows the compute dtype: flax's default promotion would
            # run the [*,1024]x[1024,50k] head in fp32 (~8x MXU cost in bf16)
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=tcfg.dtype,
                              name="output_projection")(x)
        return logits


class TrOCRModel(nn.Module):
    """Full encoder-decoder; `method=`-dispatchable encode/prefill/decode."""

    cfg: TrOCRConfig

    def setup(self):
        self.vit = ViTEncoder(self.cfg)
        self.text_decoder = TrOCRDecoder(self.cfg)
        if self.cfg.enc_to_dec_proj:
            self.enc_to_dec_proj = nn.Dense(self.cfg.dec_dim)

    def encode(self, images, deterministic: bool = True):
        enc = self.vit(images, deterministic=deterministic)
        if self.cfg.enc_to_dec_proj:
            enc = self.enc_to_dec_proj(enc)
        return enc

    def prefill(self, tokens, encoder_out, cache_size: int):
        return self.text_decoder(
            tokens, encoder_out, mode="prefill", cache_size=cache_size
        )

    def decode_step(self, tokens, encoder_out, cache_size: int):
        return self.text_decoder(
            tokens, encoder_out, mode="decode", cache_size=cache_size
        )

    def __call__(self, images, prev_tokens, deterministic: bool = True,
                 return_features: bool = False):
        enc = self.encode(images, deterministic)
        return self.text_decoder(prev_tokens, enc, deterministic=deterministic,
                                 return_features=return_features)


def quantize_trocr_decoder(params: dict) -> dict:
    """Conversion for TrOCRConfig(quant_weights=True): int8 weight-only
    projections in the TEXT decoder (self/cross attention + FFN kernels)
    plus the output head; the ViT encoder, embeddings and norms stay full
    precision. Works on looped or stacked (scan_layers) trees."""
    from unilm_tpu.ops.quant import quantize_dense_tree

    _PROJ = {"q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2", "fc3"}

    def pred(pth):
        if "text_decoder" not in pth:
            return False
        if pth[-2] == "output_projection":
            return True
        return pth[-2] in _PROJ and any(s.startswith("layers") for s in pth)

    return quantize_dense_tree(params, predicate=pred)


def stack_trocr_params(params: dict, num_layers: int) -> dict:
    """Looped TrOCR tree -> scan_layers tree (text_decoder/decoder/layers
    stacked on axis 0); the ViT encoder keeps its loop."""
    from unilm_tpu.core.transformer import stack_layer_params

    out = dict(params)
    td = dict(out["text_decoder"])
    td["decoder"] = stack_layer_params(dict(td["decoder"]), num_layers)
    out["text_decoder"] = td
    return out


def make_generate_fns(model: TrOCRModel, cache_size: int):
    """(prefill, step) closures for runtime.generate."""

    def prefill(params, tokens, aux):
        logits, vars_ = model.apply(
            {"params": params}, tokens, aux, cache_size,
            method=model.prefill, mutable=["cache"],
        )
        return logits, vars_["cache"]

    def step(params, tokens, cache, aux):
        # decode reads cross K/V from the cache — encoder_out is dead here,
        # and threading the beam-tiled [B*K, S, E] tensor through the decode
        # while-loop cost 267 ms/batch of rematerialized broadcasts at
        # TrOCR-base B=32 beam=5 (profiled). Pass None instead.
        logits, vars_ = model.apply(
            {"params": params, "cache": cache}, tokens, None, cache_size,
            method=model.decode_step, mutable=["cache"],
        )
        return logits, vars_["cache"]

    return prefill, step


def trocr_base(**kw) -> TrOCRConfig:
    """trocr_base arch (trocr_models.py:430-450): DeiT-base encoder,
    RoBERTa-large-dim decoder."""
    return TrOCRConfig(**kw)


def trocr_large(**kw) -> TrOCRConfig:
    kw.setdefault("enc_dim", 1024)
    kw.setdefault("enc_layers", 24)
    kw.setdefault("enc_heads", 16)
    kw.setdefault("enc_ffn", 4096)
    kw.setdefault("distilled", False)
    return TrOCRConfig(**kw)


def trocr_small(**kw) -> TrOCRConfig:
    kw.setdefault("enc_dim", 384)
    kw.setdefault("enc_heads", 6)
    kw.setdefault("dec_dim", 256)
    kw.setdefault("dec_layers", 6)
    kw.setdefault("dec_heads", 8)
    kw.setdefault("dec_ffn", 1024)
    kw.setdefault("vocab_size", 64044)
    return TrOCRConfig(**kw)
