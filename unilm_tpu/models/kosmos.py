"""Kosmos-2 / Kosmos-2.5: grounded multimodal LLM (UniGPT).

Capability-equivalent of:
- kosmos-2/unilm/models/unigpt.py:167-525 (UniGPT: GPT decoder + pluggable
  image towers & connectors, arch registry)
- kosmos-2.5/kosmos2_5/models/gpt.py:106-311 (GPTmodel/LMDecoder: torchscale
  decoder + multimodal embedding splice + segment embeddings + incremental
  first_step handling)
- kosmos-2.5/kosmos2_5/models/connector.py:10-28 (XConnector latent-query
  resampler; 64 queries for k2, 2048 for k2.5)
- kosmos-2/unilm/models/vl/clip.py (open_clip ViT-L/14 tower)
- HF Pix2StructVisionModel (variable-resolution patch tower, k2.5)

TPU-first notes: the reference's boolean-mask scatter
`gpt_embed_output[img_gpt_input_mask] = img_features` (gpt.py:233-234)
becomes a static-shape cumsum-gather + where; decode positions come from the
cache step counter instead of re-slicing a growing tensor. The reference's
k2.5 inference prefill omits the causal mask (gpt.py passes
self_attn_mask=None) — we default to causal prefill (mathematically the
correct LM semantics; the last prompt position, the only one whose logits are
consumed, attends identically either way, but deeper-layer KV caches differ;
set prefix_lm_prefill=True to reproduce the reference's behavior exactly).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.embedding import PatchEmbed
from unilm_tpu.core.transformer import Decoder, Encoder


# --------------------------------------------------------------------------- #
# fairseq sinusoidal positions (kosmos uses decoder_learned_pos=False)
# --------------------------------------------------------------------------- #


def sinusoidal_table(num_positions: int, dim: int, padding_idx: int = 1) -> np.ndarray:
    """fairseq SinusoidalPositionalEmbedding.get_embedding: half sin, half cos,
    position padding_idx zeroed; callers index at pad+1+step."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freq = np.exp(np.arange(half, dtype=np.float64) * -emb)
    pos = np.arange(num_positions, dtype=np.float64)[:, None] * freq[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_positions, 1))], axis=1)
    table[padding_idx] = 0.0
    return table.astype(np.float32)


# --------------------------------------------------------------------------- #
# Image towers
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    """open_clip ViT-L/14 defaults (kosmos-2/unilm/models/vl/clip.py)."""

    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    layernorm_eps: float = 1e-5
    dtype: Any = jnp.float32
    use_flash: bool = True


class ClipVisionEncoder(nn.Module):
    """CLIP visual tower (no projection head): conv(no bias) + cls + pos +
    ln_pre -> pre-LN blocks (quick_gelu) -> ln_post over all tokens."""

    cfg: ClipVisionConfig

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        tcfg = TransformerConfig(
            embed_dim=cfg.embed_dim, ffn_dim=cfg.ffn_dim, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, normalize_before=True, activation="quick_gelu",
            layernorm_eps=cfg.layernorm_eps, dtype=cfg.dtype, use_flash=cfg.use_flash,
        )
        p = cfg.patch_size
        x = nn.Conv(
            cfg.embed_dim, (p, p), strides=(p, p), padding="VALID", use_bias=False,
            dtype=tcfg.dtype, name="conv1",
        )(images)
        B, h, w, E = x.shape
        x = x.reshape(B, h * w, E)
        cls = self.param("class_embedding", nn.initializers.normal(E**-0.5), (E,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, E)), x], axis=1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(E**-0.5), (h * w + 1, E)
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="ln_pre")(x)
        x = Encoder(tcfg, final_layer_norm=False, name="transformer")(
            x, deterministic=deterministic
        )
        return nn.LayerNorm(epsilon=cfg.layernorm_eps, name="ln_post")(x)


@dataclasses.dataclass(frozen=True)
class Pix2StructVisionConfig:
    """HF Pix2StructVisionModel (kosmos-2.5 tower: 2048 variable-res patches)."""

    hidden_size: int = 1536
    num_layers: int = 18
    num_heads: int = 24
    d_ff: int = 3968
    d_kv: int = 64
    patch_dim: int = 768  # 16*16*3 flattened patch
    max_rows: int = 4096
    layernorm_eps: float = 1e-6
    dtype: Any = jnp.float32
    use_flash: bool = True


class Pix2StructVisionEncoder(nn.Module):
    """T5-style vision encoder over pre-extracted flattened patches.

    Input [B, N, 2 + patch_dim]: columns 0/1 are (row+1, col+1) ids, the rest
    the flattened patch; zero rows are padding (HF Pix2StructVisionEmbeddings
    semantics). RMSNorm, gated gelu_new FFN, bias-free, UNSCALED attention
    (T5 convention), d_kv-sized heads."""

    cfg: Pix2StructVisionConfig

    @nn.compact
    def __call__(self, flattened_patches: jax.Array, deterministic: bool = True):
        cfg = self.cfg
        tcfg = TransformerConfig(
            embed_dim=cfg.hidden_size, ffn_dim=cfg.d_ff, num_layers=cfg.num_layers,
            num_heads=cfg.num_heads, head_dim=cfg.d_kv, normalize_before=True,
            activation="geglu_new", norm_type="rmsnorm", use_bias=False,
            attn_scale=1.0, layernorm_eps=cfg.layernorm_eps, dtype=cfg.dtype,
            use_flash=cfg.use_flash,
        )
        mask = jnp.sum(jnp.abs(flattened_patches), axis=-1) > 0  # [B, N]
        rows = flattened_patches[..., 0].astype(jnp.int32)
        cols = flattened_patches[..., 1].astype(jnp.int32)
        patches = flattened_patches[..., 2:]
        x = nn.Dense(cfg.hidden_size, name="patch_projection")(patches)
        x = x + nn.Embed(cfg.max_rows, cfg.hidden_size, name="row_embedder")(rows)
        x = x + nn.Embed(cfg.max_rows, cfg.hidden_size, name="column_embedder")(cols)
        x = x * mask[..., None].astype(x.dtype)
        x = Encoder(tcfg, final_layer_norm=False, name="encoder")(
            x, key_padding_mask=mask, deterministic=deterministic
        )
        x = nn.RMSNorm(epsilon=cfg.layernorm_eps, name="layernorm")(x)
        return x * mask[..., None].astype(x.dtype), mask


class LatentQueryResampler(nn.Module):
    """XConnector (connector.py:10-28): dense projection + latent queries
    cross-attending over [features ++ latents]."""

    output_dim: int
    num_latents: int
    num_heads: int
    dtype: Any = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, features: jax.Array, deterministic: bool = True) -> jax.Array:
        from unilm_tpu.core.attention import MultiheadAttention

        B = features.shape[0]
        x = nn.Dense(self.output_dim, name="dense")(features)
        latent = self.param(
            "latent_query", nn.initializers.normal(1.0),
            (self.num_latents, self.output_dim),
        )
        latent_b = jnp.broadcast_to(
            latent[None].astype(x.dtype), (B, self.num_latents, self.output_dim)
        )
        kv = jnp.concatenate([x, latent_b], axis=1)
        acfg = TransformerConfig(
            embed_dim=self.output_dim, num_heads=self.num_heads, dtype=self.dtype,
            use_flash=self.use_flash,
        )
        return MultiheadAttention(acfg, self_attention=False, name="x_attn")(
            latent_b, key=kv, deterministic=deterministic
        )


# --------------------------------------------------------------------------- #
# UniGPT
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class UniGPTConfig:
    vocab_size: int = 65037
    embed_dim: int = 2048
    num_layers: int = 24
    num_heads: int = 32
    ffn_dim: int = 8192
    max_positions: int = 6144
    padding_idx: int = 1
    subln: bool = True
    xpos_rel_pos: bool = True
    scale_length: int = 2048
    learned_pos: bool = False  # False = fairseq sinusoidal
    use_positional: bool = True
    scale_embedding: bool = True
    share_input_output_embed: bool = True
    segment_emb: bool = False
    prefix_lm_prefill: bool = False  # reproduce k2.5 non-causal prefill
    activation: str = "gelu"
    dropout: float = 0.0
    moe_freq: int = 0  # X-MoE every Nth layer (kosmos xmoe arches)
    moe_experts: int = 0
    moe_top: int = 2
    moe_capacity_factor: float = 1.0  # train capacity (GShard C = S*cf/E)
    moe_eval_capacity_factor: float = 2.0
    moe_gate_dim: int = 0  # xMoE low-dim cosine routing (routing.py xMoE)
    moe_second_expert_policy: str = "random"
    remat: bool = False  # --checkpoint-activations (kosmos-2 train.sh:50)
    remat_policy: str = "full"  # see TransformerConfig.remat_policy
    # image tower: 'clip' (k2) | 'pix2struct' (k2.5) | None
    image_tower: Optional[str] = None
    latent_query_num: int = 64
    clip: ClipVisionConfig = ClipVisionConfig()
    pix2struct: Pix2StructVisionConfig = Pix2StructVisionConfig()
    # audio tower: 'wavlm' | None. The reference's UniGPT is explicitly
    # "pluggable image/text/AUDIO towers & connectors": aud_model +
    # aud_connector slots (unigpt.py:170-187,238-239) feed the same embed
    # splice as images (gpt.py:264-265
    # `gpt_embed_output[aud_gpt_input_mask] = aud_features`). The released
    # code leaves get_audio_representation to the speech checkpoints
    # (HuBERT/wavLM per its docstring); ours plugs models/wavlm.py in.
    audio_tower: Optional[str] = None
    audio_latent_query_num: int = 64
    wavlm: Any = None  # models.wavlm.WavLMConfig (lazy: avoid import cycle)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32  # bf16 = fairseq --memory-efficient-fp16
    # (kosmos-2 train.sh:33: params+grads in half precision, no fp32 master)
    use_flash: bool = True
    quant_weights: bool = False  # int8 weight-only decoder projections
    # (serving/decode; ops/quant.py — conversion-only, see ServingEngine)
    scan_layers: bool = False  # lax.scan the decoder stack over stacked
    # params (decode dispatch killer — core/config.py scan_layers). Convert
    # a looped checkpoint with models.kosmos.stack_unigpt_params.
    kv_cache_dtype: str = "model"  # "int8": per-token int8 KV in the
    # scanned decode pool (halves the ctx-dependent slab stream;
    # core/config.py kv_cache_dtype)
    quant_lm_head: bool = False  # int8 output projection (conversion-only:
    # quantize_lm_head builds it from the tied embedding). bs=1 decode
    # streams the [V, E] head every step — 333 MB bf16 = 0.44 ms at
    # kosmos-2.5 scale, the single biggest op after the layer stack.

    def decoder_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim, num_layers=self.num_layers,
            num_heads=self.num_heads, subln=self.subln,
            xpos_rel_pos=self.xpos_rel_pos, scale_length=self.scale_length,
            activation=self.activation, dropout=self.dropout,
            moe_freq=self.moe_freq, moe_experts=self.moe_experts,
            moe_top=self.moe_top,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_eval_capacity_factor=self.moe_eval_capacity_factor,
            moe_gate_dim=self.moe_gate_dim,
            moe_second_expert_policy=self.moe_second_expert_policy,
            remat=self.remat,
            remat_policy=self.remat_policy,
            dtype=self.dtype, param_dtype=self.param_dtype,
            use_flash=self.use_flash, quant_weights=self.quant_weights,
            scan_layers=self.scan_layers,
            kv_cache_dtype=self.kv_cache_dtype,
        )


def splice_image_features(
    token_embedding: jax.Array,  # [B, T, E]
    img_features: Optional[jax.Array],  # [B, Q, E]
    img_mask: Optional[jax.Array],  # [B, T] bool: image placeholder positions
) -> jax.Array:
    """Static-shape equivalent of `emb[img_gpt_input_mask] = img_features`
    (gpt.py:233-234): k-th True position of row b receives img_features[b, k]."""
    if img_features is None or img_mask is None:
        return token_embedding
    idx = jnp.cumsum(img_mask.astype(jnp.int32), axis=1) - 1  # [B, T]
    idx = jnp.clip(idx, 0, img_features.shape[1] - 1)
    placed = jnp.take_along_axis(img_features, idx[..., None], axis=1)
    return jnp.where(img_mask[..., None], placed.astype(token_embedding.dtype), token_embedding)


class StepCounter(nn.Module):
    """Owns the decode position counter in the 'cache' collection."""

    @nn.compact
    def __call__(self, delta: jax.Array, reset: bool = False) -> jax.Array:
        v = self.variable("cache", "pos", lambda: jnp.zeros((), jnp.int32))
        cur = jnp.zeros((), jnp.int32) if reset else v.value
        v.value = cur + delta
        return cur


class UniGPT(nn.Module):
    """GPT decoder with multimodal embedding splice (unigpt.py:167)."""

    cfg: UniGPTConfig

    def setup(self):
        cfg = self.cfg
        tcfg = cfg.decoder_cfg()
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.embed_dim,
            embedding_init=nn.initializers.normal(cfg.embed_dim**-0.5),
            dtype=tcfg.dtype, param_dtype=cfg.param_dtype,
            name="embed_tokens",
        )
        self.decoder = Decoder(tcfg, name="decoder")
        if not cfg.share_input_output_embed:
            self.output_projection = nn.Dense(
                cfg.vocab_size, use_bias=False, dtype=tcfg.dtype,
                kernel_init=nn.initializers.normal(cfg.embed_dim**-0.5),
                name="output_projection",
            )
        if cfg.quant_lm_head:
            from unilm_tpu.ops.quant import QuantDense

            # XLA dequant-dot (use_kernel=False): fuses convert+dot at the
            # int8 stream roofline even at M=1 (see core/layers.make_dense)
            self.lm_head_q = QuantDense(
                cfg.vocab_size, use_bias=False, dtype=tcfg.dtype,
                use_kernel=False, name="lm_head_q",
            )
        if cfg.learned_pos and cfg.use_positional:
            self.embed_positions = nn.Embed(
                cfg.max_positions + cfg.padding_idx + 1, cfg.embed_dim,
                embedding_init=nn.initializers.normal(cfg.embed_dim**-0.5),
                param_dtype=cfg.param_dtype, name="embed_positions",
            )
        if cfg.segment_emb:
            self.segment_embeddings = nn.Embed(2, cfg.embed_dim, name="segment_emb")
        self.step_counter = StepCounter(name="step_counter")

        # image tower + connector
        if cfg.image_tower == "clip":
            self.img_model = ClipVisionEncoder(cfg.clip, name="img_model")
            conn_in = cfg.clip.embed_dim
        elif cfg.image_tower == "pix2struct":
            self.img_model = Pix2StructVisionEncoder(cfg.pix2struct, name="img_model")
            conn_in = cfg.pix2struct.hidden_size
        if cfg.image_tower:
            self.img_connector = LatentQueryResampler(
                cfg.embed_dim, cfg.latent_query_num, cfg.num_heads,
                dtype=cfg.dtype, use_flash=cfg.use_flash, name="img_connector",
            )

        # audio tower + connector (unigpt.py:170-187 aud_model/aud_connector;
        # the speech checkpoints plug HuBERT/wavLM — ours is models/wavlm.py)
        if cfg.audio_tower == "wavlm":
            from unilm_tpu.models.wavlm import WavLMConfig, WavLMModel

            wcfg = cfg.wavlm if cfg.wavlm is not None else WavLMConfig(
                dtype=cfg.dtype)
            self.aud_model = WavLMModel(wcfg, name="aud_model")
        elif cfg.audio_tower:
            raise ValueError(f"unknown audio tower {cfg.audio_tower!r}")
        if cfg.audio_tower:
            self.aud_connector = LatentQueryResampler(
                cfg.embed_dim, cfg.audio_latent_query_num, cfg.num_heads,
                dtype=cfg.dtype, use_flash=cfg.use_flash, name="aud_connector",
            )

    # ------------------------------------------------------------------ #
    def get_image_representation(
        self, img_inputs: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Tower -> L2 normalize -> latent-query resample (unigpt.py:124-133)."""
        if self.cfg.image_tower == "pix2struct":
            feats, _ = self.img_model(img_inputs, deterministic)
        else:
            feats = self.img_model(img_inputs, deterministic)
        feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-6)
        return self.img_connector(feats, deterministic)

    def get_audio_representation(
        self, aud_inputs: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Audio tower -> L2 normalize -> latent-query resample; the audio
        analogue of get_image_representation (unigpt.py:311 delegates this
        to the speech checkpoints; the connector contract is the same)."""
        feats = self.aud_model(aud_inputs, deterministic)
        feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-6)
        return self.aud_connector(feats, deterministic)

    def _positions(self, T: int, start) -> jax.Array:
        return start + jnp.arange(T) + self.cfg.padding_idx + 1

    def _embed(self, tokens, img_features, img_mask, segment_tokens, positions,
               aud_features=None, aud_mask=None):
        cfg = self.cfg
        emb = self.embed_tokens(tokens)
        emb = splice_image_features(emb, img_features, img_mask)
        # audio splice: same scatter contract as images (gpt.py:264-265
        # `gpt_embed_output[aud_gpt_input_mask] = aud_features`)
        emb = splice_image_features(emb, aud_features, aud_mask)
        x = emb * (cfg.embed_dim**0.5 if cfg.scale_embedding else 1.0)
        if cfg.use_positional:
            if cfg.learned_pos:
                pos = self.embed_positions(positions)
            else:
                table = jnp.asarray(
                    sinusoidal_table(
                        cfg.max_positions + cfg.padding_idx + 1,
                        cfg.embed_dim,
                        cfg.padding_idx,
                    )
                )
                pos = jnp.take(table, positions, axis=0)
            if cfg.segment_emb and segment_tokens is not None:
                pos = pos + self.segment_embeddings(segment_tokens)
            if pos.ndim == 2:
                pos = pos[None]
            x = x + pos.astype(x.dtype)
        return x

    def output_layer(self, x):
        if self.cfg.quant_lm_head:
            return self.lm_head_q(x)
        if self.cfg.share_input_output_embed:
            return self.embed_tokens.attend(x)
        return self.output_projection(x)

    # ------------------------------------------------------------------ #
    def __call__(
        self,
        src_tokens: jax.Array,  # [B, T]
        img_inputs: Optional[jax.Array] = None,
        img_gpt_input_mask: Optional[jax.Array] = None,
        segment_tokens: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_features: bool = False,
        aud_inputs: Optional[jax.Array] = None,  # [B, samples] raw audio
        aud_gpt_input_mask: Optional[jax.Array] = None,  # [B, T] bool
    ) -> jax.Array:
        """return_features=True yields pre-logit decoder output [B, T, E]
        (for chunked-vocab losses, ops/fused_ce.py, which apply the tied
        output embedding themselves instead of materializing logits)."""
        img_feats = (
            self.get_image_representation(img_inputs, deterministic)
            if img_inputs is not None
            else None
        )
        aud_feats = (
            self.get_audio_representation(aud_inputs, deterministic)
            if aud_inputs is not None
            else None
        )
        x = self._embed(
            src_tokens, img_feats, img_gpt_input_mask, segment_tokens,
            self._positions(src_tokens.shape[1], 0),
            aud_features=aud_feats, aud_mask=aud_gpt_input_mask,
        )
        pad_mask = src_tokens != self.cfg.padding_idx
        x = self.decoder(
            x, self_key_padding_mask=pad_mask, causal=True, deterministic=deterministic
        )
        if return_features:
            return x
        return self.output_layer(x)

    def prefill(
        self,
        src_tokens: jax.Array,
        cache_size: int,
        img_features: Optional[jax.Array] = None,
        img_gpt_input_mask: Optional[jax.Array] = None,
        segment_tokens: Optional[jax.Array] = None,
        last_logit_only: bool = False,
        aud_features: Optional[jax.Array] = None,
        aud_gpt_input_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        self.step_counter(jnp.asarray(src_tokens.shape[1], jnp.int32), reset=True)
        x = self._embed(
            src_tokens, img_features, img_gpt_input_mask, segment_tokens,
            self._positions(src_tokens.shape[1], 0),
            aud_features=aud_features, aud_mask=aud_gpt_input_mask,
        )
        x = self.decoder(
            x, causal=not self.cfg.prefix_lm_prefill, mode="prefill",
            cache_size=cache_size,
        )
        if last_logit_only:
            # generation only consumes the final position; skip the
            # [T, vocab] projection (TTFT: saves ~0.7 TFLOP + 445 MB HBM)
            x = x[:, -1:]
        return self.output_layer(x)

    def decode_step(self, tokens: jax.Array, cache_size: int) -> jax.Array:
        start = self.step_counter(jnp.asarray(tokens.shape[1], jnp.int32))
        positions = self._positions(tokens.shape[1], start)
        x = self._embed(tokens, None, None, None, positions)
        x = self.decoder(x, causal=True, mode="decode", cache_size=cache_size)
        return self.output_layer(x)

    def encode_image(self, img_inputs, deterministic: bool = True):
        return self.get_image_representation(img_inputs, deterministic)

    def encode_audio(self, aud_inputs, deterministic: bool = True):
        return self.get_audio_representation(aud_inputs, deterministic)


def quantize_lm_head(params: dict) -> dict:
    """Conversion for UniGPTConfig(quant_lm_head=True): build the int8
    output head from whichever head the model actually uses — the real
    `output_projection` when the head is untied, else the tied embedding
    (emb.T); per-vocab-column scales either way. The embedding itself
    stays full precision for the lookup."""
    from unilm_tpu.ops.quant import quantize_int8

    out = dict(params)
    if "output_projection" in out:
        w = jnp.asarray(out["output_projection"]["kernel"])  # [E, V]
    else:
        w = jnp.asarray(out["embed_tokens"]["embedding"]).T  # [E, V]
    wi, scale = quantize_int8(w, axis=0)
    out["lm_head_q"] = {"kernel_i8": wi, "scale": scale}
    return out


def stack_unigpt_params(params: dict, num_layers: int) -> dict:
    """Convert a looped UniGPT param tree (decoder/layers_i) to the
    scan_layers form (decoder/layers stacked on axis 0). Towers and
    embeddings pass through untouched; only the TEXT decoder stack scans."""
    from unilm_tpu.core.transformer import stack_layer_params

    out = dict(params)
    out["decoder"] = stack_layer_params(dict(params["decoder"]), num_layers)
    return out


def make_unigpt_generate_fns(model: UniGPT, cache_size: int):
    """(prefill, step) closures for runtime.generate. aux carries
    (img_features, img_gpt_input_mask, segment_tokens) or None."""

    def prefill(params, tokens, aux):
        img_features = img_mask = segs = None
        if aux is not None:
            img_features, img_mask, segs = aux
        logits, vars_ = model.apply(
            {"params": params}, tokens, cache_size, img_features, img_mask, segs,
            True,  # last_logit_only: generate() reads logits[:, -1] only
            method=model.prefill, mutable=["cache"],
        )
        return logits, vars_["cache"]

    def step(params, tokens, cache, aux):
        logits, vars_ = model.apply(
            {"params": params, "cache": cache}, tokens, cache_size,
            method=model.decode_step, mutable=["cache"],
        )
        return logits, vars_["cache"]

    return prefill, step


# --------------------------------------------------------------------------- #
# Architecture registry (unigpt.py:478-525, kosmos-2.5 gptmodel_large)
# --------------------------------------------------------------------------- #


def kosmos2(**kw) -> UniGPTConfig:
    """Kosmos-2 1.3B: CLIP ViT-L/14 tower, 64 latent queries, 2048-dim GPT."""
    kw.setdefault("image_tower", "clip")
    kw.setdefault("latent_query_num", 64)
    if "dtype" in kw and "clip" not in kw:
        kw["clip"] = ClipVisionConfig(dtype=kw["dtype"])
    return UniGPTConfig(**kw)


def kosmos2_5(**kw) -> UniGPTConfig:
    """Kosmos-2.5 1.3B: Pix2Struct-large tower, 2048 latent queries."""
    kw.setdefault("image_tower", "pix2struct")
    kw.setdefault("latent_query_num", 2048)
    kw.setdefault("vocab_size", 108481)
    kw.setdefault("embed_dim", 1536)
    kw.setdefault("num_heads", 16)
    kw.setdefault("ffn_dim", 6144)
    kw.setdefault("segment_emb", True)
    # the vision tower inherits the compute dtype (it was silently fp32
    # before -- the TTFT path runs it in bf16 like the reference's .half())
    if "dtype" in kw and "pix2struct" not in kw:
        kw["pix2struct"] = Pix2StructVisionConfig(dtype=kw["dtype"])
    return UniGPTConfig(**kw)
