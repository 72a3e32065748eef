"""BEiT-3: Multiway multimodal encoder + task heads.

Capability-equivalent of torchscale/model/BEiT3.py:16-60 (vision tokens
first, text second, multiway split at the vision length, per-modality
positional tables) and beit3/modeling_finetune.py:57-275 task wrappers
(ImageClassification, Retrieval with contrastive heads, Captioning with a
uni-directional text mask over shared vision context, VQA pooler)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.embedding import PositionalEmbedding, TextEmbedding, VisionEmbedding
from unilm_tpu.core.multiway import split_mask_from_position
from unilm_tpu.core.transformer import Encoder
from unilm_tpu.ops.attention import NEG_INF


@dataclasses.dataclass(frozen=True)
class BEiT3Config:
    vocab_size: int = 64010
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    img_size: int = 224
    patch_size: int = 16
    max_text_len: int = 512
    layernorm_eps: float = 1e-5
    subln: bool = True
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.embed_dim, ffn_dim=self.ffn_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            normalize_before=True, subln=self.subln, multiway=True,
            layernorm_eps=self.layernorm_eps, dtype=self.dtype,
            use_flash=self.use_flash,
        )

    @property
    def num_vision_tokens(self) -> int:
        return (self.img_size // self.patch_size) ** 2 + 1


class BEiT3Model(nn.Module):
    cfg: BEiT3Config

    @nn.compact
    def __call__(
        self,
        textual_tokens: Optional[jax.Array] = None,  # [B, Lt]
        visual_images: Optional[jax.Array] = None,  # [B, H, W, 3] NHWC
        text_padding_mask: Optional[jax.Array] = None,  # [B, Lt] True=PAD
        vision_masked_position: Optional[jax.Array] = None,
        attn_bias: Optional[jax.Array] = None,  # e.g. captioning uni-mask
        deterministic: bool = True,
    ):
        cfg = self.cfg
        tcfg = cfg.transformer()
        assert textual_tokens is not None or visual_images is not None

        parts = []
        split_position = -1
        key_padding = None
        if visual_images is not None:
            v = VisionEmbedding(
                img_size=cfg.img_size, patch_size=cfg.patch_size,
                embed_dim=cfg.embed_dim, use_cls_token=True, use_mask_token=True,
                dtype=tcfg.dtype, name="vision_embed",
            )(visual_images, vision_masked_position)
            vpos = PositionalEmbedding(
                cfg.num_vision_tokens + 2, cfg.embed_dim, offset=2,
                dtype=tcfg.dtype, name="vision_pos_embed",
            )(jnp.arange(v.shape[1]))
            v = v + vpos[None]
            parts.append(v)
            split_position = v.shape[1]
        if textual_tokens is not None:
            t = TextEmbedding(cfg.vocab_size, cfg.embed_dim, dtype=tcfg.dtype,
                              name="text_embed")(textual_tokens)
            tpos = PositionalEmbedding(
                cfg.max_text_len + 2, cfg.embed_dim, offset=2,
                dtype=tcfg.dtype, name="text_pos_embed",
            )(jnp.arange(t.shape[1]))
            t = t + tpos[None]
            parts.append(t)
            if split_position < 0:
                split_position = 0

        x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        T = x.shape[1]
        if text_padding_mask is not None and textual_tokens is not None:
            valid_text = ~text_padding_mask.astype(bool)
            if visual_images is not None:
                key_padding = jnp.concatenate(
                    [jnp.ones((x.shape[0], split_position), bool), valid_text], axis=1
                )
            else:
                key_padding = valid_text

        split_mask = split_mask_from_position(T, jnp.asarray(split_position))

        out = Encoder(tcfg, name="encoder")(
            x,
            key_padding_mask=key_padding,
            attn_bias=attn_bias,
            multiway_split_mask=split_mask,
            deterministic=deterministic,
        )
        return out, split_position


class Pooler(nn.Module):
    """cls-token pooler (beit3/modeling_utils.py Pooler): LN -> dense -> tanh."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        cls = nn.LayerNorm(epsilon=self.eps, name="norm")(x[:, 0])
        return jnp.tanh(nn.Dense(self.dim, name="dense")(cls))


class BEiT3ForImageClassification(nn.Module):
    """beit3/modeling_finetune.py:139-170: mean over patch tokens -> fc_norm
    -> head."""

    cfg: BEiT3Config

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        out, _ = BEiT3Model(self.cfg, name="beit3")(
            visual_images=images, deterministic=deterministic
        )
        x = jnp.mean(out[:, 1:], axis=1)
        x = nn.LayerNorm(epsilon=self.cfg.layernorm_eps, name="fc_norm")(x)
        return nn.Dense(self.cfg.num_classes, name="head")(x)


class BEiT3ForRetrieval(nn.Module):
    """beit3/modeling_finetune.py:242-275: separate vision/text towers
    (shared weights), cls features -> projection heads -> contrastive."""

    cfg: BEiT3Config

    def setup(self):
        self.beit3 = BEiT3Model(self.cfg)
        self.vision_head = nn.Dense(self.cfg.embed_dim, use_bias=False)
        self.language_head = nn.Dense(self.cfg.embed_dim, use_bias=False)

    def encode_image(self, images, deterministic=True):
        out, _ = self.beit3(visual_images=images, deterministic=deterministic)
        v = self.vision_head(out[:, 0])
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-6)

    def encode_text(self, tokens, padding_mask=None, deterministic=True):
        out, _ = self.beit3(
            textual_tokens=tokens, text_padding_mask=padding_mask,
            deterministic=deterministic,
        )
        t = self.language_head(out[:, 0])
        return t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-6)

    def __call__(self, images, tokens, padding_mask=None, deterministic=True):
        v = self.encode_image(images, deterministic)
        t = self.encode_text(tokens, padding_mask, deterministic)
        return v @ t.T  # similarity logits (caller scales by temperature)


def captioning_attn_bias(num_vision: int, num_text: int) -> jax.Array:
    """beit3 captioning uni-mask (modeling_finetune.py:171-241): vision
    attends vision; text attends vision + causally to text."""
    T = num_vision + num_text
    allow = jnp.zeros((T, T), bool)
    allow = allow.at[:, :num_vision].set(True)  # everyone sees vision
    tpos = jnp.arange(num_text)
    causal = tpos[:, None] >= tpos[None, :]
    allow = allow.at[num_vision:, num_vision:].set(causal)
    allow = allow.at[:num_vision, num_vision:].set(False)
    return jnp.where(allow, 0.0, NEG_INF)[None, None]


class BEiT3ForCaptioning(nn.Module):
    cfg: BEiT3Config

    @nn.compact
    def __call__(self, images, tokens, deterministic: bool = True):
        nv = self.cfg.num_vision_tokens
        bias = captioning_attn_bias(nv, tokens.shape[1])
        out, split = BEiT3Model(self.cfg, name="beit3")(
            textual_tokens=tokens, visual_images=images, attn_bias=bias,
            deterministic=deterministic,
        )
        text_out = out[:, nv:]
        return nn.Dense(self.cfg.vocab_size, dtype=self.cfg.dtype,
                        name="mlm_head")(text_out)


class BEiT3ForVisualQuestionAnswering(nn.Module):
    """beit3/modeling_finetune.py VQA: pooler over joint encoding -> 2-layer
    classifier head (VQAv2 3129 answers)."""

    cfg: BEiT3Config
    num_answers: int = 3129

    @nn.compact
    def __call__(self, images, tokens, padding_mask=None, deterministic=True):
        out, _ = BEiT3Model(self.cfg, name="beit3")(
            textual_tokens=tokens, visual_images=images,
            text_padding_mask=padding_mask, deterministic=deterministic,
        )
        pooled = Pooler(self.cfg.embed_dim, self.cfg.layernorm_eps, name="pooler")(out)
        h = nn.Dense(self.cfg.embed_dim * 2, name="head_dense")(pooled)
        h = nn.LayerNorm(epsilon=self.cfg.layernorm_eps, name="head_norm")(h)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(self.num_answers, name="head_out")(h)


class BEiT3ForVisualReasoning(nn.Module):
    """beit3 NLVR2: two images + one sentence -> joint cls features concat."""

    cfg: BEiT3Config

    @nn.compact
    def __call__(self, image_a, image_b, tokens, padding_mask=None,
                 deterministic=True):
        model = BEiT3Model(self.cfg, name="beit3")
        oa, _ = model(textual_tokens=tokens, visual_images=image_a,
                      text_padding_mask=padding_mask, deterministic=deterministic)
        ob, _ = model(textual_tokens=tokens, visual_images=image_b,
                      text_padding_mask=padding_mask, deterministic=deterministic)
        x = jnp.concatenate([oa[:, 0], ob[:, 0]], axis=-1)
        h = nn.Dense(self.cfg.embed_dim, name="head_dense")(x)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(2, name="head_out")(h)


def beit3_base(**kw) -> BEiT3Config:
    return BEiT3Config(**kw)


def beit3_large(**kw) -> BEiT3Config:
    return BEiT3Config(embed_dim=1024, num_layers=24, num_heads=16, ffn_dim=4096, **kw)
