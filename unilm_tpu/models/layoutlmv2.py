"""LayoutLMv2/LayoutXLM: text + layout + CNN visual features.

Capability-equivalent of layoutlmft/models/layoutlmv2/modeling_layoutlmv2.py:
- text embeddings: word + 1D pos + CONCATENATED x/y/h/w spatial (the v2
  change from v1's additive scheme) + token type
- visual stream: CNN backbone (the reference uses detectron2 ResNeXt-FPN;
  here a compact conv pyramid with the same contract: a pooled HxW grid of
  visual features projected to hidden), grid-cell bboxes, visual pos/segment
- 1D + 2D bucketed relative attention bias shared with v3
- relation-extraction head (layoutlmft/modules/decoders/re.py): biaffine
  entity-pair classifier."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.positional import relative_position_bucket
from unilm_tpu.core.transformer import Encoder
from unilm_tpu.models.layoutlmv3 import SpatialEmbedding, create_position_ids


@dataclasses.dataclass(frozen=True)
class LayoutLMv2Config:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 512
    pad_token_id: int = 0
    type_vocab_size: int = 2
    coordinate_size: int = 128
    shape_size: int = 128
    max_2d_positions: int = 1024
    image_feature_pool_shape: Tuple[int, int] = (7, 7)
    rel_pos_bins: int = 32
    max_rel_pos: int = 128
    rel_2d_pos_bins: int = 64
    max_rel_2d_pos: int = 256
    has_relative_attention_bias: bool = True
    has_spatial_attention_bias: bool = True
    num_labels: int = 2
    backbone_channels: Tuple[int, ...] = (64, 128, 256)
    layernorm_eps: float = 1e-12
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.hidden_size, ffn_dim=self.ffn_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            normalize_before=False, layernorm_eps=self.layernorm_eps,
            dropout=self.dropout, dtype=self.dtype, use_flash=self.use_flash,
        )

    @property
    def visual_len(self) -> int:
        return self.image_feature_pool_shape[0] * self.image_feature_pool_shape[1]


class ConvBackbone(nn.Module):
    """Compact stand-in for the detectron2 ResNeXt-FPN visual backbone:
    strided conv pyramid + adaptive pool to the feature grid."""

    cfg: LayoutLMv2Config

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        x = images
        for i, ch in enumerate(self.cfg.backbone_channels):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=min(32, ch), name=f"gn_{i}")(x)
            x = jax.nn.relu(x)
        gh, gw = self.cfg.image_feature_pool_shape
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, gh, gw, C), method="bilinear")
        return x.reshape(B, gh * gw, C)


def visual_grid_bbox(grid: Tuple[int, int], max_len: int = 1000) -> np.ndarray:
    gy, gx = grid
    xs = (np.arange(gx + 1) * max_len) // gx
    ys = (np.arange(gy + 1) * max_len) // gy
    boxes = np.stack(
        [
            np.tile(xs[:-1], gy), np.repeat(ys[:-1], gx),
            np.tile(xs[1:], gy), np.repeat(ys[1:], gx),
        ],
        axis=-1,
    )
    return boxes.astype(np.int64)


class LayoutLMv2Model(nn.Module):
    cfg: LayoutLMv2Config

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        bbox: jax.Array,
        attention_mask: Optional[jax.Array] = None,
        images: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), jnp.int32)

        emb = lambda n, v, d: nn.Embed(
            v, d, embedding_init=nn.initializers.normal(0.02), name=n
        )
        word = emb("word_embeddings", cfg.vocab_size, cfg.hidden_size)(input_ids)
        pos_ids = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        pos_table = emb("position_embeddings", cfg.max_positions, cfg.hidden_size)
        spatial = SpatialEmbedding(cfg, name="spatial")
        x = word + pos_table(pos_ids) + spatial(bbox)
        x = x + emb("token_type_embeddings", cfg.type_vocab_size, cfg.hidden_size)(
            token_type_ids
        )
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="emb_LayerNorm")(x)

        full_bbox = bbox
        position_ids = pos_ids
        key_padding = attention_mask.astype(bool)

        if images is not None:
            vfeat = ConvBackbone(cfg, name="visual")(images)
            v = nn.Dense(cfg.hidden_size, name="visual_proj")(vfeat)
            V = cfg.visual_len
            vbox = jnp.asarray(visual_grid_bbox(cfg.image_feature_pool_shape))
            vpos = jnp.broadcast_to(jnp.arange(V)[None], (B, V))
            v = v + pos_table(vpos) + spatial(jnp.broadcast_to(vbox[None], (B, V, 4)))
            v = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="visual_LayerNorm")(v)
            x = jnp.concatenate([x, v], axis=1)
            full_bbox = jnp.concatenate(
                [bbox, jnp.broadcast_to(vbox[None], (B, V, 4))], axis=1
            )
            position_ids = jnp.concatenate([pos_ids, vpos], axis=1)
            key_padding = jnp.concatenate(
                [key_padding, jnp.ones((B, V), bool)], axis=1
            )

        bias = None
        if cfg.has_relative_attention_bias:
            t1 = self.param("rel_pos_bias", nn.initializers.normal(0.02),
                            (cfg.rel_pos_bins, cfg.num_heads))
            rel = position_ids[:, None, :] - position_ids[:, :, None]
            b1 = relative_position_bucket(rel, True, cfg.rel_pos_bins, cfg.max_rel_pos)
            bias = jnp.take(t1, b1, axis=0).transpose(0, 3, 1, 2)
        if cfg.has_spatial_attention_bias:
            tx = self.param("rel_pos_x_bias", nn.initializers.normal(0.02),
                            (cfg.rel_2d_pos_bins, cfg.num_heads))
            ty = self.param("rel_pos_y_bias", nn.initializers.normal(0.02),
                            (cfg.rel_2d_pos_bins, cfg.num_heads))
            cx = full_bbox[..., 0]
            cy = full_bbox[..., 3]
            bx = relative_position_bucket(cx[:, None, :] - cx[:, :, None], True,
                                          cfg.rel_2d_pos_bins, cfg.max_rel_2d_pos)
            by = relative_position_bucket(cy[:, None, :] - cy[:, :, None], True,
                                          cfg.rel_2d_pos_bins, cfg.max_rel_2d_pos)
            b2 = (jnp.take(tx, bx, axis=0) + jnp.take(ty, by, axis=0)).transpose(0, 3, 1, 2)
            bias = b2 if bias is None else bias + b2
        if bias is not None:
            bias = bias / float(cfg.hidden_size // cfg.num_heads) ** 0.5

        return Encoder(cfg.transformer(), name="encoder")(
            x, key_padding_mask=key_padding, attn_bias=bias,
            deterministic=deterministic,
        )


class LayoutLMv2ForTokenClassification(nn.Module):
    cfg: LayoutLMv2Config

    @nn.compact
    def __call__(self, input_ids, bbox, attention_mask=None, images=None,
                 deterministic=True):
        seq = LayoutLMv2Model(self.cfg, name="layoutlmv2")(
            input_ids, bbox, attention_mask, images, deterministic=deterministic
        )
        text = seq[:, : input_ids.shape[1]]
        text = nn.Dropout(self.cfg.dropout)(text, deterministic=deterministic)
        return nn.Dense(self.cfg.num_labels, name="classifier")(text)


class RelationExtractionHead(nn.Module):
    """layoutlmft/modules/decoders/re.py: biaffine classifier over candidate
    (head, tail) entity pairs built from entity-span representations."""

    hidden_size: int
    num_relations: int = 2

    @nn.compact
    def __call__(self, seq: jax.Array, head_idx: jax.Array, tail_idx: jax.Array):
        """seq [B, T, E]; head/tail_idx [B, P] token indices of entity starts.
        Returns [B, P, num_relations]."""
        gather = lambda idx: jnp.take_along_axis(
            seq, idx[..., None], axis=1
        )
        h = gather(head_idx)
        t = gather(tail_idx)
        h = jax.nn.gelu(nn.Dense(self.hidden_size // 2, name="ffn_head")(h))
        t = jax.nn.gelu(nn.Dense(self.hidden_size // 2, name="ffn_tail")(t))
        # biaffine: h W t^T per relation
        W = self.param(
            "biaffine", nn.initializers.normal(0.02),
            (self.num_relations, self.hidden_size // 2 + 1, self.hidden_size // 2 + 1),
        )
        ones = jnp.ones(h.shape[:-1] + (1,), h.dtype)
        h1 = jnp.concatenate([h, ones], -1)
        t1 = jnp.concatenate([t, ones], -1)
        return jnp.einsum("bpi,rij,bpj->bpr", h1, W, t1)
