"""LayoutLM v1: BERT + additive 2D position embeddings (document AI).

Capability-equivalent of layoutlm / layoutlmft v1 (HF LayoutLMModel):
word + 1D position + x0/y0/x1/y1 corner + h/w embeddings all ADDED (v1;
v3 concatenates instead), post-LN BERT encoder on the shared core."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Encoder


@dataclasses.dataclass(frozen=True)
class LayoutLMConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 512
    max_2d_positions: int = 1024
    type_vocab_size: int = 2
    num_labels: int = 2
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


class LayoutLMModel(nn.Module):
    cfg: LayoutLMConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        bbox: jax.Array,  # [B, L, 4] 0..1000
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), jnp.int32)
        emb = lambda n, v: nn.Embed(
            v, cfg.hidden_size, embedding_init=nn.initializers.normal(0.02), name=n
        )
        x = emb("word_embeddings", cfg.vocab_size)(input_ids)
        x = x + emb("position_embeddings", cfg.max_positions)(
            jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        )
        x_emb = emb("x_position_embeddings", cfg.max_2d_positions)
        y_emb = emb("y_position_embeddings", cfg.max_2d_positions)
        x = x + x_emb(bbox[..., 0]) + y_emb(bbox[..., 1])
        x = x + x_emb(bbox[..., 2]) + y_emb(bbox[..., 3])
        x = x + emb("h_position_embeddings", cfg.max_2d_positions)(
            jnp.clip(bbox[..., 3] - bbox[..., 1], 0, cfg.max_2d_positions - 1)
        )
        x = x + emb("w_position_embeddings", cfg.max_2d_positions)(
            jnp.clip(bbox[..., 2] - bbox[..., 0], 0, cfg.max_2d_positions - 1)
        )
        x = x + emb("token_type_embeddings", cfg.type_vocab_size)(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="emb_LayerNorm")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        return Encoder(cfg.transformer(), name="encoder")(
            x, key_padding_mask=attention_mask.astype(bool),
            deterministic=deterministic,
        )


class LayoutLMForTokenClassification(nn.Module):
    cfg: LayoutLMConfig

    @nn.compact
    def __call__(self, input_ids, bbox, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        seq = LayoutLMModel(self.cfg, name="layoutlm")(
            input_ids, bbox, attention_mask, token_type_ids, deterministic
        )
        seq = nn.Dropout(self.cfg.dropout)(seq, deterministic=deterministic)
        return nn.Dense(self.cfg.num_labels, name="classifier")(seq)
