"""Text retrieval / embedding models: E5 and SimLM equivalents.

Capability-equivalent of e5/ (MTEB/BEIR embedding eval) and simlm/src
(bi-encoder retrieval training): a BERT/RoBERTa-style encoder on the shared
core with mean / cls pooling, "query:"/"passage:" prefix convention (E5),
InfoNCE contrastive loss with in-batch negatives, and the SimLM-style
cross-encoder reranker head."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Encoder


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 512
    type_vocab_size: int = 2
    pooling: str = "mean"  # mean (E5) | cls (SimLM)
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


class BertStyleEncoder(nn.Module):
    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
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
        x = x + emb("token_type_embeddings", cfg.type_vocab_size)(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="emb_LayerNorm")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        return Encoder(cfg.transformer(), name="encoder")(
            x, key_padding_mask=attention_mask.astype(bool),
            deterministic=deterministic,
        )


class EmbeddingModel(nn.Module):
    """E5-style bi-encoder: pooled, L2-normalized sentence embeddings."""

    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        seq = BertStyleEncoder(cfg, name="encoder")(
            input_ids, attention_mask, deterministic=deterministic
        )
        if cfg.pooling == "cls":
            pooled = seq[:, 0]
        else:  # masked mean (e5 average_pool)
            m = attention_mask.astype(seq.dtype)[..., None]
            pooled = jnp.sum(seq * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        return pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True) + 1e-6)


def info_nce_loss(
    q_emb: jax.Array,  # [B, D] normalized query embeddings
    p_emb: jax.Array,  # [B*(1+neg), D] passages; row i's positive = i*(1+neg)
    temperature: float = 0.01,
    negatives_per_query: int = 0,
):
    """Contrastive loss with in-batch negatives (simlm/e5 training)."""
    logits = q_emb @ p_emb.T / temperature  # [B, B*(1+neg)]
    labels = jnp.arange(q_emb.shape[0]) * (1 + negatives_per_query)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    acc = jnp.mean(jnp.argmax(logits, -1) == labels)
    return loss, acc


class CrossEncoderReranker(nn.Module):
    """SimLM reranker: joint (query, passage) encoding -> cls -> score."""

    cfg: TextEncoderConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 deterministic=True):
        seq = BertStyleEncoder(self.cfg, name="encoder")(
            input_ids, attention_mask, token_type_ids, deterministic
        )
        return nn.Dense(1, name="score")(seq[:, 0])[..., 0]
