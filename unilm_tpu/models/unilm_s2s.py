"""UniLM-style masked seq2seq (s2s-ft / unilm-v1 / LayoutReader).

Capability-equivalent of s2s-ft/s2s_ft/modeling_decoding.py and unilm-v1:
one BERT-style transformer where the source segment attends bidirectionally
and the target segment attends source + causally within itself — i.e. a
prefix-LM. Fine-tuning uses the full-sequence mask; generation runs on the
shared Decoder core as non-causal prefill over the source followed by causal
cached decode (replacing s2s-ft's custom incremental beam,
modeling_decoding.py). LayoutReader (reading-order) is this model with
layout-augmented inputs."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Decoder
from unilm_tpu.ops.attention import NEG_INF


@dataclasses.dataclass(frozen=True)
class UniLMConfig:
    vocab_size: int = 28996
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 512
    type_vocab_size: int = 6  # unilm uses segment ids 4=src, 5=tgt
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


def seq2seq_attn_bias(src_len: int, tgt_len: int) -> jax.Array:
    """[1, 1, T, T] additive bias: src bidirectional, tgt sees src + causal
    self (the UniLM seq2seq mask)."""
    T = src_len + tgt_len
    allow = jnp.zeros((T, T), bool)
    allow = allow.at[:, :src_len].set(True)
    t = jnp.arange(tgt_len)
    allow = allow.at[src_len:, src_len:].set(t[:, None] >= t[None, :])
    allow = allow.at[:src_len, src_len:].set(False)
    return jnp.where(allow, 0.0, NEG_INF)[None, None]


class UniLMForSeq2Seq(nn.Module):
    cfg: UniLMConfig

    def setup(self):
        cfg = self.cfg
        self.word_embeddings = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.position_embeddings = nn.Embed(
            cfg.max_positions, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.token_type_embeddings = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02),
        )
        self.emb_LayerNorm = nn.LayerNorm(epsilon=cfg.layernorm_eps)
        self.decoder = Decoder(cfg.transformer())
        self.lm_dense = nn.Dense(cfg.hidden_size)
        self.lm_norm = nn.LayerNorm(epsilon=cfg.layernorm_eps)

    def _embed(self, tokens, token_type_ids, positions):
        x = self.word_embeddings(tokens)
        x = x + self.position_embeddings(positions)
        x = x + self.token_type_embeddings(token_type_ids)
        return self.emb_LayerNorm(x)

    def lm_head(self, x):
        """BERT-style transform + tied decoder (cls.predictions)."""
        x = jax.nn.gelu(self.lm_dense(x), approximate=False)
        x = self.lm_norm(x)
        return self.word_embeddings.attend(x)

    def __call__(self, tokens, token_type_ids, src_len: int,
                 deterministic: bool = True):
        """Training forward over [src ++ tgt] with the seq2seq mask."""
        T = tokens.shape[1]
        positions = jnp.arange(T)[None]
        x = self._embed(tokens, token_type_ids, jnp.broadcast_to(positions, tokens.shape))
        bias = seq2seq_attn_bias(src_len, T - src_len).astype(jnp.float32)
        x = self.decoder(x, attn_bias=bias, causal=False,
                         deterministic=deterministic)
        return self.lm_head(x)

    def prefill(self, src_tokens, token_type_ids, cache_size: int):
        """Bidirectional source encoding into the decode cache (prefix-LM)."""
        B, S = src_tokens.shape
        x = self._embed(
            src_tokens, token_type_ids,
            jnp.broadcast_to(jnp.arange(S)[None], (B, S)),
        )
        x = self.decoder(x, causal=False, mode="prefill", cache_size=cache_size)
        return self.lm_head(x)

    def decode_step(self, tokens, token_type_ids, position, cache_size: int):
        B, T = tokens.shape
        x = self._embed(tokens, token_type_ids, position)
        x = self.decoder(x, causal=True, mode="decode", cache_size=cache_size)
        return self.lm_head(x)
