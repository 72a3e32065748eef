"""MarkupLM: HTML/XPath-aware RoBERTa (document AI for web pages).

Capability-equivalent of markuplm/markuplmft (HF MarkupLMModel): per-depth
xpath tag/subscript unit embeddings summed, projected through an inner FFN
to the hidden size, added to word+position+type embeddings; standard post-LN
encoder on the shared core."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Encoder
from unilm_tpu.models.layoutlmv3 import create_position_ids


@dataclasses.dataclass(frozen=True)
class MarkupLMConfig:
    vocab_size: int = 50267
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 514
    pad_token_id: int = 1
    type_vocab_size: int = 2
    max_depth: int = 50
    max_xpath_tag_units: int = 256
    max_xpath_subs_units: int = 1024
    xpath_unit_hidden: int = 32
    tag_pad_id: int = 216
    subs_pad_id: int = 1001
    num_labels: int = 2
    layernorm_eps: float = 1e-5
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


class XPathEmbeddings(nn.Module):
    """Per-depth tag+subscript unit embeddings -> inner FFN -> hidden."""

    cfg: MarkupLMConfig

    @nn.compact
    def __call__(self, xpath_tags_seq, xpath_subs_seq, deterministic=True):
        cfg = self.cfg
        units = []
        for i in range(cfg.max_depth):
            tag = nn.Embed(cfg.max_xpath_tag_units, cfg.xpath_unit_hidden,
                           name=f"tag_emb_{i}")(xpath_tags_seq[..., i])
            sub = nn.Embed(cfg.max_xpath_subs_units, cfg.xpath_unit_hidden,
                           name=f"subs_emb_{i}")(xpath_subs_seq[..., i])
            units.append(tag + sub)
        x = jnp.concatenate(units, axis=-1)  # [B, L, depth*unit]
        x = nn.Dense(4 * cfg.hidden_size, name="xpath_unitseq2_inner")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        return nn.Dense(cfg.hidden_size, name="inner2emb")(x)


class MarkupLMModel(nn.Module):
    cfg: MarkupLMConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        xpath_tags_seq: Optional[jax.Array] = None,  # [B, L, depth]
        xpath_subs_seq: Optional[jax.Array] = None,
        attention_mask: Optional[jax.Array] = None,
        token_type_ids: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        B, L = input_ids.shape
        if xpath_tags_seq is None:
            xpath_tags_seq = jnp.full((B, L, cfg.max_depth), cfg.tag_pad_id, jnp.int32)
        if xpath_subs_seq is None:
            xpath_subs_seq = jnp.full((B, L, cfg.max_depth), cfg.subs_pad_id, jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, L), jnp.int32)
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)

        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        embedding_init=nn.initializers.normal(0.02),
                        name="word_embeddings")(input_ids)
        pos_ids = create_position_ids(input_ids, cfg.pad_token_id)
        pos = nn.Embed(cfg.max_positions, cfg.hidden_size,
                       embedding_init=nn.initializers.normal(0.02),
                       name="position_embeddings")(pos_ids)
        tt = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                      embedding_init=nn.initializers.normal(0.02),
                      name="token_type_embeddings")(token_type_ids)
        xp = XPathEmbeddings(cfg, name="xpath_embeddings")(
            xpath_tags_seq, xpath_subs_seq, deterministic
        )
        x = word + pos + tt + xp
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="emb_LayerNorm")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        return Encoder(cfg.transformer(), name="encoder")(
            x, key_padding_mask=attention_mask.astype(bool),
            deterministic=deterministic,
        )


class MarkupLMForTokenClassification(nn.Module):
    cfg: MarkupLMConfig

    @nn.compact
    def __call__(self, input_ids, xpath_tags_seq=None, xpath_subs_seq=None,
                 attention_mask=None, deterministic=True):
        seq = MarkupLMModel(self.cfg, name="markuplm")(
            input_ids, xpath_tags_seq, xpath_subs_seq, attention_mask,
            deterministic=deterministic,
        )
        seq = nn.Dropout(self.cfg.dropout)(seq, deterministic=deterministic)
        return nn.Dense(self.cfg.num_labels, name="classifier")(seq)


class MarkupLMForQuestionAnswering(nn.Module):
    cfg: MarkupLMConfig

    @nn.compact
    def __call__(self, input_ids, xpath_tags_seq=None, xpath_subs_seq=None,
                 attention_mask=None, deterministic=True):
        seq = MarkupLMModel(self.cfg, name="markuplm")(
            input_ids, xpath_tags_seq, xpath_subs_seq, attention_mask,
            deterministic=deterministic,
        )
        logits = nn.Dense(2, name="qa_outputs")(seq)
        return logits[..., 0], logits[..., 1]
