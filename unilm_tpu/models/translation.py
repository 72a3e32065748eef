"""XLM-T: multilingual NMT over the shared transformer core.

Capability-equivalent of the reference's xlmt project (xlmt/README.md — a
pointer to "Multilingual Translation with Extensible Multilingual Pretraining
and Finetuning" style many-to-many NMT built on fairseq's
TransformerEncoderDecoder): a standard encoder-decoder with

- language-token conditioning: the source sequence is prefixed with a
  src-lang token and the decoder is primed with the tgt-lang token as BOS
  (mBART/XLM-T convention), so one model serves all directions;
- shared source/target embeddings tied to the output projection
  (share_all_embeddings);
- label-smoothed CE training (runtime.criterions.label_smoothed_nll_loss)
  and beam decoding through runtime.generate.

Generation follows the framework-wide (prefill, step) closure protocol.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.embedding import PositionalEmbedding, TextEmbedding
from unilm_tpu.core.transformer import Decoder, Encoder


@dataclasses.dataclass(frozen=True)
class TranslationConfig:
    vocab_size: int = 64000  # includes the language tokens
    embed_dim: int = 512
    num_layers: int = 6
    dec_layers: Optional[int] = None
    num_heads: int = 8
    ffn_dim: int = 2048
    max_positions: int = 1024
    dropout: float = 0.1
    pad_id: int = 1
    dtype: jnp.dtype = jnp.float32

    def tcfg(self, layers: int) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            ffn_dim=self.ffn_dim, num_layers=layers, dropout=self.dropout,
            normalize_before=True, dtype=self.dtype, use_flash=False,
        )


def make_lang_tokens(langs: Sequence[str], base_vocab_size: int) -> Dict[str, int]:
    """Append __lang__ tokens after the base vocab (fairseq multilingual
    convention)."""
    return {lang: base_vocab_size + i for i, lang in enumerate(sorted(langs))}


class MultilingualTranslationModel(nn.Module):
    cfg: TranslationConfig

    def setup(self):
        cfg = self.cfg
        self.embed = TextEmbedding(cfg.vocab_size, cfg.embed_dim, dtype=cfg.dtype)
        self.enc_pos = PositionalEmbedding(cfg.max_positions, cfg.embed_dim,
                                           dtype=cfg.dtype)
        self.dec_pos = PositionalEmbedding(cfg.max_positions, cfg.embed_dim,
                                           dtype=cfg.dtype)
        self.encoder = Encoder(cfg.tcfg(cfg.num_layers))
        self.decoder = Decoder(cfg.tcfg(cfg.dec_layers or cfg.num_layers),
                               has_cross_attention=True)
        self.scale = cfg.embed_dim**0.5

    def encode(self, src_tokens: jax.Array, deterministic: bool = True):
        """src_tokens [B, S] (src-lang token first). Returns (enc, pad_mask)."""
        S = src_tokens.shape[1]
        x = self.embed(src_tokens) * self.scale + self.enc_pos(jnp.arange(S))
        pad_mask = src_tokens != self.cfg.pad_id  # True = valid
        enc = self.encoder(x, key_padding_mask=pad_mask, deterministic=deterministic)
        return enc, pad_mask

    def _decode(self, prev_tokens, enc, enc_mask, mode, cache_size,
                positions=None, deterministic=True):
        T = prev_tokens.shape[1]
        if positions is None:
            positions = jnp.arange(T)
        x = self.embed(prev_tokens) * self.scale + self.dec_pos(positions)
        out = self.decoder(
            x, enc, encoder_padding_mask=enc_mask, causal=True, mode=mode,
            cache_size=cache_size, deterministic=deterministic,
        )
        return self.embed.attend(out)

    def __call__(self, src_tokens, prev_tgt_tokens, deterministic: bool = True):
        """Training forward: prev_tgt_tokens starts with the tgt-lang token."""
        enc, mask = self.encode(src_tokens, deterministic)
        return self._decode(prev_tgt_tokens, enc, mask, "train", 0,
                            deterministic=deterministic)

    def prefill(self, prev_tokens, encoder_out, cache_size: int):
        enc, mask = encoder_out
        return self._decode(prev_tokens, enc, mask, "prefill", cache_size)

    def decode_step(self, prev_tokens, encoder_out, cache_size: int, position):
        enc, mask = encoder_out
        return self._decode(prev_tokens, enc, mask, "decode", cache_size,
                            positions=position)


def make_generate_fns(model: MultilingualTranslationModel, cache_size: int):
    """(prefill, step) closures for runtime.generate; aux = (enc, enc_mask)."""

    def prefill(params, tokens, aux):
        logits, vars_ = model.apply(
            {"params": params}, tokens, aux, cache_size,
            method=model.prefill, mutable=["cache"],
        )
        return logits, vars_["cache"]

    def step(params, tokens, cache, aux):
        pos = cache["decoder"]["layers_0"]["self_attn"]["cache_index"]
        logits, vars_ = model.apply(
            {"params": params, "cache": cache}, tokens, aux, cache_size,
            pos + jnp.arange(tokens.shape[1], dtype=jnp.int32),
            method=model.decode_step, mutable=["cache"],
        )
        return logits, vars_["cache"]

    return prefill, step


def xlmt_base(**kw) -> TranslationConfig:
    return TranslationConfig(**kw)


def xlmt_big(**kw) -> TranslationConfig:
    kw.setdefault("embed_dim", 1024)
    kw.setdefault("num_heads", 16)
    kw.setdefault("ffn_dim", 4096)
    return TranslationConfig(**kw)
