"""DeltaLM: encoder-decoder pretraining with an interleaved decoder.

Capability-equivalent of the reference's deltalm project
(deltalm/deltalm/models/deltalm.py:87-138 DeltaLMModel + DeltaLMDecoderLayer,
deltalm.py:379-415 base/large arches): a post-LN transformer encoder-decoder
whose DECODER layer interleaves two FFNs around the cross-attention —

    self-attn -> FFN_1 (fc3/fc4 + ffn_layer_norm)
              -> cross-attn -> FFN_2 (fc1/fc2 + final_layer_norm)

so a pretrained L-layer ENCODER (InfoXLM-initialized in the paper)
initializes both halves of an L/2-layer decoder: encoder layer 2k seeds
decoder layer k's [self-attn, FFN_1]; layer 2k+1 seeds [cross-attn, FFN_2]
(the upgrade_state_dict_for_deltalm key mapping, deltalm.py:38-84:
ffn_1.fc1->fc3, ffn_1.fc2->fc4, ffn_2->final ffn). That mapping is
`interleave_decoder_init` here.

Arch knobs follow deltalm_base (deltalm.py:379-399): post-LN
(normalize_before=False), learned positions, gelu, no embedding scale,
embedding LayerNorm, shared input/output embeddings.

Generation follows the framework-wide (prefill, step) closure protocol
(runtime/generate.py), same as models/translation.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.embedding import PositionalEmbedding, TextEmbedding
from unilm_tpu.core.layers import FeedForward, make_norm
from unilm_tpu.core.attention import MultiheadAttention
from unilm_tpu.core.transformer import Encoder


@dataclasses.dataclass(frozen=True)
class DeltaLMConfig:
    vocab_size: int = 64000
    embed_dim: int = 768
    enc_layers: int = 12
    dec_layers: int = 6
    num_heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 512
    dropout: float = 0.1
    pad_id: int = 1
    layernorm_embedding: bool = True  # base: True, large: False
    dtype: jnp.dtype = jnp.float32

    def tcfg(self, layers: int) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.embed_dim, num_heads=self.num_heads,
            ffn_dim=self.ffn_dim, num_layers=layers, dropout=self.dropout,
            activation="gelu", normalize_before=False,  # post-LN (base arch)
            dtype=self.dtype, use_flash=False,
        )


class DeltaLMDecoderLayer(nn.Module):
    """Interleaved decoder layer (deltalm.py:140-377 forward order)."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        encoder_out: jax.Array,
        *,
        encoder_padding_mask: Optional[jax.Array] = None,
        causal: bool = True,
        mode: str = "train",
        cache_size: int = 0,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg

        def block(name, fn):
            # post-LN residual block: x + fn(x), then LN (normalize_before
            #=False in both deltalm arches, deltalm.py:386,399)
            def run(h):
                residual = h
                if cfg.normalize_before:
                    h = make_norm(cfg, name)(h)
                h = fn(h)
                h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
                h = residual + h
                if not cfg.normalize_before:
                    h = make_norm(cfg, name)(h)
                return h
            return run

        x = block("self_attn_layer_norm", lambda h: MultiheadAttention(
            cfg, self_attention=True, name="self_attn")(
                h, causal=causal, mode=mode, cache_size=cache_size,
                deterministic=deterministic))(x)
        x = block("ffn_layer_norm", lambda h: FeedForward(cfg, name="ffn_1")(
            h, deterministic=deterministic))(x)
        x = block("encoder_attn_layer_norm", lambda h: MultiheadAttention(
            cfg, self_attention=False, name="encoder_attn")(
                h, key=encoder_out, key_padding_mask=encoder_padding_mask,
                mode=mode, deterministic=deterministic))(x)
        x = block("final_layer_norm", lambda h: FeedForward(cfg, name="ffn")(
            h, deterministic=deterministic))(x)
        return x


class DeltaLMDecoder(nn.Module):
    """Stack of interleaved layers (post-LN: no trailing LayerNorm)."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x, encoder_out, *, encoder_padding_mask=None,
                 causal=True, mode="train", cache_size=0, deterministic=True):
        for i in range(self.cfg.num_layers):
            x = DeltaLMDecoderLayer(self.cfg, name=f"layers_{i}")(
                x, encoder_out, encoder_padding_mask=encoder_padding_mask,
                causal=causal, mode=mode, cache_size=cache_size,
                deterministic=deterministic)
        return x


class DeltaLM(nn.Module):
    """Encoder-decoder with shared embeddings and tied output projection."""

    cfg: DeltaLMConfig

    def setup(self):
        cfg = self.cfg
        self.embed = TextEmbedding(cfg.vocab_size, cfg.embed_dim,
                                   dtype=cfg.dtype)
        self.enc_pos = PositionalEmbedding(cfg.max_positions, cfg.embed_dim,
                                           dtype=cfg.dtype)
        self.dec_pos = PositionalEmbedding(cfg.max_positions, cfg.embed_dim,
                                           dtype=cfg.dtype)
        if cfg.layernorm_embedding:
            self.enc_emb_ln = nn.LayerNorm(dtype=cfg.dtype, name="enc_emb_ln")
            self.dec_emb_ln = nn.LayerNorm(dtype=cfg.dtype, name="dec_emb_ln")
        self.encoder = Encoder(self.cfg.tcfg(cfg.enc_layers))
        self.decoder = DeltaLMDecoder(self.cfg.tcfg(cfg.dec_layers))

    def encode(self, src_tokens: jax.Array, deterministic: bool = True):
        cfg = self.cfg
        S = src_tokens.shape[1]
        # no_scale_embedding=True (deltalm.py:396): no sqrt(d) factor
        x = self.embed(src_tokens) + self.enc_pos(jnp.arange(S))
        if cfg.layernorm_embedding:
            x = self.enc_emb_ln(x)
        pad_mask = src_tokens != cfg.pad_id
        enc = self.encoder(x, key_padding_mask=pad_mask,
                           deterministic=deterministic)
        return enc, pad_mask

    def _decode(self, prev_tokens, enc, enc_mask, mode, cache_size,
                positions=None, deterministic=True):
        T = prev_tokens.shape[1]
        if positions is None:
            positions = jnp.arange(T)
        x = self.embed(prev_tokens) + self.dec_pos(positions)
        if self.cfg.layernorm_embedding:
            x = self.dec_emb_ln(x)
        out = self.decoder(x, enc, encoder_padding_mask=enc_mask, causal=True,
                           mode=mode, cache_size=cache_size,
                           deterministic=deterministic)
        return self.embed.attend(out)

    def __call__(self, src_tokens, prev_tgt_tokens, deterministic=True):
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


def make_generate_fns(model: DeltaLM, cache_size: int):
    """(prefill, step) closures for runtime.generate; aux = (enc, mask)."""

    def prefill(params, tokens, aux):
        logits, vars_ = model.apply(
            {"params": params}, tokens, aux, cache_size,
            method=model.prefill, mutable=["cache"])
        return logits, vars_["cache"]

    def step(params, tokens, cache, aux):
        pos = cache["decoder"]["layers_0"]["self_attn"]["cache_index"]
        logits, vars_ = model.apply(
            {"params": params, "cache": cache}, tokens, aux, cache_size,
            pos + jnp.arange(tokens.shape[1], dtype=jnp.int32),
            method=model.decode_step, mutable=["cache"])
        return logits, vars_["cache"]

    return prefill, step


def interleave_decoder_init(params: Dict, encoder_params: Dict) -> Dict:
    """Initialize DeltaLM from a pretrained L-layer encoder stack.

    The DeltaLM recipe (paper §3.2; upgrade_state_dict_for_deltalm key
    mapping, deltalm.py:38-84): the encoder copies all L layers; decoder
    layer k takes encoder layer 2k's self-attn + FFN (-> self_attn/ffn_1)
    and encoder layer 2k+1's self-attn + FFN (-> encoder_attn/ffn) along
    with their LayerNorms. `encoder_params` is an Encoder param tree with
    layers_{i} entries (e.g. the retrieval/MLM stack's encoder); returns a
    new DeltaLM param tree (embeddings left at their current values —
    callers copy vocab embeddings separately when shapes match).
    """
    import copy

    out = copy.deepcopy(params)
    n_enc = len([k for k in encoder_params if k.startswith("layers_")])
    for i in range(n_enc):
        if f"layers_{i}" in out["encoder"]:
            out["encoder"][f"layers_{i}"] = copy.deepcopy(
                encoder_params[f"layers_{i}"])
    n_dec = len([k for k in out["decoder"] if k.startswith("layers_")])
    for k in range(n_dec):
        lo = encoder_params.get(f"layers_{2 * k}")
        hi = encoder_params.get(f"layers_{2 * k + 1}")
        dst = out["decoder"][f"layers_{k}"]
        if lo is not None:
            dst["self_attn"] = copy.deepcopy(lo["self_attn"])
            dst["self_attn_layer_norm"] = copy.deepcopy(
                lo["self_attn_layer_norm"])
            dst["ffn_1"] = copy.deepcopy(lo["ffn"])
            dst["ffn_layer_norm"] = copy.deepcopy(lo["final_layer_norm"])
        if hi is not None:
            dst["encoder_attn"] = copy.deepcopy(hi["self_attn"])
            dst["encoder_attn_layer_norm"] = copy.deepcopy(
                hi["self_attn_layer_norm"])
            dst["ffn"] = copy.deepcopy(hi["ffn"])
            dst["final_layer_norm"] = copy.deepcopy(hi["final_layer_norm"])
    return out


def deltalm_base(**kw) -> DeltaLMConfig:
    """deltalm.py:379-399 base_architecture."""
    return DeltaLMConfig(**kw)


def deltalm_large(**kw) -> DeltaLMConfig:
    """deltalm.py:401-415 large_architecture."""
    kw.setdefault("embed_dim", 1024)
    kw.setdefault("ffn_dim", 4096)
    kw.setdefault("enc_layers", 24)
    kw.setdefault("dec_layers", 12)
    kw.setdefault("num_heads", 16)
    kw.setdefault("layernorm_embedding", False)
    return DeltaLMConfig(**kw)
