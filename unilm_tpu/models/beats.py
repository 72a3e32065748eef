"""BEATs: audio pre-training with acoustic tokenizers.

Capability-equivalent of beats/{BEATs,Tokenizers}.py: mel-spectrogram
patchify (16x16 conv over [frames, mel_bins]), post-LN transformer with
(WavLM-style) gated relative position bias, classifier head; the tokenizer
variant quantizes encoder outputs with the l2-EMA codebook shared with
BEiT-2 (norm_ema_quantizer)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Encoder
from unilm_tpu.models.beit2 import NormEMAVectorQuantizer


@dataclasses.dataclass(frozen=True)
class BEATsConfig:
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    patch_size: int = 16
    mel_bins: int = 128
    deepnorm: bool = False
    num_classes: int = 527  # AudioSet
    codebook_size: int = 1024
    codebook_dim: int = 256
    layernorm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.embed_dim, ffn_dim=self.ffn_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            normalize_before=False, deepnorm=self.deepnorm,
            rel_pos_buckets=320, max_rel_pos=800,
            layernorm_eps=self.layernorm_eps, dtype=self.dtype,
            use_flash=self.use_flash,
        )


class BEATsEncoder(nn.Module):
    """[B, frames, mel_bins] spectrogram -> token representations."""

    cfg: BEATsConfig

    @nn.compact
    def __call__(self, spectrogram: jax.Array, deterministic: bool = True):
        cfg = self.cfg
        p = cfg.patch_size
        x = spectrogram[..., None]  # [B, F, M, 1]
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    name="patch_embedding")(x)
        B, f, m, E = x.shape
        x = x.reshape(B, f * m, E)
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="layer_norm")(x)
        return Encoder(cfg.transformer(), name="encoder")(
            x, deterministic=deterministic
        )


class BEATsForAudioClassification(nn.Module):
    cfg: BEATsConfig

    @nn.compact
    def __call__(self, spectrogram, deterministic: bool = True):
        x = BEATsEncoder(self.cfg, name="beats")(spectrogram, deterministic)
        pooled = jnp.mean(x, axis=1)
        return nn.Dense(self.cfg.num_classes, name="classifier")(pooled)


class BEATsTokenizer(nn.Module):
    """Acoustic tokenizer (beats/Tokenizers.py): encoder -> project ->
    l2-EMA vector quantizer -> discrete audio token ids."""

    cfg: BEATsConfig

    def setup(self):
        self.encoder = BEATsEncoder(self.cfg)
        self.quantize_proj = nn.Dense(self.cfg.codebook_dim)
        self.quantize = NormEMAVectorQuantizer(
            num_tokens=self.cfg.codebook_size, codebook_dim=self.cfg.codebook_dim
        )

    def __call__(self, spectrogram, update_ema: bool = False):
        x = self.encoder(spectrogram)
        z = self.quantize_proj(x)
        return self.quantize(z, update_ema=update_ema)

    def get_codebook_indices(self, spectrogram):
        _, _, idx = self(spectrogram)
        return idx
