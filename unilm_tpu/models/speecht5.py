"""SpeechT5: unified-modal encoder-decoder for speech/text tasks.

Capability-equivalent of speecht5/speecht5/{models,tasks}: one shared
encoder-decoder transformer with modality-specific pre/post-nets —
speech-encoder prenet (conv feature extractor + conv positions), text
prenet (embedding), speech-decoder prenet (mel frames -> dense + speaker
embedding), speech-decoder postnet (mel regression + stop logits + conv
refinement), text postnet (LM head). Covers ASR (speech->text with the
generation engine) and TTS (text->mel autoregressive) task wiring."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Decoder, Encoder
from unilm_tpu.models.wavlm import ConvPositionalEmbedding, FeatureExtractor, WavLMConfig


@dataclasses.dataclass(frozen=True)
class SpeechT5Config:
    vocab_size: int = 10000
    hidden_size: int = 768
    enc_layers: int = 12
    dec_layers: int = 6
    num_heads: int = 12
    ffn_dim: int = 3072
    mel_bins: int = 80
    reduction_factor: int = 2  # mel frames predicted per decoder step
    speaker_dim: int = 0  # x-vector dim (0 = off)
    max_positions: int = 1024
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    layernorm_eps: float = 1e-5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    def enc_cfg(self):
        return TransformerConfig(
            embed_dim=self.hidden_size, ffn_dim=self.ffn_dim,
            num_layers=self.enc_layers, num_heads=self.num_heads,
            normalize_before=True, layernorm_eps=self.layernorm_eps,
            dropout=self.dropout, dtype=self.dtype, use_flash=self.use_flash,
        )

    def dec_cfg(self):
        return TransformerConfig(
            embed_dim=self.hidden_size, ffn_dim=self.ffn_dim,
            num_layers=self.dec_layers, num_heads=self.num_heads,
            normalize_before=True, is_encoder_decoder=True,
            layernorm_eps=self.layernorm_eps, dropout=self.dropout,
            dtype=self.dtype, use_flash=self.use_flash,
        )

    def wavlm_cfg(self):
        return WavLMConfig(
            hidden_size=self.hidden_size, conv_dim=self.conv_dim,
            conv_stride=self.conv_stride, conv_kernel=self.conv_kernel,
            layernorm_eps=self.layernorm_eps,
        )


class SpeechEncoderPrenet(nn.Module):
    """Raw audio -> frame features + conv positions (speech_encoder_prenet)."""

    cfg: SpeechT5Config

    @nn.compact
    def __call__(self, audio: jax.Array) -> jax.Array:
        wcfg = self.cfg.wavlm_cfg()
        feats = FeatureExtractor(wcfg, name="feature_extractor")(audio)
        x = nn.LayerNorm(epsilon=self.cfg.layernorm_eps, name="fp_norm")(feats)
        x = nn.Dense(self.cfg.hidden_size, name="fp_proj")(x)
        return x + ConvPositionalEmbedding(wcfg, name="pos_conv")(x)


class SpeechDecoderPrenet(nn.Module):
    """Mel frames -> hidden (2 ReLU denses + proj) + speaker conditioning."""

    cfg: SpeechT5Config

    @nn.compact
    def __call__(self, mels: jax.Array, speaker: Optional[jax.Array] = None):
        h = jax.nn.relu(nn.Dense(256, name="fc1")(mels))
        h = jax.nn.relu(nn.Dense(256, name="fc2")(h))
        h = nn.Dense(self.cfg.hidden_size, name="proj")(h)
        if self.cfg.speaker_dim and speaker is not None:
            s = speaker / (jnp.linalg.norm(speaker, axis=-1, keepdims=True) + 1e-6)
            h = jnp.concatenate(
                [h, jnp.broadcast_to(s[:, None], h.shape[:2] + (s.shape[-1],))], -1
            )
            h = jax.nn.relu(nn.Dense(self.cfg.hidden_size, name="spk_proj")(h))
        return h


class SpeechDecoderPostnet(nn.Module):
    """hidden -> (mel_before, mel_after, stop_logits): linear mel head,
    stop head, 5-layer conv refinement (tacotron-style postnet)."""

    cfg: SpeechT5Config

    @nn.compact
    def __call__(self, h: jax.Array):
        cfg = self.cfg
        out_dim = cfg.mel_bins * cfg.reduction_factor
        mel = nn.Dense(out_dim, name="feat_out")(h)
        stop = nn.Dense(cfg.reduction_factor, name="prob_out")(h)
        B, T, _ = mel.shape
        frames = mel.reshape(B, T * cfg.reduction_factor, cfg.mel_bins)
        x = frames
        for i in range(4):
            x = nn.Conv(256, (5,), padding="SAME", name=f"conv_{i}")(x)
            x = jnp.tanh(nn.LayerNorm(name=f"cn_{i}")(x))
        x = nn.Conv(cfg.mel_bins, (5,), padding="SAME", name="conv_out")(x)
        return frames, frames + x, stop.reshape(B, T * cfg.reduction_factor)


class SpeechT5Model(nn.Module):
    """Shared encoder-decoder; task methods for ASR and TTS."""

    cfg: SpeechT5Config

    def setup(self):
        cfg = self.cfg
        self.speech_prenet = SpeechEncoderPrenet(cfg)
        self.text_embed = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(cfg.hidden_size**-0.5),
        )
        self.pos_table = self.param(
            "dec_pos", nn.initializers.normal(0.02),
            (cfg.max_positions, cfg.hidden_size),
        )
        self.encoder = Encoder(cfg.enc_cfg())
        self.decoder = Decoder(cfg.dec_cfg(), has_cross_attention=True)
        self.speech_dec_prenet = SpeechDecoderPrenet(cfg)
        self.speech_postnet = SpeechDecoderPostnet(cfg)

    def encode_speech(self, audio, deterministic=True):
        x = self.speech_prenet(audio)
        return self.encoder(x, deterministic=deterministic)

    def encode_text(self, tokens, deterministic=True):
        x = self.text_embed(tokens) + self.pos_table[None, : tokens.shape[1]]
        return self.encoder(x, deterministic=deterministic)

    def asr_forward(self, audio, prev_tokens, deterministic=True):
        """speech -> text logits (teacher forcing)."""
        enc = self.encode_speech(audio, deterministic)
        y = self.text_embed(prev_tokens) + self.pos_table[None, : prev_tokens.shape[1]]
        h = self.decoder(y, enc, deterministic=deterministic)
        return self.text_embed.attend(h)

    def tts_forward(self, tokens, prev_mels, speaker=None, deterministic=True):
        """text -> (mel_before, mel_after, stop) (teacher forcing).
        prev_mels [B, Tdec, mel_bins*reduction] shifted frames."""
        enc = self.encode_text(tokens, deterministic)
        y = self.speech_dec_prenet(prev_mels, speaker)
        y = y + self.pos_table[None, : y.shape[1]]
        h = self.decoder(y, enc, deterministic=deterministic)
        return self.speech_postnet(h)

    def __call__(self, audio, prev_tokens, deterministic=True):
        return self.asr_forward(audio, prev_tokens, deterministic)
