"""WavLM: self-supervised speech encoder with gated relative position bias.

Capability-equivalent of wavlm/WavLM.py (and HF WavLMModel):
- 1D conv feature extractor over raw audio (group-norm first layer, GELU)
- feature projection LN+Linear
- grouped weight-normed conv positional embedding
- post-LN transformer whose attention adds a T5-bucketed relative bias,
  computed once at layer 0 and re-gated per layer by a sigmoid GRU-style
  gate from the query (gru_rel_pos)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.positional import relative_position_bucket
from unilm_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layernorm_eps: float = 1e-5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32


class FeatureExtractor(nn.Module):
    """Raw audio [B, samples] -> frames [B, T, C]."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, audio: jax.Array) -> jax.Array:
        x = audio[:, :, None]  # NWC
        for i, (dim, k, s) in enumerate(
            zip(self.cfg.conv_dim, self.cfg.conv_kernel, self.cfg.conv_stride)
        ):
            x = nn.Conv(dim, (k,), strides=(s,), padding="VALID", use_bias=False,
                        name=f"conv_{i}")(x)
            if i == 0:
                x = nn.GroupNorm(num_groups=dim, epsilon=self.cfg.layernorm_eps,
                                 name="group_norm")(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class ConvPositionalEmbedding(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.cfg.num_conv_pos_embeddings
        pos = nn.Conv(
            self.cfg.hidden_size, (k,), padding=[(k // 2, k // 2)],
            feature_group_count=self.cfg.num_conv_pos_embedding_groups,
            name="conv",
        )(x)
        if k % 2 == 0:
            pos = pos[:, :-1]
        return jax.nn.gelu(pos, approximate=False)


class GatedRelPosAttention(nn.Module):
    """WavLM attention: shared bucketed bias gated per layer by the query."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x, position_bias, key_padding_mask=None):
        cfg = self.cfg
        B, T, E = x.shape
        H = cfg.num_heads
        D = E // H
        q = nn.Dense(E, name="q_proj")(x).reshape(B, T, H, D)
        k = nn.Dense(E, name="k_proj")(x).reshape(B, T, H, D)
        v = nn.Dense(E, name="v_proj")(x).reshape(B, T, H, D)

        # gru_rel_pos gating from RAW hidden states split by heads
        # (HF WavLMAttention.forward steps 1-4)
        gated_hidden = x.reshape(B, T, H, D)
        gates = nn.Dense(8, name="gru_rel_pos_linear")(gated_hidden)
        gates = jax.nn.sigmoid(gates.reshape(B, T, H, 2, 4).sum(-1))  # [B,T,H,2]
        gate_a, gate_b = gates[..., 0], gates[..., 1]
        const = self.param("gru_rel_pos_const",
                           lambda rng, shape: jnp.ones(shape), (1, H, 1, 1))
        gate_a_1 = gate_a * (gate_b * const[0, :, 0, 0][None, None] - 1.0) + 2.0
        # [B,T,H] -> [B,H,T,1] applied over key dim
        gated_bias = gate_a_1.transpose(0, 2, 1)[..., None] * position_bias

        mask = None
        if key_padding_mask is not None:
            mask = key_padding_mask[:, None, None, :]
        out = dot_product_attention(q, k, v, bias=gated_bias, mask=mask)
        return nn.Dense(E, name="out_proj")(out.reshape(B, T, E))


class WavLMModel(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, audio: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        feats = FeatureExtractor(cfg, name="feature_extractor")(audio)
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="fp_layer_norm")(feats)
        x = nn.Dense(cfg.hidden_size, name="fp_projection")(x)
        x = x + ConvPositionalEmbedding(cfg, name="pos_conv_embed")(x)
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="encoder_layer_norm")(x)

        # shared bucketed relative bias computed once (layer 0 owns the table)
        T = x.shape[1]
        table = self.param(
            "rel_attn_embed", nn.initializers.normal(0.02),
            (cfg.num_buckets, cfg.num_heads),
        )
        rel = jnp.arange(T)[None, :] - jnp.arange(T)[:, None]  # mem - ctx? see note
        buckets = relative_position_bucket(
            rel, True, cfg.num_buckets, cfg.max_bucket_distance
        )
        position_bias = jnp.take(table, buckets, axis=0).transpose(2, 0, 1)[None]

        for i in range(cfg.num_layers):
            a = GatedRelPosAttention(cfg, name=f"attn_{i}")(x, position_bias)
            x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name=f"ln1_{i}")(x + a)
            h = nn.Dense(cfg.ffn_dim, name=f"fc1_{i}")(x)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.hidden_size, name=f"fc2_{i}")(h)
            x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name=f"ln2_{i}")(x + h)
        return x
