"""BEiT / BEiT-2 / DiT vision transformers.

Capability-equivalent of reference beit/modeling_finetune.py (VisionTransformer
with per-block or shared 2D relative position bias, LayerScale, stochastic
depth, mean-pool head; registry :378-420) and beit/modeling_pretrain.py
(VisionTransformerForMaskedImageModeling). DiT (dit/) is the same architecture
with RVL-CDIP presets (dit/classification/).

TPU-first: NHWC images, shared Encoder core, bias tables gathered once per
forward into [1, H, N+1, N+1] arrays consumed block-wise by the Pallas flash
kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.embedding import VisionEmbedding
from unilm_tpu.core.transformer import Encoder


def beit_relative_position_index(window_size: tuple[int, int]) -> np.ndarray:
    """Static [N+1, N+1] index into the (2h-1)(2w-1)+3 bias table.

    Mirrors beit/modeling_finetune.py:96-113: pairwise 2D offsets plus 3
    special entries for cls->token, token->cls, cls->cls."""
    h, w = window_size
    num_rel = (2 * h - 1) * (2 * w - 1)
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))  # 2,h,w
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)  # N, N, 2
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    n = h * w
    index = np.zeros((n + 1, n + 1), dtype=np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel
    index[0:, 0] = num_rel + 1
    index[0, 0] = num_rel + 2
    return index


class Beit2DRelativePositionBias(nn.Module):
    """Learned 2D bias table -> [1, heads, N+1, N+1] additive bias."""

    window_size: tuple[int, int]
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self) -> jax.Array:
        h, w = self.window_size
        num_entries = (2 * h - 1) * (2 * w - 1) + 3
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (num_entries, self.num_heads),
        )
        index = jnp.asarray(beit_relative_position_index(self.window_size))
        bias = jnp.take(table, index.reshape(-1), axis=0)
        n = h * w + 1
        bias = bias.reshape(n, n, self.num_heads).transpose(2, 0, 1)
        return bias[None].astype(self.dtype)


@dataclasses.dataclass(frozen=True)
class BeitConfig:
    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    use_abs_pos_emb: bool = False
    use_rel_pos_bias: bool = True  # per-block tables (fine-tuned checkpoints)
    use_shared_rel_pos_bias: bool = False  # one table for all blocks (pretrain)
    use_mean_pooling: bool = True
    init_values: float = 0.1  # LayerScale gamma init (0 = off)
    drop_path_rate: float = 0.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    layernorm_eps: float = 1e-6
    vocab_size: int = 8192  # visual-token codebook (pretraining head)
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    remat: bool = False  # fairseq --checkpoint-activations equivalent
    remat_policy: str = "full"  # 'dots' keeps matmul outputs

    @property
    def grid_size(self) -> tuple[int, int]:
        g = self.img_size // self.patch_size
        return (g, g)

    @property
    def num_patches(self) -> int:
        g = self.grid_size
        return g[0] * g[1]

    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            drop_path_rate=self.drop_path_rate,
            normalize_before=True,
            layernorm_eps=self.layernorm_eps,
            dtype=self.dtype,
            use_flash=self.use_flash,
            remat=self.remat,
            remat_policy=self.remat_policy,
        )


class BeitBackbone(nn.Module):
    """Patch embed + (abs pos) + encoder with 2D rel-pos bias. Returns tokens."""

    cfg: BeitConfig
    use_mask_token: bool = False
    # None = follow use_mean_pooling; False = no trailing encoder LN at all
    # (the ditod detection trunk taps intermediate blocks and has no final
    # norm, dit/object_detection/ditod/beit.py:440-520)
    final_norm: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        images: jax.Array,  # [B, H, W, C] NHWC
        bool_masked_pos: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_all_hiddens: bool = False,
    ):
        cfg = self.cfg
        tcfg = self.cfg.transformer()
        x = VisionEmbedding(
            img_size=cfg.img_size,
            patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim,
            use_cls_token=True,
            use_mask_token=self.use_mask_token,
            dtype=tcfg.dtype,
            name="embeddings",
        )(images, bool_masked_pos)
        if cfg.use_abs_pos_emb:
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (1, cfg.num_patches + 1, cfg.embed_dim),
            )
            x = x + pos.astype(x.dtype)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        attn_bias = None
        if cfg.use_shared_rel_pos_bias:
            attn_bias = Beit2DRelativePositionBias(
                cfg.grid_size, cfg.num_heads, tcfg.dtype, name="rel_pos_bias"
            )()
        elif cfg.use_rel_pos_bias:
            attn_bias = [
                Beit2DRelativePositionBias(
                    cfg.grid_size, cfg.num_heads, tcfg.dtype, name=f"rel_pos_bias_{i}"
                )()
                for i in range(cfg.num_layers)
            ]

        return Encoder(
            tcfg,
            final_layer_norm=(
                not cfg.use_mean_pooling
                if self.final_norm is None
                else self.final_norm
            ),
            name="encoder",
        )(
            x,
            attn_bias=attn_bias,
            layer_scale_init=cfg.init_values,
            deterministic=deterministic,
            return_all_hiddens=return_all_hiddens,
        )


class BeitForImageClassification(nn.Module):
    """beit/modeling_finetune.py VisionTransformer with classification head."""

    cfg: BeitConfig

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        x = BeitBackbone(cfg, name="backbone")(images, deterministic=deterministic)
        if cfg.use_mean_pooling:
            x = jnp.mean(x[:, 1:], axis=1)
            x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="fc_norm")(x)
        else:
            x = x[:, 0]
        return nn.Dense(
            cfg.num_classes,
            kernel_init=nn.initializers.truncated_normal(0.02),
            name="head",
        )(x)


class BeitForMaskedImageModeling(nn.Module):
    """beit/modeling_pretrain.py: predict visual-codebook ids at masked patches."""

    cfg: BeitConfig

    @nn.compact
    def __call__(
        self, images: jax.Array, bool_masked_pos: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        cfg = self.cfg
        x = BeitBackbone(cfg, use_mask_token=True, name="backbone")(
            images, bool_masked_pos, deterministic=deterministic
        )
        # dtype follows the model compute dtype: flax's default promotion would
        # otherwise run the [B,196,E]x[E,8192] head matmul in fp32 (~8x MXU
        # cost in bf16 training; measured 424 -> ~300 ms/step at B=256).
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, dtype=cfg.dtype, name="norm")(x)
        logits = nn.Dense(cfg.vocab_size, dtype=cfg.dtype, name="lm_head")(x[:, 1:])
        return logits


# --------------------------------------------------------------------------- #
# Architecture registry (beit/modeling_finetune.py:378-420, dit presets)
# --------------------------------------------------------------------------- #

def beit_base_patch16_224(**kw) -> BeitConfig:
    return BeitConfig(**kw)


def beit_base_patch16_384(**kw) -> BeitConfig:
    return BeitConfig(img_size=384, **kw)


def beit_large_patch16_224(**kw) -> BeitConfig:
    return BeitConfig(embed_dim=1024, num_layers=24, num_heads=16, ffn_dim=4096,
                      init_values=1e-5, **kw)


def beit_large_patch16_384(**kw) -> BeitConfig:
    return BeitConfig(img_size=384, embed_dim=1024, num_layers=24, num_heads=16,
                      ffn_dim=4096, init_values=1e-5, **kw)


def beit_large_patch16_512(**kw) -> BeitConfig:
    return BeitConfig(img_size=512, embed_dim=1024, num_layers=24, num_heads=16,
                      ffn_dim=4096, init_values=1e-5, **kw)


def dit_base_patch16_224(**kw) -> BeitConfig:
    """DiT document-image classifier (dit/classification, RVL-CDIP 16 classes)."""
    kw.setdefault("num_classes", 16)
    return BeitConfig(**kw)


def dit_large_patch16_224(**kw) -> BeitConfig:
    kw.setdefault("num_classes", 16)
    return BeitConfig(embed_dim=1024, num_layers=24, num_heads=16, ffn_dim=4096,
                      init_values=1e-5, **kw)
