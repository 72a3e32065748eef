"""Semantic segmentation: UperNet head over a BEiT backbone.

Capability-equivalent of beit/semantic_segmentation (mmseg plugin: BEiT
backbone + UperNet decode head, ADE20K). The backbone emits 4 pyramid
levels from intermediate transformer blocks (mmcv_custom beit.py style:
deconv/identity/pool on blocks [3,5,7,11]); UperNet = PPM over the top
level + FPN fusion + classifier."""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.models.beit import BeitBackbone, BeitConfig


def _resize(x, hw):
    B, h, w, C = x.shape
    return jax.image.resize(x, (B, hw[0], hw[1], C), method="bilinear")


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                    use_bias=False)(x)
        x = nn.GroupNorm(num_groups=32 if self.features % 32 == 0 else 1)(x)
        return jax.nn.relu(x)


class PPM(nn.Module):
    """Pyramid pooling module (UperNet)."""

    features: int
    bins: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        outs = [x]
        for b in self.bins:
            b = min(b, H, W)  # small feature maps: clamp bin count
            ph, pw = max(H // b, 1), max(W // b, 1)
            pooled = nn.avg_pool(x, (ph, pw), strides=(ph, pw))
            pooled = ConvBNReLU(self.features, 1)(pooled)
            outs.append(_resize(pooled, (H, W)))
        return ConvBNReLU(self.features, 3)(jnp.concatenate(outs, axis=-1))


@dataclasses.dataclass(frozen=True)
class UperNetConfig:
    beit: BeitConfig = BeitConfig(use_mean_pooling=False)
    out_indices: Tuple[int, ...] = (3, 5, 7, 11)
    channels: int = 512
    num_classes: int = 150  # ADE20K
    aux_channels: int = 256
    aux_loss_weight: float = 0.4  # FCN aux head (UperNet configs)


class FCNAuxHead(nn.Module):
    """Auxiliary FCN head on an intermediate feature level (the reference
    UperNet configs attach it to backbone level 2 with weight 0.4)."""

    channels: int
    num_classes: int

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.channels, 3)(x)
        return nn.Conv(self.num_classes, (1, 1), name="classifier")(x)


class BeitForSemanticSegmentation(nn.Module):
    cfg: UperNetConfig

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        deterministic: bool = True,
        return_aux: bool = False,
    ):
        cfg = self.cfg
        bcfg = cfg.beit
        tokens, hiddens = BeitBackbone(bcfg, name="backbone")(
            images, deterministic=deterministic, return_all_hiddens=True
        )
        g = bcfg.img_size // bcfg.patch_size
        B = images.shape[0]

        def grid(h):
            return h[:, 1:].reshape(B, g, g, bcfg.embed_dim)

        feats = [grid(hiddens[i]) for i in cfg.out_indices]
        # multi-scale: 4x up / 2x up / identity / 2x down (mmcv_custom beit.py)
        feats[0] = nn.ConvTranspose(bcfg.embed_dim, (4, 4), strides=(4, 4),
                                    name="up4")(feats[0])
        feats[1] = nn.ConvTranspose(bcfg.embed_dim, (2, 2), strides=(2, 2),
                                    name="up2")(feats[1])
        feats[3] = nn.max_pool(feats[3], (2, 2), strides=(2, 2))

        C = cfg.channels
        laterals = [ConvBNReLU(C, 1)(f) for f in feats[:-1]]
        top = PPM(C, name="ppm")(feats[-1])
        laterals.append(top)
        # top-down FPN fusion
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _resize(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [ConvBNReLU(C, 3)(l) for l in laterals[:-1]] + [laterals[-1]]
        size = outs[0].shape[1:3]
        fused = jnp.concatenate([_resize(o, size) for o in outs], axis=-1)
        fused = ConvBNReLU(C, 3, name="fpn_bottleneck")(fused)
        logits = nn.Conv(cfg.num_classes, (1, 1), name="classifier")(fused)
        logits = _resize(logits, images.shape[1:3])
        if not return_aux:
            return logits
        aux = FCNAuxHead(cfg.aux_channels, cfg.num_classes, name="aux_head")(
            feats[2]
        )
        return logits, _resize(aux, images.shape[1:3])


def segmentation_loss(
    logits: jax.Array,          # [B, H, W, C]
    labels: jax.Array,          # [B, H, W] int; ignore_index skipped
    aux_logits=None,
    *,
    aux_weight: float = 0.4,
    ignore_index: int = 255,
):
    """Pixel CE (+ weighted aux CE), masked at ignore_index — the mmseg
    decode_head + FCN aux loss the reference configs use."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)

    def ce(lg):
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    loss = ce(logits)
    metrics = {"seg_loss": loss}
    if aux_logits is not None:
        aux = ce(aux_logits)
        metrics["aux_loss"] = aux
        loss = loss + aux_weight * aux
    return loss, metrics
