"""ViT-FPN detection backbone (DiT / LayoutLMv3 detection).

Capability-equivalent of dit/object_detection/ditod/backbone.py:31-134
(VIT_Backbone + FPN feature pyramid) and ditod/beit.py windowed/dilated
variants: a BEiT/ViT backbone emitting multi-scale feature maps
(deconv x4 / deconv x2 / identity / maxpool from the final tokens) for a
detection head (the detectron2 RCNN head itself is out of scope; these are
the `out_features` the reference plugs into FPN)."""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.models.beit import BeitBackbone, BeitConfig


@dataclasses.dataclass(frozen=True)
class ViTDetBackboneConfig:
    beit: BeitConfig = BeitConfig(use_mean_pooling=False)
    out_channels: int = 256


class ViTFPNBackbone(nn.Module):
    """Returns a dict of NHWC pyramid features {p2 (4x), p3 (2x), p4 (1x),
    p5 (0.5x)} from the ViT token grid (ditod/backbone.py FPN ops)."""

    cfg: ViTDetBackboneConfig

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> Dict[str, jax.Array]:
        bcfg = self.cfg.beit
        tokens = BeitBackbone(bcfg, name="backbone")(images, deterministic=deterministic)
        g = bcfg.img_size // bcfg.patch_size
        B = tokens.shape[0]
        x = tokens[:, 1:].reshape(B, g, g, bcfg.embed_dim)  # drop cls

        C = self.cfg.out_channels
        # fpn1: 4x upsample (two stride-2 deconvs)
        f1 = nn.ConvTranspose(bcfg.embed_dim // 2, (2, 2), strides=(2, 2), name="fpn1_deconv1")(x)
        f1 = nn.GroupNorm(num_groups=min(32, bcfg.embed_dim // 2), name="fpn1_norm")(f1)
        f1 = jax.nn.gelu(f1)
        f1 = nn.ConvTranspose(bcfg.embed_dim // 4, (2, 2), strides=(2, 2), name="fpn1_deconv2")(f1)
        # fpn2: 2x upsample
        f2 = nn.ConvTranspose(bcfg.embed_dim // 2, (2, 2), strides=(2, 2), name="fpn2_deconv")(x)
        # fpn3: identity
        f3 = x
        # fpn4: 2x downsample
        f4 = nn.max_pool(x, (2, 2), strides=(2, 2))

        out = {}
        for name, f in (("p2", f1), ("p3", f2), ("p4", f3), ("p5", f4)):
            h = nn.Conv(C, (1, 1), name=f"{name}_lateral")(f)
            h = nn.Conv(C, (3, 3), padding="SAME", name=f"{name}_output")(h)
            out[name] = h
        return out
