"""Detectron2 Cascade/Mask R-CNN checkpoint converter (DiT / LayoutLMv3 detection).

Maps published DiT detection checkpoints (detectron2 GeneralizedRCNN state
dicts from dit/object_detection: build_vit_fpn_backbone + CascadeROIHeads,
cascade_dit_base.yaml) onto `unilm_tpu.models.rcnn.CascadeRCNN` params.

Key layout of the source (detectron2 .pth, under the "model" key):
  backbone.bottom_up.backbone.*       ditod/beit.py BEiT (blocks.i.attn.qkv
                                      packed + q_bias/v_bias, gamma_1/2,
                                      fpn1..fpn4 multi-scale adapters)
  backbone.fpn_lateral{2-5}/fpn_output{2-5}   detectron2 FPN
  proposal_generator.rpn_head.*       StandardRPNHead conv/objectness/deltas
  roi_heads.box_head.{k}.*            cascade FastRCNNConvFCHead fc1/fc2
  roi_heads.box_predictor.{k}.*       FastRCNNOutputLayers cls_score/bbox_pred
  roi_heads.mask_head.*               MaskRCNNConvUpsampleHead

Layout notes:
- torch ConvTranspose2d weight is [in, out, kh, kw] and computes a scatter
  (out[s*i+a] += in[i] * w[..., a]); flax nn.ConvTranspose correlates with an
  unflipped kernel over the zero-dilated input, so the torch kernel must be
  spatially FLIPPED in addition to the [kh, kw, in, out] transpose
  (verified against a scatter oracle in tests/test_rcnn.py).
- BatchNorm2d in fpn1 runs in eval mode at inference; running stats land in
  FrozenBN's mean/var params.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from unilm_tpu.convert.beit import _from_timm
from unilm_tpu.convert.common import conv2d_nhwc, dense, t2n
from unilm_tpu.models.rcnn import RCNNConfig


def _n(x) -> np.ndarray:
    return t2n(x) if hasattr(x, "detach") else np.asarray(x)


def conv_transpose_nhwc(sd: Mapping, prefix: str) -> Dict:
    """torch ConvTranspose2d [I, O, kh, kw] -> flax ConvTranspose
    [kh, kw, I, O], spatially flipped (see module docstring)."""
    w = _n(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1)[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(w)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _n(sd[f"{prefix}.bias"])
    return out


def frozen_bn(sd: Mapping, prefix: str) -> Dict:
    return {
        "scale": _n(sd[f"{prefix}.weight"]),
        "bias": _n(sd[f"{prefix}.bias"]),
        "mean": _n(sd[f"{prefix}.running_mean"]),
        "var": _n(sd[f"{prefix}.running_var"]),
    }


def fc_on_pooled(sd: Mapping, prefix: str, channels: int, res: int) -> Dict:
    """First FC after RoI pooling: torch flattens [R, C, res, res] in
    (c, h, w) order, our BoxHead flattens [R, res, res, C] in (h, w, c) —
    permute the input dimension accordingly."""
    w = _n(sd[f"{prefix}.weight"])  # [out, C*res*res]
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, res, res).transpose(0, 2, 3, 1)
    return {"kernel": np.ascontiguousarray(w.reshape(out_dim, -1).T),
            "bias": _n(sd[f"{prefix}.bias"])}


def convert_rcnn(sd: Mapping, cfg: RCNNConfig) -> Dict:
    """Returns flax params for CascadeRCNN from a detectron2 state dict
    (pass checkpoint["model"]; a full checkpoint dict is unwrapped)."""
    if "model" in sd and not any("." in k for k in list(sd)[:4]):
        sd = sd["model"]
    sd = dict(sd)

    # ---- ViT trunk: strip the d2 prefix and reuse the timm-format mapper
    vit_prefix = "backbone.bottom_up.backbone."
    vit_sd = {k[len(vit_prefix):]: v for k, v in sd.items()
              if k.startswith(vit_prefix) and not k[len(vit_prefix):].startswith("fpn")}
    backbone = _from_timm(vit_sd, cfg.beit)["backbone"]

    vit = {
        "backbone": backbone,
        "fpn1_deconv1": conv_transpose_nhwc(sd, f"{vit_prefix}fpn1.0"),
        "fpn1_bn": frozen_bn(sd, f"{vit_prefix}fpn1.1"),
        "fpn1_deconv2": conv_transpose_nhwc(sd, f"{vit_prefix}fpn1.3"),
        "fpn2_deconv": conv_transpose_nhwc(sd, f"{vit_prefix}fpn2.0"),
    }

    fpn = {}
    for lvl in range(2, 6):
        fpn[f"fpn_lateral{lvl}"] = conv2d_nhwc(sd, f"backbone.fpn_lateral{lvl}")
        fpn[f"fpn_output{lvl}"] = conv2d_nhwc(sd, f"backbone.fpn_output{lvl}")

    rpn = {
        "conv": conv2d_nhwc(sd, "proposal_generator.rpn_head.conv"),
        "objectness_logits": conv2d_nhwc(
            sd, "proposal_generator.rpn_head.objectness_logits"),
        "anchor_deltas": conv2d_nhwc(
            sd, "proposal_generator.rpn_head.anchor_deltas"),
    }

    params: Dict = {"vit": vit, "fpn": fpn, "rpn_head": rpn}

    n_stages = len(cfg.cascade_ious)
    for k in range(n_stages):
        # StandardROIHeads (non-cascade) has unindexed box_head/box_predictor
        bh = (f"roi_heads.box_head.{k}" if f"roi_heads.box_head.{k}.fc1.weight"
              in sd else "roi_heads.box_head")
        bp = (f"roi_heads.box_predictor.{k}"
              if f"roi_heads.box_predictor.{k}.cls_score.weight" in sd
              else "roi_heads.box_predictor")
        params[f"box_head_{k}"] = {
            "fc1": fc_on_pooled(sd, f"{bh}.fc1", cfg.fpn_channels,
                                cfg.pooler_resolution),
            "fc2": dense(sd, f"{bh}.fc2")}
        params[f"box_predictor_{k}"] = {
            "cls_score": dense(sd, f"{bp}.cls_score"),
            "bbox_pred": dense(sd, f"{bp}.bbox_pred"),
        }

    if cfg.mask_on and "roi_heads.mask_head.mask_fcn1.weight" in sd:
        mh = {"deconv": conv_transpose_nhwc(sd, "roi_heads.mask_head.deconv"),
              "predictor": conv2d_nhwc(sd, "roi_heads.mask_head.predictor")}
        for i in range(1, 5):
            mh[f"mask_fcn{i}"] = conv2d_nhwc(sd, f"roi_heads.mask_head.mask_fcn{i}")
        params["mask_head"] = mh
    return params
