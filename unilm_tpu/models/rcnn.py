"""Cascade/Mask R-CNN detection over the ViT+FPN backbone (DiT / LayoutLMv3).

Reference: dit/object_detection/ditod/backbone.py:31,134 (VIT_Backbone + FPN
into detectron2 GeneralizedRCNN), publaynet_configs/Base-RCNN-FPN.yaml +
cascade/cascade_dit_base.yaml (CascadeROIHeads, cls-agnostic box reg,
MASK_ON), ditod/beit.py:440-520 (fpn1-4 multi-scale adapters on intermediate
blocks), ditod/mytrainer.py:329. Published DiT/LayoutLMv3 detection
checkpoints load through convert/detection.py into this module.

TPU-first re-design, not a detectron2 port:
- static shapes end-to-end: fixed pre/post-NMS proposal counts (padded with
  dead boxes), NMS as a fori_loop over a precomputed IoU matrix, multi-level
  RoIAlign evaluated per level and blended by the level-assignment mask
  (4x dense compute instead of data-dependent gathers — MXU-friendly)
- per-image functions vmapped over the batch; no Instances/Boxes objects,
  plain [R, 4] xyxy arrays in image coordinates
- RoIAlign follows torchvision semantics (aligned=True, fixed
  sampling_ratio) so converted checkpoints see the features they trained on

The single-stage FCOS head (models/detection_head.py) remains the TPU-first
alternative; this module exists for reference-checkpoint parity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.models.beit import BeitBackbone, BeitConfig


# --------------------------------------------------------------------------- #
# Box utilities
# --------------------------------------------------------------------------- #

_DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


def apply_deltas(deltas: jax.Array, boxes: jax.Array,
                 weights: Tuple[float, float, float, float]) -> jax.Array:
    """detectron2 Box2BoxTransform.apply_deltas: (dx,dy,dw,dh) on xyxy."""
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    dx, dy = deltas[..., 0] / wx, deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, max=_DEFAULT_SCALE_CLAMP)
    dh = jnp.clip(deltas[..., 3] / wh, max=_DEFAULT_SCALE_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                      pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1)


def get_deltas(src: jax.Array, target: jax.Array,
               weights: Tuple[float, float, float, float]) -> jax.Array:
    """Inverse of apply_deltas (regression targets)."""
    wx, wy, ww, wh = weights
    sw = jnp.maximum(src[..., 2] - src[..., 0], 1e-4)
    sh = jnp.maximum(src[..., 3] - src[..., 1], 1e-4)
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = jnp.maximum(target[..., 2] - target[..., 0], 1e-4)
    th = jnp.maximum(target[..., 3] - target[..., 1], 1e-4)
    tcx = target[..., 0] + 0.5 * tw
    tcy = target[..., 1] + 0.5 * th
    return jnp.stack([
        wx * (tcx - scx) / sw, wy * (tcy - scy) / sh,
        ww * jnp.log(tw / sw), wh * jnp.log(th / sh)], axis=-1)


def clip_boxes(boxes: jax.Array, size: Tuple[int, int]) -> jax.Array:
    h, w = size
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h)], axis=-1)


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N, 4] x [M, 4] -> [N, M] IoU."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def nms_keep(boxes: jax.Array, scores: jax.Array, iou_thresh: float,
             idx_cat: Optional[jax.Array] = None) -> jax.Array:
    """Static-shape NMS: returns a bool keep mask over candidates sorted
    descending by caller. `idx_cat` (batched NMS) suppresses only within the
    same category (detectron2 batched_nms; the CUDA kernel becomes a
    fori_loop over a precomputed IoU matrix)."""
    N = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    iou = box_iou(b, b)
    if idx_cat is not None:
        c = idx_cat[order]
        iou = jnp.where(c[:, None] == c[None, :], iou, 0.0)
    sup = iou > iou_thresh

    def body(j, keep):
        # candidate j survives iff not suppressed by a kept higher-score box
        alive = ~jnp.any(jnp.where(jnp.arange(N) < j, sup[:, j] & keep, False))
        return keep.at[j].set(alive & keep[j])

    keep0 = scores[order] > -jnp.inf
    keep = jax.lax.fori_loop(0, N, body, keep0)
    inv = jnp.zeros(N, jnp.int32).at[order].set(jnp.arange(N))
    return keep[inv]


# --------------------------------------------------------------------------- #
# RoIAlign (torchvision semantics: aligned=True, fixed sampling ratio)
# --------------------------------------------------------------------------- #


def roi_align(feat: jax.Array, boxes: jax.Array, stride: int,
              out_size: int, sampling_ratio: int = 2,
              aligned: bool = True) -> jax.Array:
    """feat [H, W, C]; boxes [R, 4] xyxy image coords -> [R, out, out, C].

    Bilinear sampling on a sampling_ratio^2 grid per bin, averaged
    (torchvision.ops.roi_align; detectron2 ROIAlign(aligned=True))."""
    H, W, C = feat.shape
    R = boxes.shape[0]
    S = sampling_ratio
    off = 0.5 if aligned else 0.0
    scale = 1.0 / stride
    x1 = boxes[:, 0] * scale - off
    y1 = boxes[:, 1] * scale - off
    w = jnp.maximum(boxes[:, 2] * scale - off - x1, 1e-6 if aligned else 1.0)
    h = jnp.maximum(boxes[:, 3] * scale - off - y1, 1e-6 if aligned else 1.0)
    bin_w = w / out_size
    bin_h = h / out_size
    ii = jnp.arange(out_size, dtype=jnp.float32)
    ss = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    # sample coords: [R, out, S]
    ys = y1[:, None, None] + (ii[None, :, None] + ss[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (ii[None, :, None] + ss[None, None, :]) * bin_w[:, None, None]

    def interp(y, x):
        """Bilinear at (y, x) grids: y [R, out, S], x [R, out, S] ->
        [R, out, S, out, S, C]."""
        oob_y = (y < -1.0) | (y > H)
        oob_x = (x < -1.0) | (x > W)
        y = jnp.clip(y, 0.0, H - 1)
        x = jnp.clip(x, 0.0, W - 1)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, H - 1)
        x1i = jnp.minimum(x0 + 1, W - 1)

        # gather rows then columns: combine on flat index for one gather
        def g(yi, xi):
            flat = yi[:, :, :, None, None] * W + xi[:, None, None, :, :]
            return feat.reshape(H * W, C)[flat]  # [R, oy, Sy, ox, Sx, C]
        lx = (x - x0)[:, None, None, :, :, None]
        ly = (y - y0)[:, :, :, None, None, None]
        v = (g(y0, x0) * (1 - ly) * (1 - lx) + g(y0, x1i) * (1 - ly) * lx
             + g(y1i, x0) * ly * (1 - lx) + g(y1i, x1i) * ly * lx)
        dead = oob_y[:, :, :, None, None, None] | oob_x[:, None, None, :, :, None]
        return jnp.where(dead, 0.0, v)

    vals = interp(ys, xs)  # [R, out, S, out, S, C]
    return vals.mean(axis=(2, 4))


def multilevel_roi_align(feats: Dict[str, jax.Array], boxes: jax.Array,
                         out_size: int, sampling_ratio: int = 2,
                         canonical_size: float = 224.0,
                         canonical_level: int = 4) -> jax.Array:
    """detectron2 ROIPooler: level k = floor(4 + log2(sqrt(area)/224)),
    clamped to [2, 5]. Every level is aligned densely and the per-roi level
    mask selects — static shapes, no data-dependent partitioning."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    lvl = jnp.floor(canonical_level + jnp.log2(
        jnp.sqrt(area) / canonical_size + 1e-8))
    lvl = jnp.clip(lvl, 2, 5).astype(jnp.int32)
    out = 0.0
    for k, name in ((2, "p2"), (3, "p3"), (4, "p4"), (5, "p5")):
        al = roi_align(feats[name], boxes, 2 ** k, out_size, sampling_ratio)
        out = out + jnp.where((lvl == k)[:, None, None, None], al, 0.0)
    return out


# --------------------------------------------------------------------------- #
# Config
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class RCNNConfig:
    beit: BeitConfig = BeitConfig(
        use_abs_pos_emb=True, use_rel_pos_bias=False, use_mean_pooling=False)
    out_indices: Tuple[int, ...] = (3, 5, 7, 11)  # blocks tapped (base)
    fpn_channels: int = 256
    num_classes: int = 5  # PubLayNet
    # RPN (Base-RCNN-FPN.yaml)
    anchor_sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)  # p2..p6
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    rpn_pre_nms_topk: int = 1000
    rpn_post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    # ROI / cascade (cascade_dit_base.yaml: CascadeROIHeads, cls-agnostic)
    pooler_resolution: int = 7
    mask_pooler_resolution: int = 14
    sampling_ratio: int = 2
    cascade_ious: Tuple[float, ...] = (0.5, 0.6, 0.7)
    cascade_weights: Tuple[Tuple[float, ...], ...] = (
        (10.0, 10.0, 5.0, 5.0), (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0))
    fc_dim: int = 1024
    # test-time
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_image: int = 100
    mask_on: bool = True
    # train-time
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    roi_batch_per_image: int = 512
    roi_positive_fraction: float = 0.25

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_ratios)

    @property
    def img_size(self) -> int:
        return self.beit.img_size


# --------------------------------------------------------------------------- #
# Backbone: intermediate-block taps + fpn1-4 adapters + top-down FPN
# --------------------------------------------------------------------------- #


class FrozenBN(nn.Module):
    """BatchNorm with stats stored as params and always applied as an affine
    (y = (x - mean) / sqrt(var + eps) * scale + bias). The reference fpn1 BN
    (ditod/beit.py:473) runs in eval mode at inference; converted checkpoints
    load running_mean/var here. Training from scratch leaves stats at
    identity — a plain learned affine (detectron2's FrozenBatchNorm2d
    behavior)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class DetectionViT(nn.Module):
    """ditod/beit.py BEiT.forward_features: taps out_indices blocks, applies
    fpn1 (deconv-BN-GELU-deconv, 4x), fpn2 (deconv, 2x), fpn3 (identity),
    fpn4 (maxpool, 0.5x). Full embed_dim channels, strides 4/8/16/32."""

    cfg: RCNNConfig

    @nn.compact
    def __call__(self, images: jax.Array, deterministic: bool = True) -> Dict[str, jax.Array]:
        cfg = self.cfg
        bcfg = cfg.beit
        _, hiddens = BeitBackbone(bcfg, final_norm=False, name="backbone")(
            images, deterministic=deterministic, return_all_hiddens=True)
        g = bcfg.img_size // bcfg.patch_size
        B = images.shape[0]
        E = bcfg.embed_dim
        taps = [hiddens[i][:, 1:].reshape(B, g, g, E) for i in cfg.out_indices]

        f1 = nn.ConvTranspose(E, (2, 2), strides=(2, 2), name="fpn1_deconv1")(taps[0])
        f1 = FrozenBN(name="fpn1_bn")(f1)
        f1 = jax.nn.gelu(f1, approximate=False)
        f1 = nn.ConvTranspose(E, (2, 2), strides=(2, 2), name="fpn1_deconv2")(f1)
        f2 = nn.ConvTranspose(E, (2, 2), strides=(2, 2), name="fpn2_deconv")(taps[1])
        f3 = taps[2]
        f4 = nn.max_pool(taps[3], (2, 2), strides=(2, 2))
        return {"c2": f1, "c3": f2, "c4": f3, "c5": f4}


class FPN(nn.Module):
    """detectron2 FPN: 1x1 laterals, top-down nearest-2x sum, 3x3 outputs,
    p6 = stride-2 maxpool of p5 (LastLevelMaxPool)."""

    cfg: RCNNConfig

    @nn.compact
    def __call__(self, c: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        C = self.cfg.fpn_channels
        lat = {k: nn.Conv(C, (1, 1), name=f"fpn_lateral{k[1]}")(v)
               for k, v in c.items()}
        td = {"c5": lat["c5"]}
        for hi, lo in (("c5", "c4"), ("c4", "c3"), ("c3", "c2")):
            up = jnp.repeat(jnp.repeat(td[hi], 2, axis=1), 2, axis=2)
            td[lo] = lat[lo] + up
        out = {f"p{k[1]}": nn.Conv(C, (3, 3), padding="SAME",
                                   name=f"fpn_output{k[1]}")(v)
               for k, v in td.items()}
        out["p6"] = nn.max_pool(out["p5"], (1, 1), strides=(2, 2))
        return out


# --------------------------------------------------------------------------- #
# RPN
# --------------------------------------------------------------------------- #


def make_anchors(cfg: RCNNConfig, level: int, gh: int, gw: int) -> np.ndarray:
    """detectron2 DefaultAnchorGenerator (offset 0): [gh*gw*A, 4] xyxy."""
    size = cfg.anchor_sizes[level - 2]
    stride = 2 ** level
    base = []
    for r in cfg.anchor_ratios:
        area = size * size
        w = math.sqrt(area / r)
        h = w * r
        base.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    base = np.asarray(base, np.float32)  # [A, 4]
    shx = np.arange(gw, dtype=np.float32) * stride
    shy = np.arange(gh, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shx, shy)  # [gh, gw], x fastest
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def make_all_anchors(cfg: RCNNConfig,
                     feats: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Anchors for every pyramid level, sized from the ACTUAL feature maps
    (p6 = maxpool(p5, stride 2, VALID) rounds differently than img_size>>6)."""
    out = {}
    for k, v in feats.items():
        lvl = int(k[1])
        out[k] = jnp.asarray(make_anchors(cfg, lvl, v.shape[1], v.shape[2]))
    return out


class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 objectness / 1x1 anchor deltas
    (detectron2 StandardRPNHead)."""

    cfg: RCNNConfig

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]):
        A = self.cfg.num_anchors
        conv = nn.Conv(self.cfg.fpn_channels, (3, 3), padding="SAME", name="conv")
        obj = nn.Conv(A, (1, 1), name="objectness_logits")
        dlt = nn.Conv(A * 4, (1, 1), name="anchor_deltas")
        logits, deltas = {}, {}
        for k, v in feats.items():
            h = jax.nn.relu(conv(v))
            logits[k] = obj(h)
            deltas[k] = dlt(h)
        return logits, deltas


def rpn_proposals(cfg: RCNNConfig, logits: Dict[str, jax.Array],
                  deltas: Dict[str, jax.Array], anchors: Dict[str, jax.Array],
                  img_size: int) -> Tuple[jax.Array, jax.Array]:
    """Single image. Per level: top pre_nms_topk; across levels: batched NMS
    (level = category) then top post_nms_topk (detectron2
    find_top_rpn_proposals). Returns (boxes [P, 4], scores [P]); dead slots
    have score -inf and zero boxes."""
    cand_b, cand_s, cand_l = [], [], []
    for li, k in enumerate(sorted(logits.keys())):
        lg = logits[k].reshape(-1)
        dl = deltas[k].reshape(-1, 4)
        topk = min(cfg.rpn_pre_nms_topk, lg.shape[0])
        sc, idx = jax.lax.top_k(lg, topk)
        bx = apply_deltas(dl[idx], anchors[k][idx], (1.0, 1.0, 1.0, 1.0))
        bx = clip_boxes(bx, (img_size, img_size))
        # d2 drops degenerate boxes; we kill their score instead
        ok = (bx[:, 2] > bx[:, 0]) & (bx[:, 3] > bx[:, 1])
        sc = jnp.where(ok, sc, -jnp.inf)
        cand_b.append(bx)
        cand_s.append(sc)
        cand_l.append(jnp.full((topk,), li, jnp.int32))
    boxes = jnp.concatenate(cand_b)
    scores = jnp.concatenate(cand_s)
    lvls = jnp.concatenate(cand_l)
    keep = nms_keep(boxes, scores, cfg.rpn_nms_thresh, idx_cat=lvls)
    scores = jnp.where(keep, scores, -jnp.inf)
    P = min(cfg.rpn_post_nms_topk, scores.shape[0])
    top_s, top_i = jax.lax.top_k(scores, P)
    top_b = boxes[top_i]
    top_b = jnp.where(jnp.isfinite(top_s)[:, None], top_b, 0.0)
    return top_b, top_s


# --------------------------------------------------------------------------- #
# ROI heads
# --------------------------------------------------------------------------- #


class BoxHead(nn.Module):
    """FastRCNNConvFCHead NUM_FC=2 (flattened 7x7xC -> fc1 -> fc2)."""

    cfg: RCNNConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [R, 7, 7, C]
        R = x.shape[0]
        h = x.reshape(R, -1)
        h = jax.nn.relu(nn.Dense(self.cfg.fc_dim, name="fc1")(h))
        h = jax.nn.relu(nn.Dense(self.cfg.fc_dim, name="fc2")(h))
        return h


class BoxPredictor(nn.Module):
    """FastRCNNOutputLayers: cls (C+1 with bg last) + cls-agnostic box (4)."""

    cfg: RCNNConfig

    @nn.compact
    def __call__(self, h: jax.Array):
        cls = nn.Dense(self.cfg.num_classes + 1, name="cls_score")(h)
        box = nn.Dense(4, name="bbox_pred")(h)
        return cls, box


class MaskHead(nn.Module):
    """MaskRCNNConvUpsampleHead NUM_CONV=4: 4x (3x3 conv+relu), 2x deconv
    +relu, 1x1 predictor with per-class channels."""

    cfg: RCNNConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [R, 14, 14, C]
        C = self.cfg.fpn_channels
        for i in range(1, 5):
            x = jax.nn.relu(nn.Conv(C, (3, 3), padding="SAME",
                                    name=f"mask_fcn{i}")(x))
        x = jax.nn.relu(nn.ConvTranspose(C, (2, 2), strides=(2, 2),
                                         name="deconv")(x))
        return nn.Conv(self.cfg.num_classes, (1, 1), name="predictor")(x)


class CascadeRCNN(nn.Module):
    """Full GeneralizedRCNN graph. `__call__` = inference for one batch of
    images; `forward_parts` exposes the sub-graphs for the training loss."""

    cfg: RCNNConfig

    def setup(self):
        cfg = self.cfg
        self.backbone_vit = DetectionViT(cfg, name="vit")
        self.fpn = FPN(cfg, name="fpn")
        self.rpn_head = RPNHead(cfg, name="rpn_head")
        self.box_heads = [BoxHead(cfg, name=f"box_head_{i}")
                          for i in range(len(cfg.cascade_ious))]
        self.box_predictors = [BoxPredictor(cfg, name=f"box_predictor_{i}")
                               for i in range(len(cfg.cascade_ious))]
        if cfg.mask_on:
            self.mask_head = MaskHead(cfg, name="mask_head")

    def features(self, images, deterministic=True):
        return self.fpn(self.backbone_vit(images, deterministic))

    def propose(self, feats):
        """Batched RPN: the head runs once; the pure proposal math (top-k,
        NMS, clip) is vmapped over the batch — ONE compiled program
        regardless of B (the round-2 per-image Python loop compiled B full
        copies of the proposal graph). Returns (boxes [B, P, 4], scores)."""
        cfg = self.cfg
        logits, deltas = self.rpn_head(feats)
        anchors = make_all_anchors(cfg, feats)
        return jax.vmap(
            lambda lg, dl: rpn_proposals(cfg, lg, dl, anchors, cfg.img_size)
        )(logits, deltas)

    def _pool(self, feats, boxes, resolution):
        """Multilevel RoIAlign vmapped over the batch: feats {level: [B,
        H, W, C]} x boxes [B, P, 4] -> [B, P, res, res, C]."""
        roi_feats = {k: v for k, v in feats.items() if k != "p6"}
        return jax.vmap(lambda f, b: multilevel_roi_align(
            f, b, resolution, self.cfg.sampling_ratio))(roi_feats, boxes)

    def cascade_stage(self, k: int, feats, boxes):
        """One cascade stage, batched: pooled -> head -> (cls, deltas,
        refined boxes). feats values [B, H, W, C] (or unbatched [H, W, C]
        with boxes [P, 4] for the single-image path); heads see one flat
        [B*P, ...] batch so their matmuls stay large."""
        cfg = self.cfg
        single = boxes.ndim == 2
        if single:
            feats = jax.tree.map(lambda v: v[None], feats)
            boxes = boxes[None]
        B, P = boxes.shape[:2]
        pooled = self._pool(feats, boxes, cfg.pooler_resolution)
        h = self.box_heads[k](pooled.reshape(B * P, *pooled.shape[2:]))
        cls, dlt = self.box_predictors[k](h)
        cls = cls.reshape(B, P, -1)
        dlt = dlt.reshape(B, P, 4)
        refined = apply_deltas(dlt, boxes, cfg.cascade_weights[k])
        refined = clip_boxes(refined, (cfg.img_size, cfg.img_size))
        if single:
            return cls[0], dlt[0], refined[0]
        return cls, dlt, refined

    def __call__(self, images: jax.Array, deterministic: bool = True):
        """Inference: returns dict with padded per-image detections
        (boxes [B, D, 4], scores [B, D], classes [B, D], valid [B, D],
        masks [B, D, 2*mask_res, 2*mask_res] when mask_on). Fully batched:
        heads run on flat [B*P] batches, the pure per-image pieces
        (RoIAlign levels, NMS postprocess) are vmapped."""
        cfg = self.cfg
        feats = self.features(images, deterministic)
        prop_boxes, prop_scores = self.propose(feats)
        out = {"proposals": prop_boxes, "proposal_scores": prop_scores}
        alive = jnp.isfinite(prop_scores)  # [B, P]
        boxes = prop_boxes
        stage_scores = []
        for k in range(len(cfg.cascade_ious)):
            cls, _, boxes = self.cascade_stage(k, feats, boxes)
            stage_scores.append(jax.nn.softmax(cls, axis=-1))
        # CascadeROIHeads test: mean of per-stage class probabilities
        scores = sum(stage_scores) / len(stage_scores)  # [B, P, C+1]
        scores = jnp.where(alive[..., None], scores[..., :-1], 0.0)  # drop bg
        b, s, c, v = jax.vmap(self._postprocess)(boxes, scores)
        out.update(boxes=b, scores=s, classes=c, valid=v)
        if cfg.mask_on:
            B, D = c.shape
            pooled = self._pool(feats, b, cfg.mask_pooler_resolution)
            m = self.mask_head(pooled.reshape(B * D, *pooled.shape[2:]))
            m = m.reshape(B, D, *m.shape[1:])  # [B, D, 28, 28, C]
            mc = jnp.take_along_axis(
                m, c[:, :, None, None, None], axis=-1)[..., 0]
            out["masks"] = jax.nn.sigmoid(mc)
        return out

    def _postprocess(self, boxes, scores):
        """Per-class score threshold + batched NMS + top detections
        (fast_rcnn_inference_single_image). boxes are class-agnostic."""
        cfg = self.cfg
        P, C = scores.shape
        flat_scores = scores.reshape(-1)  # [P*C]
        flat_scores = jnp.where(flat_scores > cfg.score_thresh, flat_scores, -jnp.inf)
        flat_boxes = jnp.repeat(boxes, C, axis=0)
        flat_cls = jnp.tile(jnp.arange(C, dtype=jnp.int32), P)
        # cap NMS candidates (static): top 4*detections_per_image
        M = min(4 * cfg.detections_per_image, flat_scores.shape[0])
        top_s, top_i = jax.lax.top_k(flat_scores, M)
        top_b = flat_boxes[top_i]
        top_c = flat_cls[top_i]
        keep = nms_keep(top_b, top_s, cfg.nms_thresh, idx_cat=top_c)
        top_s = jnp.where(keep, top_s, -jnp.inf)
        D = min(cfg.detections_per_image, M)
        fin_s, fin_i = jax.lax.top_k(top_s, D)
        valid = jnp.isfinite(fin_s)
        return (jnp.where(valid[:, None], top_b[fin_i], 0.0),
                jnp.where(valid, fin_s, 0.0), top_c[fin_i], valid)


# --------------------------------------------------------------------------- #
# Training losses (detectron2 RPN losses + cascade per-stage reassignment)
# --------------------------------------------------------------------------- #


def _match(iou: jax.Array, thresholds: Tuple[float, float],
           allow_low_quality: bool) -> Tuple[jax.Array, jax.Array]:
    """detectron2 Matcher: labels 1 (fg), 0 (bg), -1 (ignore); returns
    (matched_gt_idx [N], labels [N]). iou [N, G] with dead gt zeroed."""
    lo, hi = thresholds
    best = jnp.max(iou, axis=1)
    idx = jnp.argmax(iou, axis=1)
    labels = jnp.where(best >= hi, 1, jnp.where(best < lo, 0, -1))
    if allow_low_quality:
        # anchors that are the argmax for some gt become fg
        per_gt_best = jnp.max(iou, axis=0)  # [G]
        is_best = jnp.any(
            (iou == per_gt_best[None, :]) & (per_gt_best[None, :] > 1e-5), axis=1)
        labels = jnp.where(is_best, 1, labels)
    return idx, labels


def _subsample(labels: jax.Array, num: int, pos_frac: float,
               rng: jax.Array) -> jax.Array:
    """Static subsample_labels: keep mask selecting <=num anchors with
    ~pos_frac positives; random tie-break via uniform noise + top_k."""
    n_pos = int(num * pos_frac)
    noise = jax.random.uniform(rng, labels.shape)
    pos_key = jnp.where(labels == 1, noise, -1.0)
    _, pos_i = jax.lax.top_k(pos_key, min(n_pos, labels.shape[0]))
    pos_sel = jnp.zeros_like(labels, bool).at[pos_i].set(True) & (labels == 1)
    n_pos_actual = jnp.sum(pos_sel)
    neg_key = jnp.where(labels == 0, noise, -1.0)
    _, neg_i = jax.lax.top_k(neg_key, min(num, labels.shape[0]))
    neg_rank = jnp.zeros_like(labels, jnp.int32).at[neg_i].set(
        jnp.arange(min(num, labels.shape[0]), dtype=jnp.int32))
    neg_sel = (jnp.zeros_like(labels, bool).at[neg_i].set(True)
               & (labels == 0) & (neg_rank < num - n_pos_actual))
    return pos_sel, neg_sel


def rcnn_loss(model: CascadeRCNN, params, images, gt_boxes, gt_classes,
              gt_valid, rng, gt_masks=None):
    """Full training loss for one batch. gt_boxes [B, G, 4] xyxy (padded),
    gt_classes [B, G] int, gt_valid [B, G] bool, gt_masks [B, G, Hm, Wm]
    binary (optional). Returns (loss, metrics).

    detectron2 equivalents: rpn.losses (objectness BCE + l1 on fg),
    CascadeROIHeads._forward_box train branch (per-stage reassignment at the
    stage IoU, CE + cls-agnostic l1), mask_rcnn_loss (BCE at 28x28 on fg)."""
    cfg = model.cfg

    def apply(method, *a):
        return model.apply({"params": params}, *a, method=method)

    feats = apply(model.features, images, True)
    logits, deltas = model.apply({"params": params}, feats,
                                 method=lambda m, f: m.rpn_head(f))
    anchors_d = make_all_anchors(cfg, feats)
    anchors = jnp.concatenate([anchors_d[k].reshape(-1, 4)
                               for k in sorted(anchors_d.keys())])
    B = images.shape[0]
    flat_logits = jnp.concatenate(
        [logits[k].reshape(B, -1) for k in sorted(logits.keys())], axis=1)
    flat_deltas = jnp.concatenate(
        [deltas[k].reshape(B, -1, 4) for k in sorted(deltas.keys())], axis=1)

    metrics = {}
    prop_boxes, prop_scores = apply(model.propose, feats)
    gtb_all = jnp.where(gt_valid[..., None], gt_boxes, -1e4)  # [B, G, 4]

    # --- RPN losses: pure matching vmapped over the batch -----------------
    def rpn_one(gtb, gv, lg, dl, r):
        iou = jnp.where(gv[None, :], box_iou(anchors, gtb), 0.0)
        m_idx, m_lab = _match(iou, (0.3, 0.7), allow_low_quality=True)
        pos, neg = _subsample(m_lab, cfg.rpn_batch_per_image,
                              cfg.rpn_positive_fraction, r)
        sel = pos | neg
        obj = jnp.sum(jnp.where(sel, optax_bce(lg, jnp.where(pos, 1.0, 0.0)),
                                0.0)) / cfg.rpn_batch_per_image
        reg_t = get_deltas(anchors, gtb[m_idx], (1.0, 1.0, 1.0, 1.0))
        reg = jnp.sum(jnp.where(pos[:, None], jnp.abs(dl - reg_t), 0.0)
                      ) / cfg.rpn_batch_per_image
        return obj, reg

    rngs = jax.random.split(rng, 1 + len(cfg.cascade_ious))
    obj_l, reg_l = jax.vmap(rpn_one)(
        gtb_all, gt_valid, flat_logits, flat_deltas,
        jax.random.split(rngs[0], B))
    total = jnp.sum(obj_l) + jnp.sum(reg_l)
    metrics["rpn_cls"] = jnp.mean(obj_l)
    metrics["rpn_reg"] = jnp.mean(reg_l)

    # --- cascade stages: pure matching vmapped, heads on flat batches -----
    # d2 adds gt boxes to the proposal set at train time
    boxes = jnp.concatenate([prop_boxes, gtb_all], axis=1)  # [B, R, 4]

    def match_one(boxes_i, gtb, gv, gc, iou_th, r):
        piou = jnp.where(gv[None, :], box_iou(boxes_i, gtb), 0.0)
        pidx, plab = _match(piou, (iou_th, iou_th), allow_low_quality=False)
        ppos, pneg = _subsample(plab, cfg.roi_batch_per_image,
                                cfg.roi_positive_fraction, r)
        cls_t = jnp.where(ppos, gc[pidx], cfg.num_classes)
        return pidx, ppos, ppos | pneg, cls_t

    for k, iou_th in enumerate(cfg.cascade_ious):
        pidx, ppos, psel, cls_t = jax.vmap(
            lambda b_, g_, v_, c_, r_: match_one(b_, g_, v_, c_, iou_th, r_)
        )(boxes, gtb_all, gt_valid, gt_classes,
          jax.random.split(rngs[1 + k], B))
        cls, dlt, refined = model.apply(
            {"params": params}, k, feats, boxes,
            method=lambda m, k_, f_, b_: m.cascade_stage(k_, f_, b_))
        logp = jax.nn.log_softmax(cls.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, cls_t[..., None], axis=-1)[..., 0]
        n_sel = jnp.maximum(jnp.sum(psel, axis=1), 1)  # [B]
        ce = jnp.sum(jnp.where(psel, ce, 0.0), axis=1) / n_sel
        bt = jax.vmap(lambda b_, g_, i_: get_deltas(
            b_, g_[i_], cfg.cascade_weights[k]))(boxes, gtb_all, pidx)
        bl = jnp.sum(jnp.where(ppos[..., None], jnp.abs(dlt - bt), 0.0),
                     axis=(1, 2)) / n_sel
        total = total + jnp.sum(ce) + jnp.sum(bl)
        metrics[f"stage{k}_cls"] = jnp.mean(ce)
        metrics[f"stage{k}_reg"] = jnp.mean(bl)
        boxes = jax.lax.stop_gradient(refined)

    # --- mask loss ---------------------------------------------------------
    if cfg.mask_on and gt_masks is not None:
        R = boxes.shape[1]
        pooled = model.apply(
            {"params": params}, feats, boxes,
            method=lambda m, f_, b_: m._pool(f_, b_, cfg.mask_pooler_resolution))
        mpred = model.apply(
            {"params": params}, pooled.reshape(B * R, *pooled.shape[2:]),
            method=lambda m, p_: m.mask_head(p_))
        mpred = mpred.reshape(B, R, *mpred.shape[1:])
        mcls = jnp.clip(cls_t, 0, cfg.num_classes - 1)
        mpred = jnp.take_along_axis(
            mpred, mcls[:, :, None, None, None], axis=-1)[..., 0]
        tgt_m = jax.vmap(lambda gm, i_, b_: crop_gt_masks_for(
            gm, i_, b_, 2 * cfg.mask_pooler_resolution))(gt_masks, pidx, boxes)
        per_roi = jnp.mean(optax_bce(mpred, tgt_m.astype(mpred.dtype)),
                           axis=(2, 3))  # [B, R]
        ml = (jnp.sum(jnp.where(ppos, per_roi, 0.0), axis=1)
              / jnp.maximum(jnp.sum(ppos, axis=1), 1))
        total = total + jnp.sum(ml)
        metrics["mask"] = jnp.mean(ml)

    return total / B, metrics


def optax_bce(logits, targets):
    """Sigmoid BCE without the optax import dance."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def crop_gt_masks_for(gt_masks: jax.Array, gt_idx: jax.Array,
                      boxes: jax.Array, out: int) -> jax.Array:
    """For each roi r: crop gt_masks[gt_idx[r]] to boxes[r], resized to
    out x out (mask_rcnn's crop_and_resize on bitmasks). gt_masks [G, H, W]
    in image coordinates."""
    G, H, W = gt_masks.shape
    sel = gt_masks[gt_idx].astype(jnp.float32)  # [R, H, W]

    def one(mask, box):
        return roi_align(mask[:, :, None], box[None], 1, out,
                         sampling_ratio=1)[0, :, :, 0]

    return jax.vmap(one)(sel, boxes) > 0.5


# --------------------------------------------------------------------------- #
# Presets
# --------------------------------------------------------------------------- #


def cascade_dit_base(img_size: int = 224, num_classes: int = 5,
                     **kw) -> RCNNConfig:
    """cascade_dit_base.yaml: dit_base_patch16, abs pos, CascadeROIHeads."""
    beit = BeitConfig(img_size=img_size, use_abs_pos_emb=True,
                      use_rel_pos_bias=False, use_shared_rel_pos_bias=False,
                      use_mean_pooling=False, init_values=0.1,
                      num_classes=0)
    return RCNNConfig(beit=beit, num_classes=num_classes,
                      out_indices=(3, 5, 7, 11), **kw)


def cascade_dit_large(img_size: int = 224, num_classes: int = 5,
                      **kw) -> RCNNConfig:
    beit = BeitConfig(img_size=img_size, embed_dim=1024, num_layers=24,
                      num_heads=16, ffn_dim=4096, use_abs_pos_emb=True,
                      use_rel_pos_bias=False, use_mean_pooling=False,
                      init_values=1e-5, num_classes=0)
    return RCNNConfig(beit=beit, num_classes=num_classes,
                      out_indices=(7, 11, 15, 23), **kw)
