"""Full-graph numeric parity for the Cascade/Mask R-CNN converter.

A torch+numpy oracle of the COMPLETE detectron2 GeneralizedRCNN inference
pipeline (dit/object_detection/ditod/backbone.py:31,134 +
cascade_dit_base.yaml semantics) consumes the SAME synthetic detectron2
state dict that convert_rcnn converts, runs the same fixed image, and the
final boxes/scores/classes/masks must match end-to-end. The per-op oracles
in test_rcnn.py verify layouts in isolation; this catches anything they
can't — a transposed weight that happens to be shape-compatible, an
off-by-half RoIAlign, a wrong flatten order feeding fc1, swapped BN fields.

Neural parts run in torch float64 directly on the detectron2-layout
tensors (conv via F.conv2d on NCHW — no conversion code in the data path);
algorithmic parts (anchors, proposal top-k/NMS, cascade box transforms,
postprocess) are independent numpy re-derivations of the detectron2
semantics the jax model claims to implement.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from unilm_tpu.models.beit import BeitConfig  # noqa: E402
from unilm_tpu.models.rcnn import CascadeRCNN, RCNNConfig  # noqa: E402

from test_rcnn import build_synthetic_sd, naive_roi_align, tiny_cfg  # noqa: E402

SCALE_CLAMP = math.log(1000.0 / 16)


# --------------------------------------------------------------------------- #
# numpy re-derivations of the detectron2 algorithmic pieces
# --------------------------------------------------------------------------- #


def np_apply_deltas(deltas, boxes, weights):
    wx, wy, ww, wh = weights
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw = np.minimum(deltas[:, 2] / ww, SCALE_CLAMP)
    dh = np.minimum(deltas[:, 3] / wh, SCALE_CLAMP)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw, pcy + 0.5 * ph], -1)


def np_clip(boxes, size):
    return np.stack([np.clip(boxes[:, 0], 0, size), np.clip(boxes[:, 1], 0, size),
                     np.clip(boxes[:, 2], 0, size), np.clip(boxes[:, 3], 0, size)], -1)


def np_iou(a, b):
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def np_greedy_nms(boxes, scores, thresh, cats):
    """Greedy batched NMS: keep mask. -inf candidates never kept/suppress."""
    order = np.argsort(-scores, kind="stable")
    iou = np_iou(boxes, boxes)
    keep = np.zeros(len(boxes), bool)
    kept = []
    for j in order:
        if not np.isfinite(scores[j]):
            continue
        if any(cats[i] == cats[j] and iou[i, j] > thresh for i in kept):
            continue
        keep[j] = True
        kept.append(j)
    return keep


def np_anchors(sizes, ratios, level, gh, gw):
    """detectron2 DefaultAnchorGenerator, offset 0."""
    size = sizes[level - 2]
    stride = 2 ** level
    base = []
    for r in ratios:
        w = math.sqrt(size * size / r)
        base.append([-w / 2, -w * r / 2, w / 2, w * r / 2])
    base = np.asarray(base, np.float64)
    sx, sy = np.meshgrid(np.arange(gw) * stride, np.arange(gh) * stride)
    shifts = np.stack([sx, sy, sx, sy], -1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def np_pool_level(area, canonical_size=224.0, canonical_level=4):
    lvl = np.floor(canonical_level + np.log2(np.sqrt(area) / canonical_size + 1e-8))
    return np.clip(lvl, 2, 5).astype(np.int64)


def pool_multilevel(feats_np, boxes, out, sampling_ratio):
    """ROIPooler: naive_roi_align (torchvision-semantics loop oracle from
    test_rcnn.py) on each box's assigned level. feats_np: {'p2': HWC f64}."""
    area = (np.maximum(boxes[:, 2] - boxes[:, 0], 0)
            * np.maximum(boxes[:, 3] - boxes[:, 1], 0))
    lvl = np_pool_level(area)
    C = feats_np["p2"].shape[-1]
    pooled = np.zeros((len(boxes), out, out, C))
    for k in (2, 3, 4, 5):
        sel = np.nonzero(lvl == k)[0]
        if len(sel):
            pooled[sel] = naive_roi_align(
                feats_np[f"p{k}"], boxes[sel], 2 ** k, out, sr=sampling_ratio)
    return pooled


# --------------------------------------------------------------------------- #
# torch oracle: neural graph straight off the detectron2 state dict
# --------------------------------------------------------------------------- #


def _w(sd, k):
    return sd[k].double()


def torch_vit_taps(sd, cfg: RCNNConfig, img):
    """timm/ditod BEiT trunk (ditod/beit.py): patch conv, cls, abs pos,
    pre-LN blocks with packed qkv (q_bias/0/v_bias) and gamma_1/2 layer
    scale; taps = post-block hiddens at out_indices, cls dropped."""
    b = cfg.beit
    P = "backbone.bottom_up.backbone."
    x = F.conv2d(img, _w(sd, f"{P}patch_embed.proj.weight"),
                 _w(sd, f"{P}patch_embed.proj.bias"), stride=b.patch_size)
    B, E, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)  # [B, N, E]
    x = torch.cat([_w(sd, f"{P}cls_token").expand(B, -1, -1), x], 1)
    x = x + _w(sd, f"{P}pos_embed")
    nh = b.num_heads
    hd = E // nh
    taps = []
    for i in range(b.num_layers):
        p = f"{P}blocks.{i}"
        h = F.layer_norm(x, (E,), _w(sd, f"{p}.norm1.weight"),
                         _w(sd, f"{p}.norm1.bias"), eps=b.layernorm_eps)
        qkv_bias = torch.cat([_w(sd, f"{p}.attn.q_bias"),
                              torch.zeros(E, dtype=torch.float64),
                              _w(sd, f"{p}.attn.v_bias")])
        qkv = F.linear(h, _w(sd, f"{p}.attn.qkv.weight"), qkv_bias)
        q, k, v = qkv.reshape(B, -1, 3, nh, hd).permute(2, 0, 3, 1, 4)
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        a = attn.softmax(-1) @ v  # [B, nh, N, hd]
        a = a.transpose(1, 2).reshape(B, -1, E)
        a = F.linear(a, _w(sd, f"{p}.attn.proj.weight"),
                     _w(sd, f"{p}.attn.proj.bias"))
        x = x + _w(sd, f"{p}.gamma_1") * a
        h = F.layer_norm(x, (E,), _w(sd, f"{p}.norm2.weight"),
                         _w(sd, f"{p}.norm2.bias"), eps=b.layernorm_eps)
        h = F.linear(h, _w(sd, f"{p}.mlp.fc1.weight"), _w(sd, f"{p}.mlp.fc1.bias"))
        h = F.gelu(h)
        h = F.linear(h, _w(sd, f"{p}.mlp.fc2.weight"), _w(sd, f"{p}.mlp.fc2.bias"))
        x = x + _w(sd, f"{p}.gamma_2") * h
        taps.append(x)
    # NCHW feature maps at out_indices, cls dropped
    return [taps[i][:, 1:].transpose(1, 2).reshape(B, E, gh, gw)
            for i in cfg.out_indices]


def torch_features(sd, cfg: RCNNConfig, img):
    """fpn1-4 adapters + detectron2 FPN -> {'p2'..'p6': [H, W, C] float64}."""
    P = "backbone.bottom_up.backbone."
    t0, t1, t2, t3 = torch_vit_taps(sd, cfg, img)
    f1 = F.conv_transpose2d(t0, _w(sd, f"{P}fpn1.0.weight"),
                            _w(sd, f"{P}fpn1.0.bias"), stride=2)
    f1 = F.batch_norm(f1, _w(sd, f"{P}fpn1.1.running_mean"),
                      _w(sd, f"{P}fpn1.1.running_var"),
                      _w(sd, f"{P}fpn1.1.weight"), _w(sd, f"{P}fpn1.1.bias"),
                      training=False, eps=1e-5)
    f1 = F.gelu(f1)
    f1 = F.conv_transpose2d(f1, _w(sd, f"{P}fpn1.3.weight"),
                            _w(sd, f"{P}fpn1.3.bias"), stride=2)
    f2 = F.conv_transpose2d(t1, _w(sd, f"{P}fpn2.0.weight"),
                            _w(sd, f"{P}fpn2.0.bias"), stride=2)
    c = {2: f1, 3: f2, 4: t2, 5: F.max_pool2d(t3, 2, 2)}
    lat = {k: F.conv2d(v, _w(sd, f"backbone.fpn_lateral{k}.weight"),
                       _w(sd, f"backbone.fpn_lateral{k}.bias"))
           for k, v in c.items()}
    td = {5: lat[5]}
    for hi, lo in ((5, 4), (4, 3), (3, 2)):
        td[lo] = lat[lo] + td[hi].repeat_interleave(2, -2).repeat_interleave(2, -1)
    out = {f"p{k}": F.conv2d(v, _w(sd, f"backbone.fpn_output{k}.weight"),
                             _w(sd, f"backbone.fpn_output{k}.bias"), padding=1)
           for k, v in td.items()}
    out["p6"] = F.max_pool2d(out["p5"], 1, 2)
    return {k: v[0].permute(1, 2, 0).numpy() for k, v in out.items()}


def oracle_rcnn(sd, cfg: RCNNConfig, img_nchw):
    """Complete GeneralizedRCNN inference for ONE image: returns dict of
    (boxes [D,4], scores [D], classes [D], valid [D], masks [D,2m,2m])."""
    with torch.no_grad():
        feats = torch_features(sd, cfg, img_nchw.double())

        # --- RPN head on each level (torch), proposals in numpy ----------
        cand_b, cand_s, cand_l = [], [], []
        for li, name in enumerate(sorted(feats.keys())):
            f = torch.from_numpy(feats[name]).permute(2, 0, 1)[None]
            h = F.relu(F.conv2d(f, _w(sd, "proposal_generator.rpn_head.conv.weight"),
                                _w(sd, "proposal_generator.rpn_head.conv.bias"),
                                padding=1))
            lg = F.conv2d(h, _w(sd, "proposal_generator.rpn_head.objectness_logits.weight"),
                          _w(sd, "proposal_generator.rpn_head.objectness_logits.bias"))
            dl = F.conv2d(h, _w(sd, "proposal_generator.rpn_head.anchor_deltas.weight"),
                          _w(sd, "proposal_generator.rpn_head.anchor_deltas.bias"))
            gh, gw = lg.shape[-2:]
            lg = lg[0].permute(1, 2, 0).numpy().reshape(-1)            # NHWC flat
            dl = dl[0].permute(1, 2, 0).numpy().reshape(-1, 4)
            anch = np_anchors(cfg.anchor_sizes, cfg.anchor_ratios,
                              int(name[1]), gh, gw)
            topk = min(cfg.rpn_pre_nms_topk, len(lg))
            idx = np.argsort(-lg, kind="stable")[:topk]
            bx = np_clip(np_apply_deltas(dl[idx], anch[idx], (1, 1, 1, 1)),
                         cfg.img_size)
            sc = lg[idx].copy()
            sc[~((bx[:, 2] > bx[:, 0]) & (bx[:, 3] > bx[:, 1]))] = -np.inf
            cand_b.append(bx)
            cand_s.append(sc)
            cand_l.append(np.full(topk, li))
        boxes = np.concatenate(cand_b)
        scores = np.concatenate(cand_s)
        keep = np_greedy_nms(boxes, scores, cfg.rpn_nms_thresh,
                             np.concatenate(cand_l))
        scores = np.where(keep, scores, -np.inf)
        P = min(cfg.rpn_post_nms_topk, len(scores))
        top = np.argsort(-scores, kind="stable")[:P]
        prop_s = scores[top]
        prop_b = np.where(np.isfinite(prop_s)[:, None], boxes[top], 0.0)

        # --- cascade ------------------------------------------------------
        alive = np.isfinite(prop_s)
        roi_feats = {k: v for k, v in feats.items() if k != "p6"}
        bx = prop_b
        stage_probs = []
        for k in range(len(cfg.cascade_ious)):
            pooled = pool_multilevel(roi_feats, bx, cfg.pooler_resolution,
                                     cfg.sampling_ratio)
            # torch FC flatten order is (C, h, w)
            flat = torch.from_numpy(pooled.transpose(0, 3, 1, 2).reshape(P, -1))
            h = F.relu(F.linear(flat, _w(sd, f"roi_heads.box_head.{k}.fc1.weight"),
                                _w(sd, f"roi_heads.box_head.{k}.fc1.bias")))
            h = F.relu(F.linear(h, _w(sd, f"roi_heads.box_head.{k}.fc2.weight"),
                                _w(sd, f"roi_heads.box_head.{k}.fc2.bias")))
            cls = F.linear(h, _w(sd, f"roi_heads.box_predictor.{k}.cls_score.weight"),
                           _w(sd, f"roi_heads.box_predictor.{k}.cls_score.bias"))
            dlt = F.linear(h, _w(sd, f"roi_heads.box_predictor.{k}.bbox_pred.weight"),
                           _w(sd, f"roi_heads.box_predictor.{k}.bbox_pred.bias"))
            stage_probs.append(cls.softmax(-1).numpy())
            bx = np_clip(np_apply_deltas(dlt.numpy(), bx, cfg.cascade_weights[k]),
                         cfg.img_size)
        probs = sum(stage_probs) / len(stage_probs)
        probs = np.where(alive[:, None], probs[:, :-1], 0.0)  # drop background

        # --- fast_rcnn_inference_single_image ------------------------------
        C = cfg.num_classes
        flat_s = probs.reshape(-1).copy()
        flat_s[flat_s <= cfg.score_thresh] = -np.inf
        flat_b = np.repeat(bx, C, axis=0)
        flat_c = np.tile(np.arange(C), P)
        M = min(4 * cfg.detections_per_image, len(flat_s))
        top = np.argsort(-flat_s, kind="stable")[:M]
        top_s, top_b, top_c = flat_s[top], flat_b[top], flat_c[top]
        keep = np_greedy_nms(top_b, top_s, cfg.nms_thresh, top_c)
        top_s = np.where(keep, top_s, -np.inf)
        D = min(cfg.detections_per_image, M)
        fin = np.argsort(-top_s, kind="stable")[:D]
        valid = np.isfinite(top_s[fin])
        det_b = np.where(valid[:, None], top_b[fin], 0.0)
        det_s = np.where(valid, top_s[fin], 0.0)
        det_c = top_c[fin]

        out = {"boxes": det_b, "scores": det_s, "classes": det_c,
               "valid": valid}
        if cfg.mask_on:
            pooled = pool_multilevel(roi_feats, det_b,
                                     cfg.mask_pooler_resolution,
                                     cfg.sampling_ratio)
            x = torch.from_numpy(pooled.transpose(0, 3, 1, 2))
            for i in range(1, 5):
                x = F.relu(F.conv2d(x, _w(sd, f"roi_heads.mask_head.mask_fcn{i}.weight"),
                                    _w(sd, f"roi_heads.mask_head.mask_fcn{i}.bias"),
                                    padding=1))
            x = F.relu(F.conv_transpose2d(x, _w(sd, "roi_heads.mask_head.deconv.weight"),
                                          _w(sd, "roi_heads.mask_head.deconv.bias"),
                                          stride=2))
            x = F.conv2d(x, _w(sd, "roi_heads.mask_head.predictor.weight"),
                         _w(sd, "roi_heads.mask_head.predictor.bias"))
            m = torch.sigmoid(x).numpy()  # [D, ncls, 2m, 2m]
            out["masks"] = m[np.arange(D), det_c]
        return out


# --------------------------------------------------------------------------- #
# the parity tests
# --------------------------------------------------------------------------- #


def _run_parity(cfg: RCNNConfig, seed: int):
    from unilm_tpu.convert.detection import convert_rcnn

    jax.config.update("jax_default_matmul_precision", "highest")
    sd = build_synthetic_sd(cfg, seed=seed)
    img = np.random.RandomState(seed + 7).rand(
        1, cfg.img_size, cfg.img_size, 3).astype(np.float32)

    want = oracle_rcnn(sd, cfg, torch.from_numpy(img.transpose(0, 3, 1, 2)))

    model = CascadeRCNN(cfg)
    params = jax.tree.map(jnp.asarray, convert_rcnn(sd, cfg))
    got = jax.tree.map(np.asarray,
                       model.apply({"params": params}, jnp.asarray(img)))

    np.testing.assert_array_equal(got["valid"][0], want["valid"])
    v = want["valid"]
    assert v.any(), "degenerate test: no valid detections"
    np.testing.assert_array_equal(got["classes"][0][v], want["classes"][v])
    np.testing.assert_allclose(got["scores"][0][v], want["scores"][v],
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(got["boxes"][0][v], want["boxes"][v],
                               atol=5e-3, rtol=1e-4)
    if cfg.mask_on:
        np.testing.assert_allclose(got["masks"][0][v], want["masks"][v],
                                   atol=5e-4, rtol=1e-3)
    return int(v.sum())


@pytest.mark.slow
def test_rcnn_fullgraph_parity():
    """64² tiny cascade+mask graph: end-to-end boxes/scores/classes/masks
    match the torch+numpy oracle on the same synthetic checkpoint."""
    n = _run_parity(tiny_cfg(mask_on=True), seed=0)
    assert n >= 2  # multiple survivors exercise NMS ordering


@pytest.mark.slow
def test_rcnn_fullgraph_parity_800():
    """800²-class PubLayNet shape (dit cascade layouts run at ~800px): large
    anchor grids (p2 = 200²·3 anchors), p6 odd-size rounding, real multi-level
    RoI assignment. Thin 2-layer trunk keeps the oracle tractable."""
    beit = BeitConfig(
        img_size=800, patch_size=16, embed_dim=32, num_layers=2, num_heads=2,
        ffn_dim=64, use_abs_pos_emb=True, use_rel_pos_bias=False,
        use_mean_pooling=False, init_values=0.1, num_classes=0,
        use_flash=False)
    cfg = RCNNConfig(
        beit=beit, out_indices=(0, 0, 1, 1), fpn_channels=16, num_classes=3,
        rpn_pre_nms_topk=32, rpn_post_nms_topk=16, fc_dim=32,
        detections_per_image=8, mask_on=True,
        rpn_batch_per_image=16, roi_batch_per_image=16)
    _run_parity(cfg, seed=1)
