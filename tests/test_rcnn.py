"""Cascade/Mask R-CNN: unit oracles for the detectron2-semantics pieces
(RoIAlign, NMS, box transforms, ConvTranspose conversion) + tiny e2e
forward/convert/train smoke tests.

Reference behaviors: detectron2 ROIAlign(aligned=True) == torchvision
roi_align(aligned=True); detectron2 batched_nms; Box2BoxTransform;
dit/object_detection/ditod/backbone.py + cascade_dit_base.yaml graph.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unilm_tpu.models.beit import BeitConfig
from unilm_tpu.models.rcnn import (
    CascadeRCNN, RCNNConfig, apply_deltas, box_iou, get_deltas,
    make_all_anchors, nms_keep, rcnn_loss, roi_align,
)


def tiny_cfg(mask_on=True) -> RCNNConfig:
    beit = BeitConfig(
        img_size=64, patch_size=16, embed_dim=32, num_layers=4, num_heads=2,
        ffn_dim=64, use_abs_pos_emb=True, use_rel_pos_bias=False,
        use_mean_pooling=False, init_values=0.1, num_classes=0)
    return RCNNConfig(
        beit=beit, out_indices=(0, 1, 2, 3), fpn_channels=16, num_classes=3,
        rpn_pre_nms_topk=32, rpn_post_nms_topk=16, fc_dim=32,
        detections_per_image=8, mask_on=mask_on,
        rpn_batch_per_image=16, roi_batch_per_image=16)


# --------------------------------------------------------------------------- #
# RoIAlign vs a naive loop oracle (torchvision aligned=True semantics)
# --------------------------------------------------------------------------- #


def naive_roi_align(feat, boxes, stride, out, sr=2, aligned=True):
    """Direct transcription of torchvision's roi_align kernel (loops)."""
    H, W, C = feat.shape
    R = boxes.shape[0]
    res = np.zeros((R, out, out, C), np.float64)
    off = 0.5 if aligned else 0.0
    for r in range(R):
        x1 = boxes[r, 0] / stride - off
        y1 = boxes[r, 1] / stride - off
        w = boxes[r, 2] / stride - off - x1
        h = boxes[r, 3] / stride - off - y1
        if aligned:
            w, h = max(w, 1e-6), max(h, 1e-6)
        else:
            w, h = max(w, 1.0), max(h, 1.0)
        bw, bh = w / out, h / out
        for oy in range(out):
            for ox in range(out):
                acc = np.zeros(C)
                for iy in range(sr):
                    for ix in range(sr):
                        y = y1 + (oy + (iy + 0.5) / sr) * bh
                        x = x1 + (ox + (ix + 0.5) / sr) * bw
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y = min(max(y, 0.0), H - 1)
                        x = min(max(x, 0.0), W - 1)
                        y0, x0 = int(y), int(x)
                        y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y - y0, x - x0
                        acc += (feat[y0, x0] * (1 - ly) * (1 - lx)
                                + feat[y0, x1i] * (1 - ly) * lx
                                + feat[y1i, x0] * ly * (1 - lx)
                                + feat[y1i, x1i] * ly * lx)
                res[r, oy, ox] = acc / (sr * sr)
    return res


def test_roi_align_matches_naive():
    rng = np.random.RandomState(0)
    feat = rng.randn(9, 11, 3).astype(np.float32)
    boxes = np.array([
        [4.0, 8.0, 30.0, 20.0],
        [0.0, 0.0, 44.0, 36.0],
        [10.0, 10.0, 11.5, 12.0],   # tiny box
        [-8.0, -4.0, 20.0, 16.0],   # out-of-bounds corner
        [0.0, 0.0, 0.0, 0.0],       # degenerate dead box
    ], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                               stride=4, out_size=5, sampling_ratio=2))
    want = naive_roi_align(feat, boxes, stride=4, out=5, sr=2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------- #
# NMS vs greedy oracle
# --------------------------------------------------------------------------- #


def naive_nms(boxes, scores, thresh, cats=None):
    order = np.argsort(-scores)
    keep = np.zeros(len(boxes), bool)
    kept = []
    for j in order:
        if not np.isfinite(scores[j]):
            continue
        ok = True
        for i in kept:
            if cats is not None and cats[i] != cats[j]:
                continue
            iou = np.asarray(box_iou(jnp.asarray(boxes[i:i + 1]),
                                     jnp.asarray(boxes[j:j + 1])))[0, 0]
            if iou > thresh:
                ok = False
                break
        if ok:
            keep[j] = True
            kept.append(j)
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nms_matches_naive(seed):
    rng = np.random.RandomState(seed)
    N = 40
    xy = rng.rand(N, 2) * 40
    wh = rng.rand(N, 2) * 30 + 2
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.rand(N).astype(np.float32)
    scores[:3] = -np.inf  # dead slots
    cats = rng.randint(0, 3, N)
    got = np.asarray(nms_keep(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                              idx_cat=jnp.asarray(cats)))
    want = naive_nms(boxes, scores, 0.5, cats)
    np.testing.assert_array_equal(got, want)
    got_nc = np.asarray(nms_keep(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    np.testing.assert_array_equal(got_nc, naive_nms(boxes, scores, 0.5))


# --------------------------------------------------------------------------- #
# Box transform roundtrip
# --------------------------------------------------------------------------- #


def test_box_deltas_roundtrip():
    rng = np.random.RandomState(1)
    src = np.abs(rng.rand(20, 2) * 50)
    src = np.concatenate([src, src + rng.rand(20, 2) * 40 + 1], -1)
    tgt = np.abs(rng.rand(20, 2) * 50)
    tgt = np.concatenate([tgt, tgt + rng.rand(20, 2) * 40 + 1], -1)
    w = (10.0, 10.0, 5.0, 5.0)
    d = get_deltas(jnp.asarray(src), jnp.asarray(tgt), w)
    back = apply_deltas(d, jnp.asarray(src), w)
    np.testing.assert_allclose(np.asarray(back), tgt, rtol=1e-4, atol=1e-3)


# --------------------------------------------------------------------------- #
# ConvTranspose conversion vs torch scatter semantics
# --------------------------------------------------------------------------- #


def test_conv_transpose_conversion_matches_torch():
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    from unilm_tpu.convert.detection import conv_transpose_nhwc

    torch.manual_seed(0)
    m = torch.nn.ConvTranspose2d(3, 5, kernel_size=2, stride=2)
    x = torch.randn(2, 3, 4, 6)
    want = m(x).detach().numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    sd = {"w.weight": m.weight, "w.bias": m.bias}
    p = conv_transpose_nhwc(sd, "w")
    mod = nn.ConvTranspose(5, (2, 2), strides=(2, 2))
    got = mod.apply({"params": p}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_frozen_bn_matches_torch_eval():
    torch = pytest.importorskip("torch")
    from unilm_tpu.convert.detection import frozen_bn
    from unilm_tpu.models.rcnn import FrozenBN

    torch.manual_seed(1)
    bn = torch.nn.BatchNorm2d(4)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.uniform_(-1, 1)
    bn.running_mean.uniform_(-1, 1)
    bn.running_var.uniform_(0.5, 2.0)
    bn.eval()
    x = torch.randn(2, 4, 3, 3)
    want = bn(x).detach().numpy().transpose(0, 2, 3, 1)
    p = frozen_bn({"b.weight": bn.weight, "b.bias": bn.bias,
                   "b.running_mean": bn.running_mean,
                   "b.running_var": bn.running_var}, "b")
    got = FrozenBN().apply({"params": p},
                           jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_fc_on_pooled_matches_torch_flatten():
    torch = pytest.importorskip("torch")
    from unilm_tpu.convert.detection import fc_on_pooled

    torch.manual_seed(2)
    C, res, out = 4, 3, 6
    fc = torch.nn.Linear(C * res * res, out)
    pooled = torch.randn(5, C, res, res)
    want = fc(pooled.flatten(1)).detach().numpy()
    p = fc_on_pooled({"f.weight": fc.weight, "f.bias": fc.bias}, "f", C, res)
    x_nhwc = pooled.numpy().transpose(0, 2, 3, 1).reshape(5, -1)
    got = x_nhwc @ p["kernel"] + p["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------- #
# End-to-end tiny model
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_cfg()
    model = CascadeRCNN(cfg)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    return cfg, model, params


@pytest.mark.slow
def test_rcnn_forward_shapes(tiny_model):
    cfg, model, params = tiny_model
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    out = model.apply({"params": params}, imgs)
    D = cfg.detections_per_image
    assert out["boxes"].shape == (1, D, 4)
    assert out["scores"].shape == (1, D)
    assert out["classes"].shape == (1, D)
    assert out["valid"].shape == (1, D)
    assert out["masks"].shape == (1, D, 28, 28)
    assert bool(jnp.all(jnp.isfinite(out["boxes"])))
    # all emitted boxes inside the image
    assert float(out["boxes"].min()) >= 0.0
    assert float(out["boxes"].max()) <= 64.0


def build_synthetic_sd(cfg, seed=0):
    """Synthetic detectron2-layout Cascade/Mask R-CNN state dict matching
    `cfg` (the exact key/tensor layout convert_rcnn consumes). Shared by the
    shape-roundtrip test below and the full-graph numeric-parity oracle in
    test_rcnn_fullgraph.py."""
    import torch

    E, C, F = cfg.beit.embed_dim, cfg.fpn_channels, cfg.beit.ffn_dim
    A, ncls, fc = cfg.num_anchors, cfg.num_classes, cfg.fc_dim
    ps = cfg.beit.patch_size
    g = torch.Generator().manual_seed(seed)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {}
    B = "backbone.bottom_up.backbone"
    sd[f"{B}.cls_token"] = t(1, 1, E)
    sd[f"{B}.pos_embed"] = t(1, cfg.beit.num_patches + 1, E)
    sd[f"{B}.patch_embed.proj.weight"] = t(E, 3, ps, ps)
    sd[f"{B}.patch_embed.proj.bias"] = t(E)
    for i in range(cfg.beit.num_layers):
        p = f"{B}.blocks.{i}"
        sd[f"{p}.norm1.weight"] = 1.0 + t(E)
        sd[f"{p}.norm1.bias"] = t(E)
        sd[f"{p}.norm2.weight"] = 1.0 + t(E)
        sd[f"{p}.norm2.bias"] = t(E)
        sd[f"{p}.attn.qkv.weight"] = t(3 * E, E)
        sd[f"{p}.attn.q_bias"] = t(E)
        sd[f"{p}.attn.v_bias"] = t(E)
        sd[f"{p}.attn.proj.weight"] = t(E, E)
        sd[f"{p}.attn.proj.bias"] = t(E)
        sd[f"{p}.mlp.fc1.weight"] = t(F, E)
        sd[f"{p}.mlp.fc1.bias"] = t(F)
        sd[f"{p}.mlp.fc2.weight"] = t(E, F)
        sd[f"{p}.mlp.fc2.bias"] = t(E)
        sd[f"{p}.gamma_1"] = t(E)
        sd[f"{p}.gamma_2"] = t(E)
    sd[f"{B}.fpn1.0.weight"] = t(E, E, 2, 2)
    sd[f"{B}.fpn1.0.bias"] = t(E)
    # non-identity running stats so the oracle catches swapped BN fields
    sd[f"{B}.fpn1.1.weight"] = 1.0 + t(E)
    sd[f"{B}.fpn1.1.bias"] = t(E)
    sd[f"{B}.fpn1.1.running_mean"] = t(E)
    sd[f"{B}.fpn1.1.running_var"] = 1.0 + torch.rand(E, generator=g) * 0.5
    sd[f"{B}.fpn1.3.weight"] = t(E, E, 2, 2)
    sd[f"{B}.fpn1.3.bias"] = t(E)
    sd[f"{B}.fpn2.0.weight"] = t(E, E, 2, 2)
    sd[f"{B}.fpn2.0.bias"] = t(E)
    for lvl in range(2, 6):
        sd[f"backbone.fpn_lateral{lvl}.weight"] = t(C, E, 1, 1)
        sd[f"backbone.fpn_lateral{lvl}.bias"] = t(C)
        sd[f"backbone.fpn_output{lvl}.weight"] = t(C, C, 3, 3)
        sd[f"backbone.fpn_output{lvl}.bias"] = t(C)
    sd["proposal_generator.rpn_head.conv.weight"] = t(C, C, 3, 3)
    sd["proposal_generator.rpn_head.conv.bias"] = t(C)
    sd["proposal_generator.rpn_head.objectness_logits.weight"] = t(A, C, 1, 1)
    sd["proposal_generator.rpn_head.objectness_logits.bias"] = t(A)
    sd["proposal_generator.rpn_head.anchor_deltas.weight"] = t(4 * A, C, 1, 1)
    sd["proposal_generator.rpn_head.anchor_deltas.bias"] = t(4 * A)
    for k in range(len(cfg.cascade_ious)):
        sd[f"roi_heads.box_head.{k}.fc1.weight"] = t(fc, C * 7 * 7)
        sd[f"roi_heads.box_head.{k}.fc1.bias"] = t(fc)
        sd[f"roi_heads.box_head.{k}.fc2.weight"] = t(fc, fc)
        sd[f"roi_heads.box_head.{k}.fc2.bias"] = t(fc)
        sd[f"roi_heads.box_predictor.{k}.cls_score.weight"] = t(ncls + 1, fc)
        sd[f"roi_heads.box_predictor.{k}.cls_score.bias"] = t(ncls + 1)
        sd[f"roi_heads.box_predictor.{k}.bbox_pred.weight"] = t(4, fc)
        sd[f"roi_heads.box_predictor.{k}.bbox_pred.bias"] = t(4)
    if cfg.mask_on:
        for i in range(1, 5):
            sd[f"roi_heads.mask_head.mask_fcn{i}.weight"] = t(C, C, 3, 3)
            sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = t(C)
        sd["roi_heads.mask_head.deconv.weight"] = t(C, C, 2, 2)
        sd["roi_heads.mask_head.deconv.bias"] = t(C)
        sd["roi_heads.mask_head.predictor.weight"] = t(ncls, C, 1, 1)
        sd["roi_heads.mask_head.predictor.bias"] = t(ncls)
    return sd


@pytest.mark.slow
def test_rcnn_convert_synthetic_roundtrip(tiny_model):
    """Build a synthetic detectron2-layout state dict, convert, and check
    the result is tree-compatible with flax init (exact shapes) and the
    forward runs on it. (Full-graph numeric parity vs a torch+numpy oracle
    lives in test_rcnn_fullgraph.py.)"""
    pytest.importorskip("torch")
    from unilm_tpu.convert.detection import convert_rcnn

    cfg, model, params = tiny_model
    sd = build_synthetic_sd(cfg)
    converted = convert_rcnn(sd, cfg)
    # exact tree/shape compatibility with flax init
    ref_shapes = jax.tree.map(lambda x: x.shape, params)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, converted)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    assert jax.tree.all(jax.tree.map(lambda a, b: a == b,
                                     ref_shapes, got_shapes))
    imgs = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    out = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted)}, imgs)
    assert bool(jnp.all(jnp.isfinite(out["scores"])))


@pytest.mark.slow
def test_rcnn_loss_finite_and_grads_flow(tiny_model):
    cfg, model, params = tiny_model
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
    gt_boxes = jnp.asarray([[[8.0, 8.0, 32.0, 40.0], [20.0, 4.0, 60.0, 28.0],
                             [0.0, 0.0, 0.0, 0.0]]])
    gt_classes = jnp.asarray([[0, 2, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, True, False]])
    gt_masks = jnp.asarray(rng.rand(1, 3, 64, 64) > 0.5)

    def loss_fn(p):
        loss, metrics = rcnn_loss(model, p, imgs, gt_boxes, gt_classes,
                                  gt_valid, jax.random.PRNGKey(0), gt_masks)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0
    # every head received gradient signal
    for part in ("rpn_head", "box_head_0", "box_head_2", "mask_head", "vit"):
        sub = jax.tree.leaves(grads[part])
        assert any(float(jnp.abs(g).max()) > 0 for g in sub), part
