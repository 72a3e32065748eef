"""Detection task layer: FCOS head, assignment, NMS decode, COCO mAP.

Covers the capability of dit/object_detection/ditod (RCNN task layer +
COCO eval) via the TPU-native single-stage re-design."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.data.detection import (
    load_coco_json,
    pad_batch,
    synthetic_detection_dataset,
)
from unilm_tpu.models.detection_head import (
    FCOSConfig,
    FCOSDetector,
    decode_detections,
    dit_base_detection,
    fcos_loss,
    fcos_targets,
    level_locations,
)
from unilm_tpu.scoring_detection import box_iou_np, evaluate_detections


def tiny_cfg(num_classes=3, img=64):
    from unilm_tpu.models.beit import BeitConfig
    from unilm_tpu.models.detection import ViTDetBackboneConfig

    beit = BeitConfig(
        img_size=img, embed_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
        use_mean_pooling=False,
    )
    return FCOSConfig(
        backbone=ViTDetBackboneConfig(beit=beit, out_channels=32),
        num_classes=num_classes, tower_convs=1, tower_channels=32,
    )


def test_target_assignment_single_box():
    cfg = tiny_cfg()
    locs = level_locations(cfg, 64)
    # one 24x24 box centered at (32, 32): max side distance 12 -> level p2
    boxes = jnp.asarray([[[20.0, 20.0, 44.0, 44.0]]])
    labels = jnp.asarray([[2]])
    valid = jnp.ones((1, 1), bool)
    cls_t, box_t, ctr_t = fcos_targets(locs, boxes, labels, valid)
    cls_t = np.asarray(cls_t)[0]
    pos = cls_t >= 0
    assert pos.sum() > 0
    assert set(np.unique(cls_t[pos])) == {2}
    # all positives must be p2 locations near the center (center sampling)
    lev = np.asarray(locs["level"])
    assert set(np.unique(lev[pos])) == {0}
    xy = np.asarray(locs["xy"])[pos]
    assert np.all(np.abs(xy - 32.0) <= 1.5 * 4 + 2.0)
    # centerness peaks near the center (grid centers are offset by stride/2,
    # so the max is sqrt(14/18 * 14/18) ~= 0.71 here, not 1.0)
    ctr = np.asarray(ctr_t)[0]
    assert ctr[pos].max() > 0.7
    assert ctr[pos].max() == ctr.max()


def test_targets_respect_validity_mask():
    cfg = tiny_cfg()
    locs = level_locations(cfg, 64)
    boxes = jnp.asarray([[[20.0, 20.0, 44.0, 44.0]]])
    labels = jnp.asarray([[1]])
    cls_t, _, _ = fcos_targets(locs, boxes, labels, jnp.zeros((1, 1), bool))
    assert int(jnp.sum(cls_t >= 0)) == 0


def test_loss_decreases_on_fixed_batch():
    import optax

    from unilm_tpu.runtime.train import TrainState, make_train_step

    cfg = tiny_cfg()
    model = FCOSDetector(cfg)
    data = synthetic_detection_dataset(8, img_size=64, num_classes=3, seed=0)
    batch = {k: jnp.asarray(v) for k, v in pad_batch(data, 8).items()}
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["images"])["params"]

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch["images"])
        return fcos_loss(out, batch["boxes"], batch["labels"], batch["valid"], cfg)

    tx = optax.adam(3e-4)
    step = jax.jit(make_train_step(loss_fn, tx, clip_grad_norm=1.0))
    state = TrainState.create(params, tx)
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_decode_recovers_planted_boxes():
    """Perfect head outputs -> decode must return the GT boxes -> mAP 1.0."""
    cfg = tiny_cfg(num_classes=2)
    locs = level_locations(cfg, 64)
    gt_boxes = jnp.asarray(
        [[[8.0, 8.0, 28.0, 30.0], [34.0, 36.0, 60.0, 56.0]]]
    )
    gt_labels = jnp.asarray([[0, 1]])
    valid = jnp.ones((1, 2), bool)
    cls_t, box_t, ctr_t = fcos_targets(locs, gt_boxes, gt_labels, valid)
    L = cls_t.shape[1]
    pos = cls_t >= 0
    logits = jnp.where(
        (jax.nn.one_hot(jnp.maximum(cls_t, 0), 2) > 0) & pos[..., None],
        8.0, -8.0,
    )
    ctr = jnp.where(pos, 8.0, -8.0)
    outputs = {
        "logits": logits,
        "reg": box_t,
        "ctr": ctr,
        "locations": locs,
    }
    boxes, scores, labels, det_valid = decode_detections(
        outputs, score_thresh=0.3, nms_iou=0.5, max_dets=10, img_size=64.0
    )
    b, s, l, v = map(np.asarray, (boxes, scores, labels, det_valid))
    kept = b[0][v[0]]
    assert len(kept) == 2
    ious = box_iou_np(kept, np.asarray(gt_boxes[0]))
    # each GT matched by one kept box at high IoU, with the right class
    assert ious.max(axis=0).min() > 0.95
    preds = [{"boxes": kept, "scores": s[0][v[0]], "labels": l[0][v[0]]}]
    gts = [{"boxes": np.asarray(gt_boxes[0]), "labels": np.asarray(gt_labels[0])}]
    res = evaluate_detections(preds, gts, num_classes=2)
    assert res["mAP"] > 0.99


def test_map_evaluator_protocol():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30.0]]),
           "labels": np.array([0, 0])}]
    # one perfect hit + one miss + one false positive
    pred = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60.0]]),
             "scores": np.array([0.9, 0.8]),
             "labels": np.array([0, 0])}]
    res = evaluate_detections(pred, gt, num_classes=1)
    # recall caps at 0.5 with precision 1.0 up to there -> AP ~= 0.5 (101-pt)
    assert res["AP50"] == pytest.approx(0.5, abs=0.02)
    # duplicate detections of one GT: second counts as FP
    pred2 = [{"boxes": np.array([[0, 0, 10, 10], [0, 0, 10, 10.0]]),
              "scores": np.array([0.9, 0.8]),
              "labels": np.array([0, 0])}]
    res2 = evaluate_detections(pred2, gt, num_classes=1)
    assert res2["AP50"] == pytest.approx(0.5, abs=0.02)


def test_coco_json_roundtrip(tmp_path):
    coco = {
        "images": [{"id": 7, "width": 100, "height": 50, "file_name": "x.png"}],
        "annotations": [
            {"id": 1, "image_id": 7, "category_id": 11, "bbox": [10, 5, 30, 20]},
            {"id": 2, "image_id": 7, "category_id": 13, "bbox": [50, 10, 20, 30]},
        ],
        "categories": [{"id": 11, "name": "text"}, {"id": 13, "name": "table"}],
    }
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(coco))
    ex = load_coco_json(str(p), "", img_size=200)
    assert len(ex) == 1 and ex[0].image_id == 7
    # bbox scaled: x by 2, y by 4
    np.testing.assert_allclose(ex[0].boxes[0], [20, 20, 80, 100])
    assert list(ex[0].labels) == [0, 1]


def test_end_to_end_cli_smoke():
    from unilm_tpu.cli.train_detection import main

    state = main([
        "--synthetic", "--synthetic-n", "8", "--num-classes", "2",
        "--img-size", "64", "--batch-size", "4", "--steps", "2",
        "--tiny", "--eval",
    ])
    assert state is not None
