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


# --------------------------------------------------------------------------- #
# ICDAR-19 cTDaR weighted F1 (dit table detection protocol)
# --------------------------------------------------------------------------- #


def _icdar_oracle_tp(gt, pred, t):
    """Direct transcription of evaluate_result_reg (table_evaluation/
    evaluate.py:135-155): each GT takes the first remaining pred with
    IoU >= t, in list order."""
    remaining = list(range(len(pred)))
    tp = 0
    for g in gt:
        for ri in list(remaining):
            iou = box_iou_np(np.asarray([g]), np.asarray([pred[ri]]))[0, 0]
            if iou >= t:
                remaining.remove(ri)
                tp += 1
                break
    return tp


def test_icdar_table_wf1_matches_oracle():
    from unilm_tpu.scoring_detection import evaluate_icdar_table_detection

    rng = np.random.RandomState(0)
    preds, gts = [], []
    for _ in range(6):
        def boxes(n):
            xy = rng.rand(n, 2) * 80
            wh = rng.rand(n, 2) * 60 + 5
            return np.concatenate([xy, xy + wh], -1)
        g = boxes(rng.randint(0, 5))
        # half the preds are jittered copies of gt, half random
        jitter = g + rng.randn(*g.shape) * rng.choice([1.0, 8.0], (len(g), 1))
        p = np.concatenate([jitter, boxes(rng.randint(0, 4))]) \
            if len(g) else boxes(rng.randint(0, 4))
        preds.append(p)
        gts.append(g)

    res = evaluate_icdar_table_detection(preds, gts)
    f1s = []
    for t in (0.6, 0.7, 0.8, 0.9):
        tp = sum(_icdar_oracle_tp(g, p, t) for g, p in zip(gts, preds))
        n_gt = sum(len(g) for g in gts)
        n_res = sum(len(p) for p in preds)
        prec = tp / n_res if n_res else 0.0
        rec = tp / n_gt if n_gt else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        assert abs(res[f"f1@{t}"] - f1) < 1e-12, t
        f1s.append(f1)
    w = (0.6 * f1s[0] + 0.7 * f1s[1] + 0.8 * f1s[2] + 0.9 * f1s[3]) / 3.0
    assert abs(res["wF1"] - w) < 1e-12


def test_icdar_table_wf1_known_values():
    from unilm_tpu.scoring_detection import evaluate_icdar_table_detection

    gt = [np.asarray([[0, 0, 100, 100], [200, 200, 300, 300]])]
    # first pred: IoU 1.0 with gt0; second: IoU 0.83 with gt1; third: miss
    pred = [np.asarray([[0, 0, 100, 100], [200, 200, 300, 283],
                        [500, 500, 510, 510]])]
    res = evaluate_icdar_table_detection(pred, gt)
    f_two = 2 * (2 / 3) * 1.0 / (2 / 3 + 1.0)  # tp=2: p=2/3, r=1
    f_one = 2 * (1 / 3) * (1 / 2) / (1 / 3 + 1 / 2)  # tp=1 (0.83 < 0.9)
    assert res["f1@0.6"] == pytest.approx(f_two)
    assert res["f1@0.8"] == pytest.approx(f_two)
    assert res["f1@0.9"] == pytest.approx(f_one)
    assert res["wF1"] == pytest.approx(
        (0.6 * f_two + 0.7 * f_two + 0.8 * f_two + 0.9 * f_one) / 3.0)
    # perfect detector
    res2 = evaluate_icdar_table_detection(
        [gt[0].copy()], gt)
    assert res2["wF1"] == pytest.approx(1.0)


# --------------------------------------------------------------------------- #
# FUNSD text detection (ICDAR-2015 DetEval protocol)
# --------------------------------------------------------------------------- #


def _deteval_oracle(gts, preds, s):
    """Direct transcription of DetectionIoUEvaluator.evaluate_image +
    combine_results (concern/icdar2015_eval/detection/iou.py) with the
    FUNSDEvaluator score filter + int(x+0.5) rounding
    (funsd_evaluation.py:85-100), rect IoU."""
    matched_sum = care_gt = care_det = 0
    for gt, pred in zip(gts, preds):
        gb, gi = [], []
        for b, ign in zip(gt["boxes"], gt.get("ignore", [False] * len(gt["boxes"]))):
            if b[2] > b[0] and b[3] > b[1]:  # is_valid polygon
                gb.append(b)
                gi.append(ign)
        db = []
        for b, sc in zip(pred["boxes"], pred["scores"]):
            if sc < s:
                continue
            x0, y0, x1, y1 = (int(v + 0.5) for v in b)
            x0, x1 = min(x0, x1), max(x0, x1)
            y0, y1 = min(y0, y1), max(y0, y1)
            if x1 > x0 and y1 > y0:
                db.append([x0, y0, x1, y1])
        det_ignore = []
        for d in db:
            ig = False
            for b, ign in zip(gb, gi):
                if not ign:
                    continue
                ix = max(0, min(d[2], b[2]) - max(d[0], b[0]))
                iy = max(0, min(d[3], b[3]) - max(d[1], b[1]))
                area = (d[2] - d[0]) * (d[3] - d[1])
                if area > 0 and ix * iy / area > 0.5:
                    ig = True
                    break
            det_ignore.append(ig)
        g_taken = [False] * len(gb)
        d_taken = [False] * len(db)
        for a in range(len(gb)):
            for d in range(len(db)):
                if (not g_taken[a] and not d_taken[d] and not gi[a]
                        and not det_ignore[d]):
                    iou = box_iou_np(np.asarray([gb[a]], float),
                                     np.asarray([db[d]], float))[0, 0]
                    if iou > 0.5:
                        g_taken[a] = True
                        d_taken[d] = True
                        matched_sum += 1
        care_gt += sum(1 for x in gi if not x)
        care_det += sum(1 for x in det_ignore if not x)
    p = matched_sum / care_det if care_det else 0.0
    r = matched_sum / care_gt if care_gt else 0.0
    h = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, h


def test_funsd_text_detection_matches_oracle():
    from unilm_tpu.scoring_detection import evaluate_text_detection

    rng = np.random.RandomState(1)
    preds, gts = [], []
    for _ in range(5):
        n = rng.randint(1, 8)
        xy = rng.rand(n, 2) * 200
        wh = rng.rand(n, 2) * 60 + 4
        g = np.concatenate([xy, xy + wh], -1)
        ignore = rng.rand(n) < 0.25
        jit = g + rng.randn(n, 4) * rng.choice([0.5, 10.0], (n, 1))
        extra_xy = rng.rand(3, 2) * 200
        extra = np.concatenate([extra_xy, extra_xy + rng.rand(3, 2) * 50 + 4], -1)
        p = np.concatenate([jit, extra])
        scores = rng.rand(len(p))
        gts.append({"boxes": g, "ignore": ignore})
        preds.append({"boxes": p, "scores": scores})

    res = evaluate_text_detection(preds, gts)
    for s in (0.3, 0.5, 0.7, 0.9):
        p, r, h = _deteval_oracle(gts, preds, s)
        assert res[f"{s:.1f}_precision"] == pytest.approx(p, abs=1e-12), s
        assert res[f"{s:.1f}_recall"] == pytest.approx(r, abs=1e-12), s
        assert res[f"{s:.1f}_hmean"] == pytest.approx(h, abs=1e-12), s
    assert res["best_hmean"] == pytest.approx(
        max(res[f"{s:.1f}_hmean"] for s in (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)))
