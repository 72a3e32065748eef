"""COCO-style mAP evaluation (numpy, host-side).

Capability-equivalent of the reference's detectron2 COCOEvaluator used by
dit/object_detection (mytrainer.py build_evaluator -> COCO mAP tables in
dit/README.md:66-99) and dit/text_detection/ditod/funsd_evaluation.py.
Implements the COCO AP protocol: per-class, per-IoU-threshold greedy
matching of score-sorted detections against ground truth, 101-point
interpolated precision, averaged over IoU .50:.05:.95 ('all' area range,
maxDets=100).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRESHS = np.arange(0.5, 1.0, 0.05)


def box_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of [N,4] x [M,4] xyxy boxes."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    ix = np.maximum(
        0.0,
        np.minimum(a[:, None, 2], b[None, :, 2])
        - np.maximum(a[:, None, 0], b[None, :, 0]),
    )
    iy = np.maximum(
        0.0,
        np.minimum(a[:, None, 3], b[None, :, 3])
        - np.maximum(a[:, None, 1], b[None, :, 1]),
    )
    inter = ix * iy
    area = lambda x: np.maximum(0.0, x[:, 2] - x[:, 0]) * np.maximum(
        0.0, x[:, 3] - x[:, 1]
    )
    union = area(a)[:, None] + area(b)[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def _ap_from_matches(scores, matched, num_gt) -> float:
    """101-point interpolated AP given per-detection (score, matched) pairs."""
    if num_gt == 0:
        return np.nan
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp = matched[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / num_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    # precision envelope (monotone non-increasing from the right)
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    # 101-point interpolation
    rec_points = np.linspace(0.0, 1.0, 101)
    idx = np.searchsorted(recall, rec_points, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(np.mean(prec_at))


def evaluate_detections(
    predictions: Sequence[Dict],  # per image: boxes [N,4], scores [N], labels [N]
    ground_truth: Sequence[Dict],  # per image: boxes [M,4], labels [M]
    num_classes: int,
    max_dets: int = 100,
) -> Dict[str, float]:
    """Returns {'mAP', 'AP50', 'AP75', 'AP_class_<c>'...} (COCO protocol)."""
    assert len(predictions) == len(ground_truth)
    ap = np.full((len(IOU_THRESHS), num_classes), np.nan)

    for c in range(num_classes):
        num_gt = sum(int(np.sum(g["labels"] == c)) for g in ground_truth)
        for ti, thr in enumerate(IOU_THRESHS):
            all_scores, all_matched = [], []
            for pred, gt in zip(predictions, ground_truth):
                sel = pred["labels"] == c
                boxes = np.asarray(pred["boxes"])[sel]
                scores = np.asarray(pred["scores"])[sel]
                order = np.argsort(-scores, kind="stable")[:max_dets]
                boxes, scores = boxes[order], scores[order]
                gsel = np.asarray(gt["labels"]) == c
                gboxes = np.asarray(gt["boxes"])[gsel]
                ious = box_iou_np(boxes, gboxes)
                taken = np.zeros(len(gboxes), bool)
                matched = np.zeros(len(boxes), bool)
                for di in range(len(boxes)):
                    if len(gboxes) == 0:
                        break
                    j = int(np.argmax(np.where(taken, -1.0, ious[di])))
                    if not taken[j] and ious[di, j] >= thr:
                        taken[j] = True
                        matched[di] = True
                all_scores.append(scores)
                all_matched.append(matched)
            scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
            matched = np.concatenate(all_matched) if all_matched else np.zeros(0, bool)
            ap[ti, c] = _ap_from_matches(scores, matched, num_gt)

    with np.errstate(invalid="ignore"):
        per_class = np.nanmean(ap, axis=0)
        result = {
            "mAP": float(np.nanmean(ap)),
            "AP50": float(np.nanmean(ap[0])),
            "AP75": float(np.nanmean(ap[5])),
        }
    for c in range(num_classes):
        if not np.isnan(per_class[c]):
            result[f"AP_class_{c}"] = float(per_class[c])
    return result
