"""Grounding evaluation metrics (Kosmos-2 eval harnesses).

Capability-equivalent of the reference's eval scripts:
- kosmos-2/evaluation/flickr_entities — phrase-grounding R@1/5/10 over
  generated grounded captions (a predicted phrase's top-k boxes vs the
  phrase's ground-truth boxes at IoU 0.5).
- kosmos-2/evaluation/refcoco — referring-expression accuracy: the
  generated box for a forced <phrase>expr</phrase> prefix vs the GT box
  at IoU 0.5.
- kosmos-2/demo/decode_string.py — grounded-markup parsing lives in
  data/grounding.py (parse_grounded_text); this module turns parsed
  entities into scored predictions.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from unilm_tpu.data.grounding import parse_grounded_text
from unilm_tpu.scoring_detection import box_iou_np


def _norm_phrase(p: str) -> str:
    return " ".join(p.lower().strip().split())


def grounded_text_to_predictions(
    text: str, quantized_size: int = 32
) -> List[Tuple[str, List[List[float]]]]:
    """Generated markup -> [(normalized phrase, [normalized boxes])]."""
    _, entities = parse_grounded_text(text, quantized_size)
    return [(_norm_phrase(ph), [list(b) for b in boxes]) for ph, boxes in entities]


def phrase_grounding_recall(
    predictions: Sequence[Sequence[Tuple[str, List[List[float]]]]],
    ground_truth: Sequence[Sequence[Tuple[str, List[List[float]]]]],
    ks: Tuple[int, ...] = (1, 5, 10),
    iou_thresh: float = 0.5,
) -> Dict[str, float]:
    """Flickr-entities protocol: for every GT phrase with boxes, find the
    predicted entity with the same (normalized) phrase; hit@k when any of
    its first k boxes reaches IoU >= 0.5 with any GT box for the phrase.
    Returns {'R@1': .., 'R@5': .., 'R@10': .., 'num_phrases': ..}."""
    hits = {k: 0 for k in ks}
    total = 0
    for preds, gts in zip(predictions, ground_truth):
        pred_by_phrase: Dict[str, List[List[float]]] = {}
        for ph, boxes in preds:
            pred_by_phrase.setdefault(_norm_phrase(ph), []).extend(boxes)
        for ph, gt_boxes in gts:
            if not gt_boxes:
                continue
            total += 1
            cand = pred_by_phrase.get(_norm_phrase(ph), [])
            if not cand:
                continue
            ious = box_iou_np(np.asarray(cand, np.float64),
                              np.asarray(gt_boxes, np.float64))
            best_per_rank = ious.max(axis=1)
            for k in ks:
                if len(best_per_rank[:k]) and best_per_rank[:k].max() >= iou_thresh:
                    hits[k] += 1
    out = {f"R@{k}": (hits[k] / total if total else 0.0) for k in ks}
    out["num_phrases"] = float(total)
    return out


def refexp_accuracy(
    pred_boxes: Sequence[Sequence[float]],
    gt_boxes: Sequence[Sequence[float]],
    iou_thresh: float = 0.5,
) -> Dict[str, float]:
    """RefCOCO protocol: top-1 predicted box vs GT box, acc at IoU 0.5.
    A None/empty prediction counts as a miss."""
    correct, total = 0, 0
    for pb, gb in zip(pred_boxes, gt_boxes):
        total += 1
        if pb is None or len(pb) != 4:
            continue
        iou = box_iou_np(
            np.asarray([pb], np.float64), np.asarray([gb], np.float64)
        )[0, 0]
        if iou >= iou_thresh:
            correct += 1
    return {"accuracy": correct / total if total else 0.0, "num_refs": float(total)}
