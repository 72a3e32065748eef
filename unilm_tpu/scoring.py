"""Evaluation scorers: CER/WER (TrOCR), BLEU, entity-span F1 (FUNSD).

Equivalents of trocr/scoring.py (--scoring cer2/wer), fairseq libbleu
scorer, and the seqeval P/R/F1 used by layoutlmv3 run_funsd_cord.py:421.
Edit distances and n-gram counting run in native C++ (unilm_tpu.native)."""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

from unilm_tpu import native


def _to_ids(s: Sequence) -> np.ndarray:
    if isinstance(s, str):
        return np.asarray([ord(c) for c in s], np.int32)
    table: Dict = {}
    return np.asarray([table.setdefault(t, len(table)) for t in s], np.int32)


def _pair_ids(a: Sequence, b: Sequence) -> Tuple[np.ndarray, np.ndarray]:
    if isinstance(a, str) and isinstance(b, str):
        return _to_ids(a), _to_ids(b)
    table: Dict = {}
    ia = np.asarray([table.setdefault(t, len(table)) for t in a], np.int32)
    ib = np.asarray([table.setdefault(t, len(table)) for t in b], np.int32)
    return ia, ib


def cer(refs: List[str], hyps: List[str]) -> float:
    """Character error rate = sum(edit) / sum(ref chars) (trocr cer2)."""
    dist = 0
    total = 0
    pairs = [( _to_ids(r), _to_ids(h)) for r, h in zip(refs, hyps)]
    dists = native.edit_distance_batch([p[0] for p in pairs], [p[1] for p in pairs])
    for (r, _), d in zip(pairs, dists):
        dist += int(d)
        total += len(r)
    return dist / max(total, 1)


def wer(refs: List[str], hyps: List[str]) -> float:
    dist = 0
    total = 0
    for r, h in zip(refs, hyps):
        ra, ha = _pair_ids(r.split(), h.split())
        dist += native.edit_distance(ra, ha)
        total += len(ra)
    return dist / max(total, 1)


class BleuScorer:
    """Corpus BLEU-4 with brevity penalty (libbleu semantics)."""

    def __init__(self):
        self.counts = np.zeros(8, np.int64)
        self.ref_len = 0
        self.hyp_len = 0

    def add(self, ref: Sequence[int], hyp: Sequence[int]):
        ref = np.asarray(ref, np.int32)
        hyp = np.asarray(hyp, np.int32)
        native.bleu_counts(ref, hyp, self.counts)
        self.ref_len += len(ref)
        self.hyp_len += len(hyp)

    def add_string(self, ref: str, hyp: str):
        table: Dict = {}
        enc = lambda s: [table.setdefault(w, len(table)) for w in s.split()]
        self.add(enc(ref), enc(hyp))

    def score(self) -> float:
        logs = 0.0
        for n in range(4):
            match, total = self.counts[2 * n], self.counts[2 * n + 1]
            if total == 0 or match == 0:
                return 0.0
            logs += math.log(match / total)
        bp = min(0.0, 1.0 - self.ref_len / max(self.hyp_len, 1))
        return 100.0 * math.exp(logs / 4.0 + bp)


def extract_entities(labels: List[str]) -> set:
    """IOB2 span extraction, seqeval-compatible: returns {(type, start, end)}."""
    spans = set()
    start, typ = None, None
    for i, lab in enumerate(labels + ["O"]):
        tag, _, t = lab.partition("-")
        if start is not None and (tag in ("O", "B") or (tag == "I" and t != typ)):
            spans.add((typ, start, i))
            start, typ = None, None
        if tag == "B" or (tag == "I" and start is None):
            start, typ = i, t
    return spans


def entity_f1(true: List[List[str]], pred: List[List[str]]) -> Dict[str, float]:
    """seqeval micro P/R/F1 over entity spans (run_funsd_cord.py:421)."""
    tp = fp = fn = 0
    for t, p in zip(true, pred):
        ts, ps = extract_entities(t), extract_entities(p)
        tp += len(ts & ps)
        fp += len(ps - ts)
        fn += len(ts - ps)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return {"precision": prec, "recall": rec, "f1": f1}


def accuracy_topk(logits: np.ndarray, labels: np.ndarray, topk=(1, 5)) -> Dict[str, float]:
    """ImageNet top-k accuracy (beit/utils.py:403)."""
    order = np.argsort(-logits, axis=-1)
    out = {}
    for k in topk:
        correct = (order[:, :k] == labels[:, None]).any(axis=1)
        out[f"acc{k}"] = float(correct.mean()) * 100.0
    return out


def box_iou(a, b) -> float:
    """IoU of two (x0, y0, x1, y1) boxes."""
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix1 - ix0, 0.0) * max(iy1 - iy0, 0.0)
    area = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / area if area > 0 else 0.0


def grounding_recall(
    predictions: List[List[Tuple[float, float, float, float]]],
    references: List[Tuple[float, float, float, float]],
    iou_threshold: float = 0.5,
    topk: int = 1,
) -> float:
    """R@k for phrase grounding (kosmos-2 flickr/refcoco evaluation
    harnesses): prediction i's top-k boxes vs reference box i."""
    hit = 0
    for preds, ref in zip(predictions, references):
        if any(box_iou(p, ref) >= iou_threshold for p in preds[:topk]):
            hit += 1
    return hit / max(len(references), 1)
