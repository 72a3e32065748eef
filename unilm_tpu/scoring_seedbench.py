"""SEED-Bench multiple-choice evaluation by answer log-likelihood ranking.

Capability-equivalent of kosmos-2/evaluation/seed-bench/{cook_image_data.py,
eval_ppl.py}: each question expands to one candidate sequence per choice
("Question: {q} Answer: {choice}"), every candidate is scored by the MEAN
per-token log-probability of its answer segment (eval_ppl.py:66-70 averages
the P- scores from the answer index on), and the argmax choice is compared
to ground truth; accuracy is reported overall and per question type
(eval_ppl.py:88-115).

TPU-native redesign: instead of fairseq's generate-loop emitting H-/P- lines
that a second script re-parses, all N*4 candidates are packed into ONE
static-shape batch, scored by a single jitted forward pass, and reduced with
a masked segment mean — the ranking then happens in numpy.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CHOICE_LETTERS = "ABCDEF"  # eval_ppl.py:78 answer_map_dict


def answer_span_logprob(
    logits: jax.Array,  # [B, T, V] full-sequence logits
    tokens: jax.Array,  # [B, T] int32
    answer_mask: jax.Array,  # [B, T] 1.0 where tokens[t] is an answer token
) -> jax.Array:
    """Mean next-token log-prob over each row's answer segment.

    Position t of the answer mask marks token t as part of the answer, so the
    contributing logit is logits[t-1] — the same alignment eval_ppl.py uses by
    slicing P- scores from `answer_index - 1`.
    """
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = answer_mask[:, 1:].astype(jnp.float32)
    return jnp.sum(tok_lp * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)


def rank_choices(scores: np.ndarray) -> np.ndarray:
    """[N, C] scores -> [N] predicted choice indices (ties -> first, matching
    list.index(max) in eval_ppl.py:84)."""
    return np.asarray(scores).argmax(axis=-1)


def seedbench_accuracy(
    scores: np.ndarray,  # [N, C] per-choice answer logprobs
    answers: Sequence[int],  # [N] ground-truth choice indices
    question_types: Optional[Sequence[str]] = None,
) -> Dict:
    """Overall + per-question-type accuracy (eval_ppl.py:88-115)."""
    pred = rank_choices(scores)
    answers = np.asarray(answers)
    correct = pred == answers
    out = {
        "accuracy": float(correct.mean()) if len(correct) else 0.0,
        "total": int(len(correct)),
        "correct": int(correct.sum()),
        "predictions": [CHOICE_LETTERS[int(p)] for p in pred],
    }
    if question_types is not None:
        per: Dict[str, List[bool]] = defaultdict(list)
        for t, c in zip(question_types, correct):
            per[str(t)].append(bool(c))
        out["per_type"] = {
            t: {"accuracy": float(np.mean(v)), "total": len(v)}
            for t, v in sorted(per.items())
        }
    return out


def cook_candidates(
    question: str, choices: Sequence[str]
) -> List[Tuple[str, str]]:
    """One (prompt, answer) text pair per choice — cook_image_data.py:43
    'Question: {q} Answer: {choice}' with the answer segment separated so the
    caller can mask scoring to it."""
    q = " ".join(question.split())
    return [(f"Question: {q} Answer:", " " + " ".join(c.split()))
            for c in choices]
