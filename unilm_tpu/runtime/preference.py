"""PFPO: pseudo-feedback preference construction + DPO-family losses.

Capability-equivalent of the reference's PFPO project (PFPO/models/llama.py:52
dpo_loss — sigmoid/hinge/IPO variants with label smoothing;
PFPO/models/dpo_utils.py:48 llama_dpo_batch_forward — masked sequence
log-probs; PFPO/post_processors/dpo.py — pseudo-feedback labeling of sampled
solutions by self-consistency / test-case execution and process-reward
aggregation). The LLM sampling itself is external (the reference calls
vLLM/OpenAI); what belongs in the compute framework is:

- masked sequence log-prob extraction from decoder logits (jit-friendly),
- the preference losses (DPO sigmoid / hinge / IPO, reference-free mode),
- host-side pair construction from sampled solutions + pseudo labels.
"""

from __future__ import annotations

import collections
import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# Sequence log-probs (dpo_utils.llama_dpo_batch_forward:48-75)
# --------------------------------------------------------------------------- #


def sequence_log_probs(
    logits: jax.Array,  # [B, T, V]
    labels: jax.Array,  # [B, T] next-token targets aligned to logits[:, :-1]
    loss_mask: jax.Array,  # [B, T-1] bool True = response token
    average: bool = False,
) -> jax.Array:
    """Sum (or mean) of per-token log-probs over the response span: [B]."""
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = labels[:, 1:]
    per_tok = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = loss_mask.astype(jnp.float32)
    s = jnp.sum(per_tok * m, axis=-1)
    if average:
        return s / jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    return s


def dpo_loss(
    policy_chosen_logps: jax.Array,  # [B]
    policy_rejected_logps: jax.Array,
    reference_chosen_logps: Optional[jax.Array] = None,
    reference_rejected_logps: Optional[jax.Array] = None,
    beta: float = 0.1,
    loss_type: str = "sigmoid",  # sigmoid | hinge | ipo
    label_smoothing: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (mean loss, chosen_rewards, rejected_rewards); reference-free
    when reference logps are None (PFPO/models/llama.py:52-97)."""
    pi = policy_chosen_logps - policy_rejected_logps
    if reference_chosen_logps is None:
        ref = 0.0
        reference_chosen_logps = jnp.zeros_like(policy_chosen_logps)
        reference_rejected_logps = jnp.zeros_like(policy_rejected_logps)
    else:
        ref = reference_chosen_logps - reference_rejected_logps
    z = pi - ref
    if loss_type == "ipo":
        losses = (z - 1.0 / (2.0 * beta)) ** 2
    elif loss_type == "hinge":
        losses = jax.nn.relu(1.0 - beta * z)
    elif loss_type == "sigmoid":
        losses = -jax.nn.log_sigmoid(beta * z) * (1.0 - label_smoothing) - (
            jax.nn.log_sigmoid(-beta * z) * label_smoothing
        )
    else:
        raise ValueError(f"unsupported loss_type {loss_type!r}")
    chosen_r = beta * jax.lax.stop_gradient(
        policy_chosen_logps - reference_chosen_logps
    )
    rejected_r = beta * jax.lax.stop_gradient(
        policy_rejected_logps - reference_rejected_logps
    )
    return jnp.mean(losses), chosen_r, rejected_r


# --------------------------------------------------------------------------- #
# Pseudo-feedback pair construction (host side; post_processors/dpo.py)
# --------------------------------------------------------------------------- #


@dataclasses.dataclass
class SampledSolution:
    text: str
    answer: Optional[str] = None  # extracted final answer (self-consistency)
    pass_frac: Optional[float] = None  # fraction of test cases passed


def majority_answer(solutions: Sequence[SampledSolution]) -> Optional[str]:
    """Self-consistency pseudo label: the most common non-empty answer."""
    counts = collections.Counter(
        s.answer for s in solutions if s.answer not in (None, "")
    )
    if not counts:
        return None
    return counts.most_common(1)[0][0]


def build_preference_pairs(
    solutions: Sequence[SampledSolution],
    strategy: str = "self_consistency",  # or "test_cases"
    max_pairs: int = 8,
    min_margin: float = 0.5,
) -> List[Tuple[str, str]]:
    """(chosen, rejected) text pairs for one problem.

    self_consistency: solutions agreeing with the majority answer are chosen,
    disagreeing ones rejected. test_cases: rank by pass_frac; pair high
    against low when the margin exceeds `min_margin`.
    """
    pairs: List[Tuple[str, str]] = []
    if strategy == "self_consistency":
        label = majority_answer(solutions)
        if label is None:
            return []
        pos = [s for s in solutions if s.answer == label]
        neg = [s for s in solutions if s.answer not in (None, "", label)]
        for i in range(min(max_pairs, len(pos) * len(neg))):
            pairs.append((pos[i % len(pos)].text, neg[i // len(pos)].text))
    elif strategy == "test_cases":
        scored = [s for s in solutions if s.pass_frac is not None]
        scored.sort(key=lambda s: s.pass_frac, reverse=True)
        i, j = 0, len(scored) - 1
        while i < j and len(pairs) < max_pairs:
            if scored[i].pass_frac - scored[j].pass_frac >= min_margin:
                pairs.append((scored[i].text, scored[j].text))
                i += 1
                j -= 1
            else:
                break
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return pairs


def aggregate_process_rewards(
    step_probs: Sequence[float], reduction: str = "product"
) -> float:
    """Collapse per-step process-reward probabilities into one scalar
    (ResponseProcessRewardPostProcessor, post_processors/dpo.py:298)."""
    if not step_probs:
        return 0.0
    if reduction == "product":
        out = 1.0
        for p in step_probs:
            out *= p
        return out
    if reduction == "min":
        return min(step_probs)
    if reduction == "mean":
        return sum(step_probs) / len(step_probs)
    raise ValueError(f"unknown reduction {reduction!r}")
