"""SEED-Bench harness tests (kosmos-2/evaluation/seed-bench equivalents)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.scoring_seedbench import (
    answer_span_logprob,
    cook_candidates,
    rank_choices,
    seedbench_accuracy,
)


def test_answer_span_logprob_masks_to_answer():
    # Scripted logits: vocab 4; at answer positions the target token gets
    # high prob, at prompt positions the target gets low prob. Only the
    # answer segment must contribute.
    tokens = jnp.asarray([[1, 2, 3, 3, 0]], jnp.int32)
    amask = jnp.asarray([[0, 0, 1, 1, 0]], jnp.float32)
    logits = jnp.full((1, 5, 4), -10.0)
    # predictions for positions 1..4 come from logits[0..3]
    logits = logits.at[0, 1, 3].set(10.0)  # predicts tokens[2]=3 (answer)
    logits = logits.at[0, 2, 3].set(10.0)  # predicts tokens[3]=3 (answer)
    lp = answer_span_logprob(logits, tokens, amask)
    assert float(lp[0]) > -1e-3  # ~log(1)

    # corrupt a PROMPT position's logit: score must not move
    logits2 = logits.at[0, 0, 2].set(99.0)
    lp2 = answer_span_logprob(logits2, tokens, amask)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=1e-6)


def test_mean_normalizes_length():
    # A longer answer with identical per-token quality must tie, not lose.
    V = 4
    tokens = jnp.asarray([[1, 2, 0, 0], [1, 2, 2, 2]], jnp.int32)
    amask = jnp.asarray([[0, 1, 0, 0], [0, 1, 1, 1]], jnp.float32)
    logits = jnp.zeros((2, 4, V))  # uniform: per-token lp = -log V
    lp = np.asarray(answer_span_logprob(logits, tokens, amask))
    np.testing.assert_allclose(lp[0], lp[1], atol=1e-6)
    np.testing.assert_allclose(lp[0], -np.log(V), rtol=1e-5)


def test_accuracy_and_per_type():
    scores = np.asarray([
        [0.0, -1.0, -2.0, -3.0],   # pred A
        [-1.0, 0.0, -2.0, -3.0],   # pred B
        [-1.0, -2.0, -3.0, 0.0],   # pred D
    ])
    res = seedbench_accuracy(scores, [0, 1, 2], ["count", "count", "scene"])
    assert res["predictions"] == ["A", "B", "D"]
    assert res["correct"] == 2 and res["total"] == 3
    assert res["per_type"]["count"]["accuracy"] == 1.0
    assert res["per_type"]["scene"]["accuracy"] == 0.0
    # tie goes to the first index (eval_ppl.py list.index(max))
    assert rank_choices(np.zeros((1, 4)))[0] == 0


def test_cook_candidates_format():
    cands = cook_candidates("How many\ntowels?", ["One", "Two  plus"])
    assert cands[0] == ("Question: How many towels? Answer:", " One")
    assert cands[1][1] == " Two plus"


def _fixture(tmp_path, n=6):
    recs = []
    for i in range(n):
        recs.append({
            "image": None,
            "question": f"What is item {i}?",
            "choices": [f"opt{j}" for j in range(4)],
            "answer": "ABCD"[i % 4],
            "question_type": "even" if i % 2 == 0 else "odd",
        })
    path = tmp_path / "seed.jsonl"
    path.write_text("\n".join(json.dumps(r) for r in recs))
    return str(path), recs


def test_cli_oracle_self_check(tmp_path):
    from unilm_tpu.cli.kosmos_seedbench import main

    path, _ = _fixture(tmp_path)
    res = main(["--data", path, "--oracle"])
    assert res["accuracy"] == 1.0
    assert set(res["per_type"]) == {"even", "odd"}


@pytest.mark.slow
def test_cli_model_smoke(tmp_path):
    """Random-weight model: the pipeline must run end-to-end and produce a
    valid prediction per question (batched forward incl. ragged tail)."""
    from unilm_tpu.cli.kosmos_seedbench import main

    path, recs = _fixture(tmp_path, n=3)
    res = main(["--data", path, "--batch_size", "8",
                "--dim", "32", "--layers", "1", "--clip_dim", "32",
                "--image_size", "16", "--image_tokens", "4"])
    assert res["total"] == len(recs)
    assert all(p in "ABCD" for p in res["predictions"])
