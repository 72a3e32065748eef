"""MWPBench scoring + MathScale/GLAN pipeline tests (no network: scripted
LLM clients)."""

import numpy as np

from unilm_tpu.data.instructgen import (
    ConceptGraph,
    extract_concepts,
    glan_generate,
    mathscale_generate,
)
from unilm_tpu.scoring_math import (
    PROMPT_TEMPLATES,
    answers_equiv,
    extract_answer,
    extract_boxed,
    math_is_correct,
    mwpbench_eval,
    normalize_math_answer,
)

# --------------------------------------------------------------------------- #
# scoring
# --------------------------------------------------------------------------- #


def test_extract_boxed_balanced():
    assert extract_boxed(r"so \boxed{\frac{1}{2}} done") == [r"\frac{1}{2}"]
    assert extract_boxed(r"\boxed{a} and \boxed{{b}+c}") == ["a", "{b}+c"]
    assert extract_boxed("nothing") == []


def test_normalize():
    assert normalize_math_answer(r"\tfrac{1}{2}") == r"\frac{1}{2}"
    assert normalize_math_answer("0.5") == r"\frac{1}{2}"
    assert normalize_math_answer("3/4") == r"\frac{3}{4}"
    assert normalize_math_answer(r"\frac12") == r"\frac{1}{2}"
    assert normalize_math_answer("x = 7") == "7"
    assert normalize_math_answer(r"90^{\circ}") == "90"
    assert normalize_math_answer("1,234") == "1234"
    assert normalize_math_answer(r"\sqrt3") == r"\sqrt{3}"
    assert normalize_math_answer(r"5 \text{ cm}") == "5"
    assert normalize_math_answer("((3)/(4))") == r"\frac{3}{4}"


def test_extraction_ladder():
    assert extract_answer(r"thus \boxed{42}.", True) == "42"
    assert extract_answer("we get 7 then 13 total", True) == "13"
    assert extract_answer("the answer is x+1.", False) == "x+1"
    assert extract_answer("the solution is y=2x", False) == "y=2x"


def test_equiv_and_is_correct():
    assert answers_equiv("42", "42.0")
    assert answers_equiv(r"\tfrac{1}{2}", "0.5")
    assert not answers_equiv("41", "42")
    ok, pred, ref = math_is_correct(
        "Step 1 ... The answer is \\boxed{80}.", "80")
    assert ok and pred == "80" and ref == "80"
    # fresh_gaokao_math_2023.json row 3: numeric answer "-1"
    ok, _, _ = math_is_correct("|a|^2-|b|^2 works out to -1", "-1")
    assert ok


def test_mwpbench_eval_topics():
    records = [
        {"question": "q1", "answer": "4", "data_topic": "gsm8k"},
        {"question": "q2", "answer": "9", "data_topic": "gsm8k"},
        {"question": "q3", "answer": r"\frac{1}{2}", "data_topic": "math"},
    ]
    comps = ["the answer is 4", "the answer is 8", r"\boxed{0.5}"]
    res = mwpbench_eval(records, comps)
    assert res["tasks"]["gsm8k"]["accuracy"] == 0.5
    assert res["tasks"]["math"]["accuracy"] == 1.0
    assert abs(res["micro_accuracy"] - 2 / 3) < 1e-9
    assert abs(res["macro_accuracy"] - 0.75) < 1e-9
    assert "### Instruction" in PROMPT_TEMPLATES["alpaca_force_ans"]


# --------------------------------------------------------------------------- #
# MathScale
# --------------------------------------------------------------------------- #

SEEDS = {
    "add apples": ("arithmetic; word problems", "addition; counting"),
    "area of circle": ("geometry", "circle area; pi"),
    "triangle angles": ("geometry; trigonometry", "angle sum; sine rule"),
}


def scripted_math_client(prompt: str) -> str:
    if prompt.startswith("Analyze the following math question"):
        for q, (t, k) in SEEDS.items():
            if q in prompt:
                return f"Topics: {t}\nKnowledge: {k}"
        raise AssertionError(prompt)
    if prompt.startswith("Create one new"):
        return "PROBLEM<" + prompt.split("[")[1].split("]")[0] + ">"
    if prompt.startswith("Solve the following problem"):
        return "Work... The answer is 5."
    raise AssertionError(prompt)


def test_concept_graph_structure():
    extracted = extract_concepts(scripted_math_client, list(SEEDS))
    assert extracted[0] == (["arithmetic", "word problems"],
                            ["addition", "counting"])
    g = ConceptGraph.build(extracted)
    assert g.freq["geometry"] == 2  # two seed questions
    assert g.kind["sine rule"] == "k"
    # geometry co-occurs with both of its questions' knowledge points
    assert g.adj["geometry"]["circle area"] == 1
    assert g.adj["geometry"]["angle sum"] == 1
    # walk never crosses questions that share no concepts
    assert "addition" not in g.adj["geometry"]


def test_concept_graph_sampling_reachable_only():
    g = ConceptGraph.build(extract_concepts(scripted_math_client, list(SEEDS)))
    rng = np.random.default_rng(0)
    for _ in range(50):
        topics, points = g.sample_concepts(rng)
        assert topics and points
        # every sampled point must neighbor something in the walk
        for p in points:
            assert any(g.adj[t][p] or any(g.adj[p2][p] for p2 in points)
                       for t in topics)


def test_mathscale_generate_end_to_end():
    recs = mathscale_generate(scripted_math_client, list(SEEDS), n=4, seed=1)
    assert len(recs) == 4
    for r in recs:
        assert r["question"].startswith("PROBLEM<")
        assert r["answer"].endswith("The answer is 5.")
        assert r["topics"] and r["knowledge_points"]
    # reproducible by seed
    again = mathscale_generate(scripted_math_client, list(SEEDS), n=4, seed=1)
    assert recs == again


# --------------------------------------------------------------------------- #
# GLAN
# --------------------------------------------------------------------------- #


def scripted_glan_client(prompt: str) -> str:
    if prompt.startswith("List the main disciplines"):
        return "- Mathematics\n- Physics"
    if prompt.startswith("List "):
        disc = prompt.split("student of ")[1].split(" must")[0]
        return f"{disc} 101\n{disc} 201"
    if prompt.startswith("Design a syllabus"):
        return ("Week 1: Basics :: definitions; notation\n"
                "malformed line without separator\n"
                "Week 2: Depth :: proofs; applications; examples")
    if prompt.startswith("Write one"):
        sess = prompt.split("class session '")[1].split("'")[0]
        return f"Q[{sess}]"
    if prompt.startswith("Answer the following"):
        return "A detailed answer."
    raise AssertionError(prompt)


def test_glan_generate_end_to_end():
    recs = glan_generate(scripted_glan_client, n_per_session=1,
                         subjects_per_discipline=2, seed=3)
    # 2 disciplines x 2 subjects x 2 parsed sessions
    assert len(recs) == 8
    assert {r["discipline"] for r in recs} == {"Mathematics", "Physics"}
    for r in recs:
        assert r["question"].startswith("Q[Week")
        assert r["answer"] == "A detailed answer."
        assert 1 <= len(r["concepts"]) <= 2
        # concepts must come from the session that produced the question
        sess_concepts = {"Week 1: Basics": {"definitions", "notation"},
                         "Week 2: Depth": {"proofs", "applications", "examples"}}
        assert set(r["concepts"]) <= sess_concepts[r["session"]]
    assert recs == glan_generate(scripted_glan_client, n_per_session=1,
                                 subjects_per_discipline=2, seed=3)
