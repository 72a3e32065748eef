"""Kosmos-2 grounding eval harness: markup parse -> metrics, oracle = 1.0,
model path emits a metric end-to-end (evaluation/{flickr_entities,refcoco}
equivalents)."""

import json

import numpy as np
import pytest

from unilm_tpu.scoring_grounding import (
    grounded_text_to_predictions,
    phrase_grounding_recall,
    refexp_accuracy,
)


def test_parse_and_recall_protocol():
    text = (
        "<phrase>a dog</phrase><object><patch_index_0000><patch_index_0527>"
        "</object> chases <phrase>a ball</phrase><object>"
        "<patch_index_0528><patch_index_1023></object>"
    )
    preds = grounded_text_to_predictions(text)
    assert len(preds) == 2 and preds[0][0] == "a dog"
    gts = [[("A  Dog", preds[0][1]), ("a ball", preds[1][1])]]  # case/space-insensitive
    r = phrase_grounding_recall([preds], gts)
    assert r["R@1"] == 1.0 and r["num_phrases"] == 2

    # wrong box for one phrase -> R@1 = 0.5
    bad = [(preds[0][0], [[0.9, 0.9, 1.0, 1.0]]), preds[1]]
    r2 = phrase_grounding_recall([bad], gts)
    assert r2["R@1"] == 0.5
    # ...but correct at rank 2 -> R@5 recovers
    bad_then_good = [(preds[0][0], [[0.9, 0.9, 1.0, 1.0]] + preds[0][1]), preds[1]]
    r3 = phrase_grounding_recall([bad_then_good], gts)
    assert r3["R@1"] == 0.5 and r3["R@5"] == 1.0


def test_refexp_accuracy():
    gt = [[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]]
    pred = [[0.02, 0.02, 0.52, 0.5], None]
    r = refexp_accuracy(pred, gt)
    assert r["accuracy"] == 0.5 and r["num_refs"] == 2


def _write_flickr(tmp_path, n=3):
    p = tmp_path / "flickr.jsonl"
    with open(p, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "image": None,
                "caption": f"thing {i} next to other {i}",
                "phrases": [
                    {"phrase": f"thing {i}", "boxes": [[0.1, 0.1, 0.4, 0.4]]},
                    {"phrase": f"other {i}", "boxes": [[0.6, 0.6, 0.9, 0.9]]},
                ],
            }) + "\n")
    return str(p)


def _write_refcoco(tmp_path, n=4):
    p = tmp_path / "refcoco.jsonl"
    with open(p, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "image": None,
                "expression": f"the {i}th widget",
                "box": [0.25, 0.25, 0.75, 0.75],
            }) + "\n")
    return str(p)


def test_oracle_flickr_end_to_end(tmp_path):
    from unilm_tpu.cli.kosmos_ground_eval import main

    res = main(["--task", "flickr", "--data", _write_flickr(tmp_path), "--oracle"])
    assert res["R@1"] == 1.0 and res["num_phrases"] == 6


def test_oracle_refcoco_end_to_end(tmp_path):
    from unilm_tpu.cli.kosmos_ground_eval import main

    res = main(["--task", "refcoco", "--data", _write_refcoco(tmp_path), "--oracle"])
    # quantization moves the box by <= 1/32 per side: still IoU >= 0.5
    assert res["accuracy"] == 1.0


def test_model_flickr_emits_metric(tmp_path):
    """Random tiny model through prompt->generate->parse->metric (end-to-end
    harness check; the metric value itself is ~0 with random weights)."""
    from unilm_tpu.cli.kosmos_ground_eval import main

    res = main([
        "--task", "flickr", "--data", _write_flickr(tmp_path, n=2),
        "--max_new_tokens", "8", "--image_tokens", "4", "--image_size", "16",
        "--dim", "32", "--layers", "1", "--heads", "2", "--clip_dim", "32",
    ])
    assert 0.0 <= res["R@1"] <= 1.0


def test_model_refcoco_emits_metric(tmp_path):
    from unilm_tpu.cli.kosmos_ground_eval import main

    res = main([
        "--task", "refcoco", "--data", _write_refcoco(tmp_path, n=2),
        "--max_new_tokens", "6", "--image_tokens", "4", "--image_size", "16",
        "--dim", "32", "--layers", "1", "--heads", "2", "--clip_dim", "32",
    ])
    assert 0.0 <= res["accuracy"] <= 1.0


# --------------------------------------------------------------------------- #
# kosmos_demo (gradio_app.py equivalent)
# --------------------------------------------------------------------------- #


def test_demo_one_shot_parses_and_annotates(tmp_path, monkeypatch, capsys):
    """Demo CLI: stubbed generator -> parse -> entity print + PIL overlay."""
    import json

    from unilm_tpu.cli import kosmos_demo
    from unilm_tpu.data.grounding import box_tokens

    markup = (
        "An image of <phrase>a cat</phrase>"
        + box_tokens((0.25, 0.25, 0.75, 0.75))
        + " on <phrase>a mat</phrase>" + box_tokens((0.0, 0.5, 1.0, 1.0))
    )
    monkeypatch.setattr(
        kosmos_demo, "model_generate", lambda a, t, recs, prefs: [markup]
    )
    out_png = tmp_path / "annot.png"
    rc = kosmos_demo.main([
        "--cpu", "--tokenizer", "bytes", "--json",
        "--annotate", str(out_png),
    ])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.splitlines()[0])
    assert res["caption"] == "An image of a cat on a mat"
    assert [e["phrase"] for e in res["entities"]] == ["a cat", "a mat"]
    assert res["entities"][0]["boxes"][0] == [0.25, 0.25, 0.75, 0.75]
    assert out_png.exists() and out_png.stat().st_size > 0


def test_demo_repl(monkeypatch, capsys):
    import io

    from unilm_tpu.cli import kosmos_demo

    monkeypatch.setattr(
        kosmos_demo, "model_generate",
        lambda a, t, recs, prefs: ["<phrase>dog</phrase>" + __import__(
            "unilm_tpu.data.grounding", fromlist=["box_tokens"]
        ).box_tokens((0.0, 0.0, 0.5, 0.5))],
    )
    monkeypatch.setattr("sys.stdin", io.StringIO("img.png\tA photo of\n"))
    rc = kosmos_demo.main(["--cpu", "--tokenizer", "bytes", "--repl"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "dog" in out and "0.500" in out
