"""Streaming VL pretraining data (laion2b_obj_loader / interleaved / spm
equivalents) — grounding markup, tokenizer roundtrip, fixed-shape assembly,
and checkpointable stream state."""

import json

import numpy as np
import pytest

from unilm_tpu.data.vl_loaders import (
    VLSampleSpec,
    VLTokenizer,
    assemble_sample,
    insert_grounding_markup,
    interleaved_stream,
    laion_obj_stream,
    vl_batch_stream,
)


def test_grounding_markup_insertion():
    caption = "a dog chases a ball"
    objects = [
        {"span": [2, 5], "boxes": [[0.0, 0.0, 0.5, 0.5]]},
        {"span": [14, 19], "boxes": [[0.5, 0.5, 1.0, 1.0], [0.0, 0.5, 0.5, 1.0]]},
    ]
    out = insert_grounding_markup(caption, objects, quantized_size=32)
    assert out.startswith("<grounding>a ")
    assert "<phrase>dog</phrase><object><patch_index_0000><patch_index_0495></object>" in out
    # two boxes joined by the multi-object delimiter (laion2b_obj_loader.py:314)
    assert "</delimiter_of_multi_objects/>" in out
    assert out.endswith("</object>")


def test_tokenizer_roundtrip_with_markup():
    tok = VLTokenizer()
    text = "<grounding>a <phrase>dog</phrase><object><patch_index_0000><patch_index_0495></object> runs"
    ids = tok.encode_grounded(text)
    assert tok.token("<grounding>") == ids[0]
    assert tok.loc_token(0) in ids and tok.loc_token(495) in ids
    assert tok.decode(ids) == text


def test_assemble_sample_layout():
    tok = VLTokenizer()
    spec = VLSampleSpec(tokens_per_sample=32, image_tokens=4, image_size=8)
    img = np.zeros((8, 8, 3), np.float32)
    ids = tok.encode_text("hello world")
    s = assemble_sample(tok, spec, [("image", img), ("text", ids)])
    assert s["tokens"].shape == (32,)
    assert s["img_mask"].sum() == 4
    # image span: <image> then 4 masked slots then </image>
    first = int(np.argmax(s["img_mask"]))
    assert s["tokens"][first - 1] == tok.token("<image>")
    assert s["tokens"][first + 4] == tok.token("</image>")
    assert bool(s["loss_mask"][first]) is False  # no loss on image slots
    assert s["segs"][first] == 1  # segment embedding marks the image span
    # text positions carry loss
    assert s["loss_mask"].sum() >= len(ids)


def _write_laion_shards(tmp_path, n_shards=2, lines_per=6):
    paths = []
    k = 0
    for si in range(n_shards):
        p = tmp_path / f"shard{si}.jsonl"
        with open(p, "w") as f:
            for li in range(lines_per):
                rec = {
                    "caption": f"object number {k} on a table",
                    "image": None,
                    "objects": [
                        {"span": [0, 6], "boxes": [[0.1, 0.1, 0.6, 0.6]]}
                    ],
                }
                f.write(json.dumps(rec) + "\n")
                k += 1
        paths.append(str(p))
    return paths


def test_laion_stream_batches_and_state_roundtrip(tmp_path):
    paths = _write_laion_shards(tmp_path)
    tok = VLTokenizer()
    spec = VLSampleSpec(tokens_per_sample=48, image_tokens=4, image_size=8)
    stream = vl_batch_stream(
        laion_obj_stream(paths, tok, spec, seed=3, shuffle_buffer=4), 2
    )
    b = next(stream)
    assert b["tokens"].shape == (2, 48)
    assert b["images"].shape == (2, 1, 8, 8, 3)
    assert b["img_mask"].shape == (2, 48)
    assert (b["img_mask"].sum(axis=1) == 4).all()

    # checkpoint mid-stream: setstate(getstate()) must reproduce the stream
    # (infinibatch contract, iterators.py:244-307 in the reference)
    next(stream)
    state = stream.getstate()
    want = [next(stream)["tokens"] for _ in range(3)]
    stream.setstate(state)
    got = [next(stream)["tokens"] for _ in range(3)]
    for a, c in zip(want, got):
        np.testing.assert_array_equal(a, c)


def test_interleaved_stream(tmp_path):
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for i in range(4):
            f.write(json.dumps({
                "segments": [
                    {"text": f"intro {i} "},
                    {"image": f"img_{i}.png"},
                    {"text": " middle text "},
                    {"image": f"img_{i}_b.png"},
                    {"text": " end"},
                ]
            }) + "\n")
    tok = VLTokenizer()
    spec = VLSampleSpec(
        tokens_per_sample=64, image_tokens=4, image_size=8, max_images=2
    )
    stream = interleaved_stream([str(p)], tok, spec, seed=0, shuffle_buffer=2)
    s = next(stream)
    assert int(s["n_images"]) == 2
    assert s["img_mask"].sum() == 8  # two image spans spliced
    assert s["images"].shape == (2, 8, 8, 3)


def test_vl_pretraining_resume_smoke(tmp_path):
    """Resumable image-text pretraining: train 2 steps, checkpoint (model +
    stream position), restore into a fresh process state, continue."""
    from unilm_tpu.cli.train_gpt import main

    shards = _write_laion_shards(tmp_path, n_shards=1, lines_per=8)
    save = tmp_path / "ckpt"
    argv = [
        "--vl_data", shards[0], "--save_dir", str(save),
        "--tokens_per_sample", "32", "--image_tokens", "4",
        "--image_size", "16", "--clip_dim", "32",
        "--batch_size", "2", "--max_steps", "2", "--save_every", "2",
        "--dim", "32", "--layers", "1", "--heads", "2", "--ffn", "64",
        "--log_every", "1",
    ]
    main(argv)
    # resume: max_steps 4 continues from the step-2 checkpoint
    main([a if a != "2" or argv[argv.index(a) - 1] != "--max_steps" else "4"
          for a in argv])


def test_vl_pretraining_fused_ce_smoke(tmp_path):
    """--fused_ce path: chunked-vocab CE from features (ops/fused_ce.py)
    through the full multimodal train step."""
    from unilm_tpu.cli.train_gpt import main

    shards = _write_laion_shards(tmp_path, n_shards=1, lines_per=8)
    main([
        "--vl_data", shards[0], "--save_dir", str(tmp_path / "ckpt_f"),
        "--tokens_per_sample", "32", "--image_tokens", "4",
        "--image_size", "16", "--clip_dim", "32",
        "--batch_size", "2", "--max_steps", "2", "--save_every", "2",
        "--dim", "32", "--layers", "1", "--heads", "2", "--ffn", "64",
        "--log_every", "1", "--fused_ce", "--ce_chunk", "128",
    ])
