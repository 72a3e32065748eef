"""SEED-Bench MCQ evaluation for Kosmos-style VL models.

CLI-shim equivalent of kosmos-2/evaluation/seed-bench/cook_image_data.py +
eval_ppl.py + zeroshot-seed-bench.sh: each question becomes one candidate
per choice ("Question: {q} Answer: {choice}"), candidates are scored by mean
answer-token log-prob, and the argmax choice is compared to ground truth.

Fixture format (jsonl), one question per line:
  {"image": str|null, "question": str, "choices": [str, str, str, str],
   "answer": "A", "question_type": str|int}

Modes:
  --oracle     score ground-truth-derived candidates (harness self-check;
               must print accuracy = 1.0)
  (default)    score with a UniGPT model (random weights unless the params
               come from convert/kosmos.py) in ONE batched forward pass —
               no generate loop, unlike the reference's fairseq pipeline.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.data.vl_loaders import VLTokenizer, load_image
from unilm_tpu.scoring_seedbench import (
    CHOICE_LETTERS,
    answer_span_logprob,
    cook_candidates,
    seedbench_accuracy,
)


def build_model(args, tok):
    from unilm_tpu.models.kosmos import ClipVisionConfig, UniGPT, UniGPTConfig

    clip = ClipVisionConfig(
        img_size=args.image_size, embed_dim=args.clip_dim, num_layers=1,
        num_heads=max(2, args.clip_dim // 32), ffn_dim=args.clip_dim * 2,
    )
    cfg = UniGPTConfig(
        vocab_size=tok.vocab_size, embed_dim=args.dim, num_layers=args.layers,
        num_heads=args.heads, ffn_dim=args.dim * 4,
        max_positions=args.max_len + 8, image_tower="clip",
        latent_query_num=args.image_tokens, clip=clip, segment_emb=True,
    )
    return UniGPT(cfg)


def pack_candidates(args, tok, records):
    """All N*C candidates as one right-padded static-shape batch.

    Layout per row: <s> <image> [Q slots] </image> prompt answer </s>, with
    answer_mask marking the answer tokens + closing </s> (scoring the eos
    penalizes run-on answers the same way the reference's fixed candidate
    length does).
    """
    bos, pad, eos = tok.token("<s>"), tok.token("<pad>"), tok.token("</s>")
    boi, eoi = tok.token("<image>"), tok.token("</image>")
    Q = args.image_tokens
    rows, amasks, imasks, segs, imgs = [], [], [], [], []
    for rec in records:
        img = load_image(rec.get("image"), args.image_root, args.image_size,
                         key=json.dumps(rec)[:64])
        for prompt, answer in cook_candidates(rec["question"], rec["choices"]):
            p_ids = tok.encode_text(prompt)
            a_ids = tok.encode_text(answer) + [eos]
            ids = [bos, boi] + [pad] * Q + [eoi] + p_ids + a_ids
            im = [False, False] + [True] * Q + [False] * (1 + len(p_ids) + len(a_ids))
            am = [0.0] * (3 + Q + len(p_ids)) + [1.0] * len(a_ids)
            sg = [0, 1] + [1] * Q + [1] + [0] * (len(p_ids) + len(a_ids))
            rows.append(ids)
            amasks.append(am)
            imasks.append(im)
            segs.append(sg)
            imgs.append(img)
    T = min(max(len(r) for r in rows), args.max_len)
    pad_to = lambda xs, v: [list(x)[:T] + [v] * (T - len(x)) for x in xs]
    return (
        jnp.asarray(pad_to(rows, pad), jnp.int32),
        jnp.asarray(pad_to(amasks, 0.0), jnp.float32),
        jnp.asarray(pad_to(imasks, False)),
        jnp.asarray(pad_to(segs, 0), jnp.int32),
        jnp.asarray(np.stack(imgs)),
    )


def model_scores(args, tok, records):
    """[N, C] mean answer log-probs from one jitted batched forward."""
    model = build_model(args, tok)
    tokens, amask, imask, segs, images = pack_candidates(args, tok, records)
    params = jax.jit(
        lambda r: model.init(r, tokens[:1], images[:1], imask[:1], segs[:1])[
            "params"]
    )(jax.random.PRNGKey(args.seed))

    @jax.jit
    def score(p, tokens, images, imask, segs, amask):
        logits = model.apply({"params": p}, tokens, images, imask, segs)
        return answer_span_logprob(logits, tokens, amask)

    out = []
    C = len(records[0]["choices"])
    B = max(args.batch_size // C * C, C)
    for i in range(0, tokens.shape[0], B):
        sl = slice(i, min(i + B, tokens.shape[0]))
        n = sl.stop - sl.start
        if n < B:  # pad the tail batch to the jitted shape
            reps = [(0, B - n)] + [(0, 0)] * (tokens.ndim - 1)
            out.append(np.asarray(score(
                params, jnp.pad(tokens[sl], reps), jnp.pad(images[sl], [(0, B - n)] + [(0, 0)] * 3),
                jnp.pad(imask[sl], reps), jnp.pad(segs[sl], reps),
                jnp.pad(amask[sl], reps)))[:n])
        else:
            out.append(np.asarray(score(
                params, tokens[sl], images[sl], imask[sl], segs[sl], amask[sl])))
    return np.concatenate(out).reshape(len(records), C)


def main(argv=None):
    p = argparse.ArgumentParser("SEED-Bench eval")
    p.add_argument("--data", required=True, help="fixtures jsonl")
    p.add_argument("--image_root", default="")
    p.add_argument("--oracle", action="store_true")
    p.add_argument("--image_tokens", type=int, default=16)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--max_len", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--clip_dim", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--out", default="", help="write full result json here")
    args = p.parse_args(argv)

    with open(args.data, encoding="utf-8") as f:
        records = [json.loads(l) for l in f if l.strip()]
    if args.limit:
        records = records[: args.limit]
    answers = [CHOICE_LETTERS.index(r["answer"]) for r in records]
    qtypes = [r.get("question_type", "all") for r in records]

    if args.oracle:
        scores = np.full((len(records), len(records[0]["choices"])), -1.0)
        scores[np.arange(len(records)), answers] = 0.0
    else:
        tok = VLTokenizer()
        scores = model_scores(args, tok, records)

    result = seedbench_accuracy(scores, answers, qtypes)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(result, f, indent=2)
    print(json.dumps({"accuracy": round(result["accuracy"], 4),
                      "total": result["total"],
                      "per_type": {k: round(v["accuracy"], 4)
                                   for k, v in result.get("per_type", {}).items()}}))
    return result


if __name__ == "__main__":
    main()
