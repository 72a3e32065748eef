"""Kosmos-2 grounding evaluation: flickr-entities R@k / RefCOCO accuracy.

CLI-shim equivalent of kosmos-2/evaluation/{flickr_entities,refcoco} +
demo/decode_string.py: generate grounded markup from an image prompt,
parse `<phrase>..</phrase><object><patch_index_..>..</object>` back into
phrase/box pairs, and score against ground truth.

Fixture formats (jsonl):
  flickr:  {"image": str|null, "caption": str,
            "phrases": [{"phrase": str, "boxes": [[x0,y0,x1,y1] norm..]}]}
  refcoco: {"image": str|null, "expression": str, "box": [x0,y0,x1,y1] norm}

Modes:
  --oracle     score ground-truth-derived markup through the full parse +
               metric path (harness self-check; must give R@1 = 1.0)
  (default)    run a UniGPT model (random weights unless --checkpoint):
               prompt = <s><image> Q slots </image><grounding>
               (+ <phrase>expr</phrase> forced prefix for refcoco)

Vocabulary is the native VLTokenizer layout (data/vl_loaders.py); real
kosmos-2 checkpoints additionally go through convert/kosmos.py.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.data.grounding import box_tokens
from unilm_tpu.data.vl_loaders import VLTokenizer, load_image
from unilm_tpu.scoring_grounding import (
    grounded_text_to_predictions,
    phrase_grounding_recall,
    refexp_accuracy,
)


def oracle_markup_flickr(rec, quantized_size):
    parts = []
    for p in rec["phrases"]:
        inner = "</delimiter_of_multi_objects/>".join(
            box_tokens(tuple(b), quantized_size)[len("<object>"):-len("</object>")]
            for b in p["boxes"]
        )
        parts.append(f"<phrase>{p['phrase']}</phrase><object>{inner}</object>")
    return " ".join(parts)


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
    return UniGPT(cfg), cfg


def model_generate(args, tok, records, prefixes):
    """Greedy-generate grounded markup for each record; returns list[str]."""
    from unilm_tpu.models.kosmos import make_unigpt_generate_fns
    from unilm_tpu.runtime.generate import GenerationConfig, generate

    model, cfg = build_model(args, tok)
    bos, pad = tok.token("<s>"), tok.token("<pad>")
    boi, eoi = tok.token("<image>"), tok.token("</image>")
    ground = tok.token("<grounding>")
    Q = args.image_tokens

    prompts, masks, segs_all, imgs = [], [], [], []
    max_prefix = max((len(p) for p in prefixes), default=0)
    base = 3 + Q  # bos, boi, Q, eoi
    P = base + 1 + max_prefix  # + <grounding> + padded prefix
    for rec, prefix in zip(records, prefixes):
        fill = [pad] * (max_prefix - len(prefix))
        ids = [bos] + fill + [boi] + [pad] * Q + [eoi, ground] + list(prefix)
        mask = [False] * (1 + len(fill)) + [False] + [True] * Q + [False, False] + [False] * len(prefix)
        seg = [0] * (1 + len(fill)) + [1] * (Q + 2) + [0] * (1 + len(prefix) - 1)
        prompts.append(ids)
        masks.append(mask)
        segs_all.append(seg + [0] * (len(ids) - len(seg)))
        imgs.append(load_image(rec.get("image"), args.image_root, args.image_size,
                               key=json.dumps(rec)[:64]))

    tokens = jnp.asarray(prompts, jnp.int32)
    img_mask = jnp.asarray(masks)
    segs = jnp.asarray([s[: tokens.shape[1]] for s in segs_all], jnp.int32)
    images = jnp.asarray(np.stack(imgs))

    params = jax.jit(
        lambda r: model.init(r, tokens[:1], images[:1], img_mask[:1], segs[:1])[
            "params"
        ]
    )(jax.random.PRNGKey(args.seed))

    img_feats = model.apply({"params": params}, images, method=model.encode_image)
    cache_size = tokens.shape[1] + args.max_new_tokens
    prefill, step = make_unigpt_generate_fns(model, cache_size=cache_size)
    gcfg = GenerationConfig(
        beam_size=1, max_new_tokens=args.max_new_tokens,
        pad=pad, eos=tok.token("</s>"), vocab_size=tok.vocab_size,
    )
    out, _ = generate(
        gcfg, prefill, step, params, tokens, aux=(img_feats, img_mask, segs)
    )
    texts = []
    for row in np.asarray(out[:, 0] if out.ndim == 3 else out):
        gen = [int(t) for t in row[tokens.shape[1]:]
               if int(t) not in (pad, tok.token("</s>"))]
        texts.append(tok.decode(gen))
    return texts


def main(argv=None):
    p = argparse.ArgumentParser("Kosmos-2 grounding eval")
    p.add_argument("--task", choices=["flickr", "refcoco"], required=True)
    p.add_argument("--data", required=True, help="fixtures jsonl")
    p.add_argument("--image_root", default="")
    p.add_argument("--oracle", action="store_true")
    p.add_argument("--quantized_size", type=int, default=32)
    p.add_argument("--image_tokens", type=int, default=16)
    p.add_argument("--image_size", type=int, default=32)
    p.add_argument("--max_new_tokens", type=int, default=48)
    p.add_argument("--max_len", type=int, default=256)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--clip_dim", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit", type=int, default=0)
    args = p.parse_args(argv)

    with open(args.data, encoding="utf-8") as f:
        records = [json.loads(l) for l in f if l.strip()]
    if args.limit:
        records = records[: args.limit]
    tok = VLTokenizer(quantized_size=args.quantized_size)

    if args.task == "flickr":
        gts = [
            [(p["phrase"], p["boxes"]) for p in rec["phrases"]] for rec in records
        ]
        if args.oracle:
            texts = [oracle_markup_flickr(r, args.quantized_size) for r in records]
        else:
            texts = model_generate(args, tok, records, [[]] * len(records))
        preds = [
            grounded_text_to_predictions(t, args.quantized_size) for t in texts
        ]
        result = phrase_grounding_recall(preds, gts)
    else:
        gt_boxes = [rec["box"] for rec in records]
        if args.oracle:
            texts = [
                f"<phrase>{r['expression']}</phrase>"
                + box_tokens(tuple(r["box"]), args.quantized_size)
                for r in records
            ]
        else:
            prefixes = [
                tok.encode_grounded(f"<phrase>{r['expression']}</phrase>")
                for r in records
            ]
            gen = model_generate(args, tok, records, prefixes)
            texts = [
                f"<phrase>{r['expression']}</phrase>" + g
                for r, g in zip(records, gen)
            ]
        pred_boxes = []
        for t in texts:
            ents = grounded_text_to_predictions(t, args.quantized_size)
            pred_boxes.append(ents[0][1][0] if ents and ents[0][1] else None)
        result = refexp_accuracy(pred_boxes, gt_boxes)

    print(json.dumps({k: round(float(v), 4) for k, v in result.items()}))
    return result


if __name__ == "__main__":
    main()
