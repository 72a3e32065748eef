"""LayoutLMv3 FUNSD token classification eval.

CLI-shim equivalent of layoutlmv3/examples/run_funsd_cord.py:154-455:
loads FUNSD annotation directory (the public dataset layout:
<root>/annotations/*.json + <root>/images/*.png), tokenizes with a local HF
tokenizer, aligns labels/bboxes to subwords (tokenize_and_align_labels :312,
segment-level boxes funsd.py:85), runs the model, reports seqeval-style
entity P/R/F1 (:421).

Example:
    python -m unilm_tpu.cli.run_funsd --data_path FUNSD/testing_data \
        --tokenizer ./roberta-tokenizer --checkpoint layoutlmv3-funsd.pt
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.data.transforms import (
    IMAGENET_INCEPTION_MEAN,
    IMAGENET_INCEPTION_STD,
    normalize,
    resize,
    to_numpy,
)
from unilm_tpu.data.document_datasets import FUNSD_LABELS as LABELS, load_funsd
from unilm_tpu.models.layoutlmv3 import LayoutLMv3Config, LayoutLMv3ForTokenClassification
from unilm_tpu.scoring import entity_f1

load_funsd_split = load_funsd


def tokenize_and_align(tok, example, max_len: int):
    """run_funsd_cord.py:312 subword alignment: label only first subword.
    Also emits per-token segment ids for the segment-aware 1D bias
    (pre_calc_rel_mat, data_collator.py:15-25); specials/pads get -1."""
    enc = tok(example["words"], is_split_into_words=True, truncation=True,
              max_length=max_len, padding="max_length")
    word_ids = enc.word_ids()
    word_segs = example.get("segments")
    bboxes, labels, segs = [], [], []
    prev = None
    for wid in word_ids:
        if wid is None:
            bboxes.append([0, 0, 0, 0])
            labels.append(-100)
            segs.append(-1)
        else:
            bboxes.append(example["bboxes"][wid])
            labels.append(
                LABELS.index(example["labels"][wid]) if wid != prev else -100
            )
            segs.append(word_segs[wid] if word_segs is not None else 0)
        prev = wid
    return (np.asarray(enc["input_ids"]), np.asarray(enc["attention_mask"]),
            np.asarray(bboxes), np.asarray(labels), np.asarray(segs))


def main():
    p = argparse.ArgumentParser("LayoutLMv3 FUNSD eval (TPU)")
    p.add_argument("--data_path", required=True)
    p.add_argument("--tokenizer", required=True, help="local HF tokenizer dir")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--max_len", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--no_image", action="store_true")
    args = p.parse_args()

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.tokenizer, use_fast=True,
                                        add_prefix_space=True)
    cfg = LayoutLMv3Config(num_labels=len(LABELS))
    model = LayoutLMv3ForTokenClassification(cfg)
    examples = load_funsd_split(args.data_path)
    print(f"{len(examples)} documents")

    if args.checkpoint:
        import torch

        from unilm_tpu.convert.layoutlmv3 import convert_layoutlmv3

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        params = convert_layoutlmv3(sd, cfg)
    else:
        print("WARNING: random weights (no --checkpoint)")
        d = jnp.zeros((1, args.max_len), jnp.int32)
        params = model.init(
            jax.random.PRNGKey(0), d, jnp.zeros((1, args.max_len, 4), jnp.int32),
            images=None if args.no_image else jnp.zeros((1, 224, 224, 3)),
        )["params"]

    from PIL import Image

    apply = jax.jit(lambda p, ids, bb, m, im, vs: model.apply(
        p, ids, bb, attention_mask=m, images=im, valid_span=vs))

    all_true, all_pred = [], []
    B = args.batch_size
    for i in range(0, len(examples), B):
        chunk = examples[i : i + B]
        enc = [tokenize_and_align(tok, e, args.max_len) for e in chunk]
        ids = jnp.asarray(np.stack([e[0] for e in enc]))
        mask = jnp.asarray(np.stack([e[1] for e in enc]))
        bbox = jnp.asarray(np.stack([e[2] for e in enc]))
        labels = np.stack([e[3] for e in enc])
        seg = np.stack([e[4] for e in enc])
        # same-segment mask feeding the segment-aware 1D relative bias
        # (the configuration that produced FUNSD F1 0.9059)
        valid_span = jnp.asarray(seg[:, :, None] == seg[:, None, :])
        images = None
        if not args.no_image:
            images = jnp.asarray(np.stack([
                normalize(to_numpy(resize(Image.open(e["image"]), (224, 224), "bilinear")),
                          IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD)
                for e in chunk
            ]))
        logits = np.asarray(
            apply({"params": params}, ids, bbox, mask, images, valid_span))
        preds = logits.argmax(-1)
        for row_l, row_p in zip(labels, preds):
            keep = row_l != -100
            all_true.append([LABELS[x] for x in row_l[keep]])
            all_pred.append([LABELS[x] for x in row_p[keep]])
    m = entity_f1(all_true, all_pred)
    print(f"precision {m['precision']:.4f} recall {m['recall']:.4f} f1 {m['f1']:.4f}")


if __name__ == "__main__":
    main()
