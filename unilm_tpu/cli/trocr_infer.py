"""TrOCR image-to-text inference (beam search).

CLI-shim equivalent of trocr/pic_inference.py:12-60: load checkpoint, build
generator, decode one image or a folder. Detokenization: HF tokenizer dir
(--tokenizer) or raw token ids.

Example:
    python -m unilm_tpu.cli.trocr_infer --image line.png \
        --checkpoint trocr-base-handwritten.pt --tokenizer ./tokenizer \
        --beam 5 --max_new_tokens 128
"""

from __future__ import annotations

import argparse
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
from unilm_tpu.models import trocr as trocr_models
from unilm_tpu.models.trocr import TrOCRModel, make_generate_fns
from unilm_tpu.runtime.generate import GenerationConfig, generate


def preprocess(path: str, img_size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    img = resize(img, (img_size, img_size), "bicubic")
    return normalize(to_numpy(img), IMAGENET_INCEPTION_MEAN, IMAGENET_INCEPTION_STD)


def main():
    p = argparse.ArgumentParser("TrOCR inference (TPU)")
    p.add_argument("--image", required=True, help="image file or directory")
    p.add_argument("--checkpoint", default="", help="HF VisionEncoderDecoder .pt/.bin")
    p.add_argument("--arch", default="trocr_base")
    p.add_argument("--tokenizer", default="", help="HF tokenizer dir for detok")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max_new_tokens", type=int, default=128)
    p.add_argument("--len_penalty", type=float, default=1.0)
    p.add_argument("--bos", type=int, default=2)
    p.add_argument("--eos", type=int, default=2)
    p.add_argument("--pad", type=int, default=1)
    p.add_argument("--no_scan", action="store_true",
                   help="unrolled decoder loop instead of the scanned "
                        "stack (PERFORMANCE.md: 2.6x at bs=1 beam-5)")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder projections + output "
                        "head (models.trocr.quantize_trocr_decoder)")
    args = p.parse_args()

    cfg = getattr(trocr_models, args.arch)(scan_layers=not args.no_scan)
    model = TrOCRModel(cfg)

    if args.checkpoint:
        import torch

        from unilm_tpu.convert.trocr import convert_trocr

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        params = convert_trocr(sd, cfg)
    else:
        dummy_img = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        params = model.init(
            jax.random.PRNGKey(0), dummy_img, jnp.zeros((1, 2), jnp.int32)
        )["params"]

    if cfg.scan_layers and f"layers_{cfg.dec_layers - 1}" in (
            params.get("text_decoder", {}).get("decoder", {})):
        # converted/looped checkpoint -> stacked scan tree
        from unilm_tpu.models.trocr import stack_trocr_params

        params = stack_trocr_params(dict(params), cfg.dec_layers)
    if args.int8:
        import dataclasses

        from unilm_tpu.models.trocr import quantize_trocr_decoder

        params = quantize_trocr_decoder(params)
        model = TrOCRModel(dataclasses.replace(cfg, quant_weights=True))

    paths = (
        [args.image]
        if os.path.isfile(args.image)
        else [os.path.join(args.image, f) for f in sorted(os.listdir(args.image))]
    )
    tok = None
    if args.tokenizer:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer)

    gcfg = GenerationConfig(
        beam_size=args.beam, max_new_tokens=args.max_new_tokens,
        len_penalty=args.len_penalty, pad=args.pad, eos=args.eos,
        vocab_size=cfg.vocab_size,
    )
    prefill, step = make_generate_fns(model, cache_size=1 + args.max_new_tokens)

    for path in paths:
        img = jnp.asarray(preprocess(path, cfg.img_size))[None]
        enc = model.apply({"params": params}, img, method=model.encode)
        prompt = jnp.full((1, 1), args.bos, jnp.int32)
        tokens, scores = generate(gcfg, prefill, step, params, prompt, aux=enc)
        if tokens.ndim == 3:
            best = np.asarray(tokens[0, 0])
            score = float(scores[0, 0])
        else:
            best = np.asarray(tokens[0])
            score = 0.0
        ids = [int(t) for t in best[1:] if t not in (args.pad, args.eos)]
        text = tok.decode(ids, skip_special_tokens=True) if tok else str(ids)
        print(f"{os.path.basename(path)}\t{score:.3f}\t{text}")


if __name__ == "__main__":
    main()
