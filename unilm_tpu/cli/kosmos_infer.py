"""Kosmos-2.5 image -> OCR / markdown generation.

CLI-shim equivalent of kosmos-2.5/inference.py:56-385: build the prompt
(<s><image> 2048 placeholders </image><ocr>|<md>), extract Pix2Struct
patches, prefill + greedy/beam decode, detokenize with tiktoken cl100k_base,
post-process OCR bboxes / markdown.

Example:
    python -m unilm_tpu.cli.kosmos_infer --image doc.png --task md \
        --checkpoint ckpt.pt --max_new_tokens 1024
"""

from __future__ import annotations

import argparse
import re

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.data.transforms import pix2struct_patches, to_numpy
from unilm_tpu.models.kosmos import UniGPT, kosmos2_5, make_unigpt_generate_fns
from unilm_tpu.runtime.generate import GenerationConfig, generate

# special ids mirror kosmos-2.5 inference.py:56-157 (dict built from tiktoken
# cl100k_base + specials appended in fairseq Dictionary order)
BOS, PAD, EOS, UNK = 0, 1, 2, 3
TIKTOKEN_OFFSET = 4  # dictionary id = tiktoken id + offset (specials first)


def build_prompt(task: str, num_image_tokens: int, image_id: int, image_end_id: int,
                 task_id: int):
    """<s> <image> [placeholders] </image> <task> (inference.py:160-212)."""
    ids = [BOS, image_id] + [PAD] * num_image_tokens + [image_end_id, task_id]
    mask = [False, False] + [True] * num_image_tokens + [False, False]
    segs = [0, 1] + [1] * num_image_tokens + [1, 0]
    return np.asarray(ids), np.asarray(mask), np.asarray(segs)


def postprocess_ocr(text: str):
    """Parse '<bbox><x_..><y_..>...</bbox> text' lines (inference.py:247-329)."""
    out = []
    for m in re.finditer(
        r"<bbox><x_(\d+)><y_(\d+)><x_(\d+)><y_(\d+)></bbox>([^<]*)", text
    ):
        x0, y0, x1, y1 = map(int, m.groups()[:4])
        out.append({"bbox": [x0, y0, x1, y1], "text": m.group(5).strip()})
    return out


def main(argv=None):
    p = argparse.ArgumentParser("Kosmos-2.5 inference (TPU)")
    p.add_argument("--image", required=True)
    p.add_argument("--task", choices=["ocr", "md"], default="md")
    p.add_argument("--checkpoint", default="", help="fairseq kosmos-2.5 .pt")
    p.add_argument("--max_new_tokens", type=int, default=1024)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--int8", action="store_true",
                   help="fast lossy mode: int8 decoder projections + LM head + KV (ops/quant.py):"
                        " halves the bs=1 decode weight stream, the"
                        " interactive-demo hot path (kosmos-2.5/inference.py)")
    p.add_argument("--max_patches", type=int, default=4096)
    p.add_argument("--num_image_tokens", type=int, default=2048)
    p.add_argument("--image_id", type=int, default=100283)
    p.add_argument("--image_end_id", type=int, default=100284)
    p.add_argument("--ocr_id", type=int, default=100288)
    p.add_argument("--md_id", type=int, default=100289)
    p.add_argument("--no_scan", action="store_true",
                   help="unrolled decoder loop + per-layer caches instead "
                        "of the scanned stack with the int8-KV page pool")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="reduced dims (converter tests / smoke runs)")
    args = p.parse_args(argv)
    infer = build_pipeline(args)
    text = infer(args.image)
    if args.task == "ocr":
        for rec in postprocess_ocr(text):
            print(rec)
    else:
        print(text)


def build_pipeline(args):
    """Load model+checkpoint once; returns infer(image_path) -> decoded text.
    Used by main (one image) and cli/reproduce_baseline.py (dataset loop —
    the jit caches make the per-image cost pure compute after image 1)."""
    dtype = jnp.float32 if args.fp32 else (jnp.bfloat16 if args.bf16 else jnp.float32)
    cfg = kosmos2_5(dtype=dtype, latent_query_num=args.num_image_tokens)
    if args.tiny:
        from unilm_tpu.models.kosmos import Pix2StructVisionConfig

        cfg = type(cfg)(**{
            **cfg.__dict__, "embed_dim": 64, "num_layers": 2, "num_heads": 4,
            "ffn_dim": 128, "vocab_size": 2048, "max_positions": 4096 + 64,
            "pix2struct": Pix2StructVisionConfig(
                hidden_size=32, num_layers=1, num_heads=2, d_ff=64, d_kv=16,
                patch_dim=768, max_rows=4096, use_flash=False, dtype=dtype,
            ),
            "use_flash": False,
        })
    model = UniGPT(cfg)

    task_id = args.ocr_id if args.task == "ocr" else args.md_id
    ids, img_mask, segs = build_prompt(
        args.task, args.num_image_tokens, args.image_id, args.image_end_id, task_id
    )
    tokens = jnp.asarray(ids)[None]
    img_mask = jnp.asarray(img_mask)[None]
    segs = jnp.asarray(segs)[None]

    if args.checkpoint:
        import torch

        from unilm_tpu.convert.kosmos import convert_unigpt

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        params = convert_unigpt(sd, cfg)
    else:
        print("WARNING: no checkpoint given; running with random weights")
        dummy = jnp.zeros((1, 4, 2 + cfg.pix2struct.patch_dim), dtype)
        params = jax.jit(
            lambda r: model.init(r, tokens, dummy, img_mask, segs)["params"]
        )(jax.random.PRNGKey(0))

    if not getattr(args, "no_scan", False):
        # scanned decoder stack (exact vs the looped stack —
        # tests/test_scan_stack.py); int8 KV joins only under --int8, the
        # explicitly lossy fast mode
        import dataclasses

        from unilm_tpu.models.kosmos import stack_unigpt_params

        params = stack_unigpt_params(dict(params), cfg.num_layers)
        cfg = dataclasses.replace(cfg, scan_layers=True)
        model = UniGPT(cfg)

    if getattr(args, "int8", False):
        # decoder projections + tied LM head; embeddings/norms/towers stay
        # full precision (same predicate as runtime/serving.py)
        import dataclasses

        from unilm_tpu.models.kosmos import quantize_lm_head
        from unilm_tpu.ops.quant import quantize_dense_tree

        _PROJ = {"q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2", "fc3"}
        params = quantize_dense_tree(
            params,
            predicate=lambda pth: pth[-2] in _PROJ and any(
                s.startswith("layers") for s in pth),
        )
        params = quantize_lm_head(params)
        cfg = dataclasses.replace(
            cfg, quant_weights=True, quant_lm_head=True,
            kv_cache_dtype="int8" if cfg.scan_layers else cfg.kv_cache_dtype)
        model = UniGPT(cfg)

    cache_size = tokens.shape[1] + args.max_new_tokens
    prefill, step = make_unigpt_generate_fns(model, cache_size=cache_size)
    gcfg = GenerationConfig(
        beam_size=args.beam, max_new_tokens=args.max_new_tokens,
        pad=PAD, eos=EOS, vocab_size=cfg.vocab_size,
    )

    def infer(image_path: str) -> str:
        from PIL import Image

        img = to_numpy(Image.open(image_path))
        patches = jnp.asarray(
            pix2struct_patches(img, max_patches=args.max_patches)[None], dtype)
        # prefill consumes precomputed image features (TTFT path: tower+splice)
        img_feats = model.apply(
            {"params": params}, patches, method=model.encode_image)
        out, _ = generate(
            gcfg, prefill, step, params, tokens, aux=(img_feats, img_mask, segs)
        )
        seq = np.asarray(out[0, 0] if out.ndim == 3 else out[0])
        gen = [int(t) for t in seq[tokens.shape[1]:] if t not in (PAD, EOS)]
        try:
            import tiktoken

            enc = tiktoken.get_encoding("cl100k_base")
            return enc.decode(
                [t - TIKTOKEN_OFFSET for t in gen if t >= TIKTOKEN_OFFSET])
        except Exception:
            return " ".join(map(str, gen))

    return infer


if __name__ == "__main__":
    main()
