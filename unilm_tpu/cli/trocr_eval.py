"""TrOCR dataset evaluation: CER/WER over SROIE / IAM-style gt / synthetic.

CLI-shim equivalent of fairseq-generate with --scoring cer2/wer on the
trocr task (trocr/README.md:98, trocr/scoring.py): load a dataset
(data/trocr_datasets.py), greedy/beam decode every line image, report CER
and WER.

  python -m unilm_tpu.cli.trocr_eval --synthetic --tiny            # smoke
  python -m unilm_tpu.cli.trocr_eval --sroie /data/sroie_task2
  python -m unilm_tpu.cli.trocr_eval --gt /data/iam/gt_test.txt
  python -m unilm_tpu.cli.trocr_eval --gt gt.txt --spm unilm3.model
  # --spm: target side through the NATIVE sentencepiece reader
  # (data/spm.py), the reference's unilm3-cased spm text path — fully
  # offline, no sentencepiece wheel.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.data.trocr_datasets import (
    CharTokenizer,
    load_gt_file,
    load_sroie,
    ocr_batches,
    synthetic_ocr_dataset,
)
from unilm_tpu.models.trocr import TrOCRConfig, TrOCRModel, make_generate_fns
from unilm_tpu.runtime.generate import GenerationConfig, generate
from unilm_tpu.scoring import cer, wer


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sroie", help="SROIE task-2 root dir")
    p.add_argument("--gt", help="IAM/STR-style '<image>\\t<text>' gt file")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=8)
    p.add_argument("--img-size", type=int, default=384)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-new-tokens", type=int, default=24)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--spm", default="",
                   help="sentencepiece .model for the target side (native "
                        "reader; the reference's unilm3-cased path)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.synthetic:
        args.img_size = min(args.img_size, 64)
        data = synthetic_ocr_dataset(args.synthetic_n, args.img_size, args.seed)
    elif args.sroie:
        data = load_sroie(args.sroie, args.img_size)
    elif args.gt:
        data = load_gt_file(args.gt, img_size=args.img_size)
    else:
        p.error("one of --sroie/--gt/--synthetic required")
    if args.limit:
        data = data[: args.limit]

    if args.spm:
        from unilm_tpu.data.trocr_datasets import spm_tokenizer

        tok = spm_tokenizer(args.spm)
    else:
        tok = CharTokenizer()
    kw = dict(img_size=args.img_size, vocab_size=tok.vocab_size)
    if args.tiny:
        kw.update(
            enc_dim=32, enc_layers=1, enc_heads=2, enc_ffn=64,
            dec_dim=32, dec_layers=1, dec_heads=2, dec_ffn=64,
            patch_size=16, use_flash=False,
        )
    cfg = TrOCRConfig(**kw)
    model = TrOCRModel(cfg)

    B = args.batch_size
    dummy_img = jnp.zeros((B, args.img_size, args.img_size, 3), jnp.float32)
    dummy_tok = jnp.zeros((B, 2), jnp.int32)
    if args.checkpoint:
        import torch

        from unilm_tpu.convert.trocr import convert_trocr

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        params = convert_trocr(sd.get("model", sd), cfg)
    else:
        params = jax.jit(
            lambda r: model.init(r, dummy_img, dummy_tok)["params"]
        )(jax.random.PRNGKey(args.seed))

    cache_size = 2 + args.max_new_tokens
    prefill, step = make_generate_fns(model, cache_size=cache_size)
    gcfg = GenerationConfig(
        beam_size=args.beam, max_new_tokens=args.max_new_tokens,
        pad=tok.pad, eos=tok.eos, vocab_size=tok.vocab_size,
    )

    @jax.jit
    def encode(params, images):
        return model.apply({"params": params}, images, method=model.encode)

    refs, hyps = [], []
    for batch in ocr_batches(data, tok, B, max_len=args.max_new_tokens):
        enc = encode(params, jnp.asarray(batch["images"]))
        prompt = jnp.full((B, 1), tok.bos, jnp.int32)
        out, _ = generate(gcfg, prefill, step, params, prompt, aux=enc)
        rows = np.asarray(out[:, 0] if out.ndim == 3 else out)
        for bi in range(B):
            ids = [int(t) for t in rows[bi, 1:]]
            if tok.eos in ids:
                ids = ids[: ids.index(tok.eos)]
            hyps.append(tok.decode(ids))
            # CharTokenizer is a lowercase charset; spm models keep case
            refs.append(batch["texts"][bi] if args.spm
                        else batch["texts"][bi].lower())

    result = {
        "cer": round(cer(refs, hyps), 4),
        "wer": round(wer(refs, hyps), 4),
        "n": len(refs),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
