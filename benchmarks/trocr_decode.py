"""TrOCR-base IAM-style decode throughput on one chip (lines/s).

The reference's headline OCR workload is trocr/pic_inference.py:12-60:
DeiT-B encoder over a 384x384 line crop + RoBERTa-large-ish decoder with
beam search through fairseq's generator. This measures the same loop:
encode + beam-5 decode to max_new_tokens, at batch 1 (interactive) and
batch 32 (bulk eval), synthetic inputs (no datasets in this env — decode
compute does not depend on pixel values).
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("UNILM_JAX_CACHE", os.path.expanduser("~/.cache/unilm_tpu_jax")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

TUNNEL_S = 0.030


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--batches", type=int, default=5)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--no_scan", action="store_true",
                   help="unrolled decoder loop (round-4 dispatch-bound "
                        "baseline) instead of the scanned stack")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder projections + output "
                        "head (the bs=1 step is weight-stream-bound)")
    args = p.parse_args()

    from unilm_tpu.models.trocr import TrOCRModel, make_generate_fns, trocr_base
    from unilm_tpu.runtime.generate import GenerationConfig, generate

    if args.tiny:
        from unilm_tpu.models.trocr import TrOCRConfig

        cfg = TrOCRConfig(img_size=32, patch_size=16, enc_dim=32,
                          enc_layers=1, enc_heads=2, enc_ffn=64,
                          dec_dim=32, dec_layers=1, dec_heads=2,
                          dec_ffn=64, vocab_size=128, dtype=jnp.bfloat16,
                          use_flash=False, scan_layers=not args.no_scan)
    else:
        cfg = trocr_base(dtype=jnp.bfloat16, scan_layers=not args.no_scan)
    base_model = TrOCRModel(cfg)
    model = base_model
    if args.int8:
        import dataclasses

        model = TrOCRModel(dataclasses.replace(cfg, quant_weights=True))
    cache = 2 + args.max_new_tokens
    prefill, step = make_generate_fns(model, cache_size=cache)
    gcfg = GenerationConfig(
        beam_size=args.beam, max_new_tokens=args.max_new_tokens,
        vocab_size=cfg.vocab_size, pad=1, eos=2,
        # random weights would hit eos immediately; force the full decode
        # length so the measurement reflects max_new_tokens real steps
        min_new_tokens=args.max_new_tokens)

    for B in (1, 32):
        imgs = jax.random.normal(
            jax.random.PRNGKey(0), (B, cfg.img_size, cfg.img_size, 3),
            jnp.bfloat16)
        params = jax.jit(
            lambda r: base_model.init(
                r, imgs, jnp.ones((B, 2), jnp.int32))["params"]
        )(jax.random.PRNGKey(1))
        jax.block_until_ready(params)
        if args.int8:
            from unilm_tpu.models.trocr import quantize_trocr_decoder

            params = quantize_trocr_decoder(params)

        ITERS = 8  # amortize the ~30 ms tunnel round-trip inside one jit

        @jax.jit
        def run(params, imgs):
            def body(i, acc):
                enc = model.apply(
                    {"params": params}, imgs + (acc * 0.0).astype(imgs.dtype),
                    method=model.encode)
                prompt = jnp.full((B, 1), 0, jnp.int32)  # bos
                toks, _ = generate(gcfg, prefill, step, params, prompt,
                                   aux=enc)
                return acc + toks[:, 0].astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        t0 = time.time()
        float(run(params, imgs))  # scalar D2H fetch = hard sync (axon tunnel)
        print(f"B={B}: compile {time.time()-t0:.1f}s", flush=True)
        times = []
        for _ in range(args.batches):
            t0 = time.time()
            float(run(params, imgs))
            times.append(time.time() - t0)
        print(f"  raw times: {[round(t*1e3,1) for t in times]} ms", flush=True)
        med = max((statistics.median(times) - TUNNEL_S) / ITERS, 1e-6)
        print(f"B={B} beam={args.beam} max_new={args.max_new_tokens}: "
              f"{med*1e3:.1f} ms/batch -> {B/med:.1f} lines/s", flush=True)


if __name__ == "__main__":
    main()
