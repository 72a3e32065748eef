"""Kosmos-2.5 TTFT benchmark: time-to-first-token at batch 1 on one chip.

North-star target (BASELINE.json): p50 TTFT < 150 ms on v5e.
TTFT = vision tower over max_patches flattened patches + latent-query
resample + 2053-token decoder prefill (bos + <image> + 2048 + </image> + task)
producing the first logits.

The axon tunnel adds ~30 ms per synced host call; we amortize by looping
inside jit (N iterations) and subtracting the tunnel constant.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max_patches", type=int, default=4096)
    p.add_argument("--image_tokens", type=int, default=2048)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--decode_steps", type=int, default=32)
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decoder projections for the decode"
                        " loop (the ~2.6 GB bf16 weight stream bounds bs=1"
                        " decode; int8 halves the floor)")
    p.add_argument("--no_scan", action="store_true",
                   help="unrolled Python layer loop instead of the scanned "
                        "stack (the round-4 dispatch-bound baseline)")
    args = p.parse_args()

    from unilm_tpu.models.kosmos import UniGPT, kosmos2_5, make_unigpt_generate_fns

    cfg = kosmos2_5(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                    latent_query_num=args.image_tokens,  # --memory-efficient-fp16
                    scan_layers=not args.no_scan)
    model = UniGPT(cfg)

    B = 1
    T = args.image_tokens + 4  # bos <image> ... </image> <md>
    cache = T + 4000
    tokens = jnp.full((B, T), 4, jnp.int32)
    img_mask = jnp.zeros((B, T), bool).at[:, 2 : 2 + args.image_tokens].set(True)
    segs = jnp.zeros((B, T), jnp.int32).at[:, 1 : 3 + args.image_tokens].set(1)
    patches = jax.random.normal(
        jax.random.PRNGKey(0), (B, args.max_patches, 2 + 768), jnp.bfloat16
    )

    t0 = time.time()
    params = jax.jit(lambda r: model.init(r, tokens, patches, img_mask, segs)["params"])(
        jax.random.PRNGKey(1)
    )
    jax.block_until_ready(params)
    print(f"init: {time.time()-t0:.1f}s  (1.3B decoder + 18L vision tower, bf16)")

    prefill, step = make_unigpt_generate_fns(model, cache_size=cache)

    # --- full TTFT: tower + resampler + prefill, one fused jit ------------
    @jax.jit
    def ttft(params, patches, tokens, img_mask, segs):
        feats = model.apply({"params": params}, patches, method=model.encode_image)
        logits, cache_vars = model.apply(
            {"params": params}, tokens, cache, feats, img_mask, segs, True,
            method=model.prefill, mutable=["cache"],
        )
        return logits[:, -1].astype(jnp.float32).sum()

    t0 = time.time()
    float(ttft(params, patches, tokens, img_mask, segs))
    print(f"TTFT compile: {time.time()-t0:.1f}s")
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        float(ttft(params, patches, tokens, img_mask, segs))
        times.append(time.time() - t0)
    med = statistics.median(times) - 0.030  # tunnel round-trip
    print(f"TTFT p50: {med*1e3:.1f} ms  (target < 150 ms)  all={sorted(round(t*1e3,1) for t in times)}")

    # --- decode throughput -------------------------------------------------
    if args.int8:
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
            # int8 KV joins the explicitly lossy mode (the bench.py line-4
            # headline config); bf16 KV stays on the default scanned path
            kv_cache_dtype="int8" if cfg.scan_layers else cfg.kv_cache_dtype)
        model = UniGPT(cfg)
        prefill, step = make_unigpt_generate_fns(model, cache_size=cache)

    def decode_loop(params, cache_state, tok):
        def body(i, carry):
            tok, cache_state, acc = carry
            logits, cache_state = step(params, tok, cache_state, None)
            nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            return (nxt, cache_state, acc + logits.astype(jnp.float32).sum())
        tok, cache_state, acc = jax.lax.fori_loop(
            0, args.decode_steps, body, (tok, cache_state, 0.0)
        )
        return acc

    logits, cache_vars = prefill(params, tokens, None)  # no image: fine for timing
    jd = jax.jit(decode_loop)
    t0 = time.time()
    float(jd(params, cache_vars, tokens[:, -1:]))
    print(f"decode compile: {time.time()-t0:.1f}s")
    times = []
    for _ in range(5):
        t0 = time.time()
        float(jd(params, cache_vars, tokens[:, -1:]))
        times.append(time.time() - t0)
    per_tok = (statistics.median(times) - 0.030) / args.decode_steps
    print(f"decode: {per_tok*1e3:.2f} ms/token ({1/per_tok:.1f} tok/s)")


if __name__ == "__main__":
    main()
