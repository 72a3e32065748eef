"""Headline benchmarks, one JSON line each.

Line 1 — BEiT-B ImageNet-1k eval throughput (images/sec/chip). Matches
BASELINE.json config #1 (run_class_finetuning --eval). The baseline is
A100-parity for ViT-B/16 224 inference (~1500 img/s with PyTorch AMP on
one A100, no TensorRT); vs_baseline = ours / 1500.

Line 2 — UniGPT-1.3B pretrain train-step MFU (the reference's hot path:
fairseq Trainer.train_step, kosmos-2/fairseq/fairseq/trainer.py:782, run
under kosmos-2/train.sh's --memory-efficient-fp16 + flash config). Runs
benchmarks/train_mfu.py's gpt1p3b workload in its headline configuration
(bf16 params, no remat, Pallas flash fwd+bwd, chunked-vocab CE). The
baseline is 0.50 MFU — the A100-class Megatron/fairseq efficiency band for
a 1.3B dense decoder — so vs_baseline = mfu / 0.50 is hardware-normalized.

Note: the axon tunnel adds ~30 ms per synced host call, so iterations are
amortized inside one jitted lax.fori_loop / lax.scan.
"""

import argparse
import json
import os
import statistics
import time
import traceback

import jax
import jax.numpy as jnp

# Persistent compilation cache (same knobs as tests/conftest.py): this host
# is CPU-starved, so XLA compiles dominate wall time on first runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("UNILM_JAX_CACHE", os.path.expanduser("~/.cache/unilm_tpu_jax")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from unilm_tpu.models.beit import BeitForImageClassification, beit_base_patch16_224

A100_BASELINE_IMG_S = 1500.0
REFERENCE_TRAIN_MFU = 0.50
TTFT_TARGET_MS = 150.0  # BASELINE.json: Kosmos-2.5 p50 TTFT < 150 ms, bs=1


def bench_ttft(on_tpu: bool):
    """Line 3 — Kosmos-2.5 p50 TTFT at batch 1 (benchmarks/kosmos_ttft.py
    inlined): Pix2Struct tower over max_patches + latent-query resample +
    full multimodal prefill to the first logits. vs_baseline > 1 means
    FASTER than the 150 ms north-star target (target / measured)."""
    from unilm_tpu.models.kosmos import (Pix2StructVisionConfig, UniGPT,
                                         kosmos2_5)

    if on_tpu:
        image_tokens, max_patches, iters = 2048, 4096, 7
        cfg = kosmos2_5(dtype=jnp.bfloat16, latent_query_num=image_tokens)
    else:  # CPU smoke: harness check only
        image_tokens, max_patches, iters = 8, 16, 2
        from unilm_tpu.models.kosmos import UniGPTConfig

        cfg = UniGPTConfig(
            vocab_size=128, embed_dim=64, num_layers=2, num_heads=4,
            ffn_dim=128, max_positions=64, image_tower="pix2struct",
            latent_query_num=image_tokens,
            pix2struct=Pix2StructVisionConfig(
                hidden_size=32, num_layers=1, num_heads=2, d_ff=64, d_kv=16,
                patch_dim=12, max_rows=16, use_flash=False),
            use_flash=False)
    model = UniGPT(cfg)
    B = 1
    T = image_tokens + 4
    cache = T + (4000 if on_tpu else 16)
    tokens = jnp.full((B, T), 4, jnp.int32)
    img_mask = jnp.zeros((B, T), bool).at[:, 2:2 + image_tokens].set(True)
    segs = jnp.zeros((B, T), jnp.int32).at[:, 1:3 + image_tokens].set(1)
    patch_dim = 2 + (768 if on_tpu else cfg.pix2struct.patch_dim)
    patches = jax.random.normal(
        jax.random.PRNGKey(0), (B, max_patches, patch_dim), cfg.dtype)

    params = jax.jit(
        lambda r: model.init(r, tokens, patches, img_mask, segs)["params"]
    )(jax.random.PRNGKey(1))
    jax.block_until_ready(params)

    # Amortize the axon tunnel round-trip INSIDE one jit (INNER TTFT
    # computations per host call) instead of subtracting the raw 30 ms
    # constant from a single measurement — a +-10 ms error in the constant
    # now moves the result by ~10/INNER ms (round-4 advisor finding).
    INNER = 4 if on_tpu else 1

    @jax.jit
    def ttft(params, patches, tokens, img_mask, segs):
        def one(i, acc):
            feats = model.apply(
                {"params": params}, patches + (acc * 0.0).astype(patches.dtype),
                method=model.encode_image)
            logits, _ = model.apply(
                {"params": params}, tokens, cache, feats, img_mask, segs,
                True, method=model.prefill, mutable=["cache"],
            )
            return acc + logits[:, -1].astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, INNER, one, 0.0)

    float(ttft(params, patches, tokens, img_mask, segs))  # compile
    times = []
    for _ in range(iters):
        t0 = time.time()
        float(ttft(params, patches, tokens, img_mask, segs))
        times.append(time.time() - t0)
    med = statistics.median(times)
    if on_tpu:
        med = max(med - 0.030, 1e-6)  # tunnel round-trip (amortized /INNER)
    med = med / INNER
    out = {
        "metric": "Kosmos-2.5 p50 TTFT (bs=1)",
        "value": round(med * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(TTFT_TARGET_MS / (med * 1e3), 3),
    }
    if not on_tpu:
        out["smoke"] = True
    print(json.dumps(out), flush=True)


DECODE_TARGET_MS = 2.5  # interactive bs=1 decode target (ms/token):
# int8 weight stream (~0.83 ms) + bf16 lm head/KV reads + step overhead on
# one v5e; vs_baseline > 1 means faster than target.
SERVING_BASELINE_TOK_S = 1460.0  # round-1 self-reported engine decode
# number this line AUDITS (B=8, ctx 2048, int8 KV, contiguous-run kernel).


def bench_decode(on_tpu: bool):
    """Line 4 — Kosmos-2.5 bs=1 interactive decode (ms/token) after a
    2053-token multimodal prefill: the reference's inference.py decode loop
    (kosmos-2.5/inference.py:332, steps 1..N of §3.4). Headline config =
    scanned layer stack (ONE lax.scan over stacked params, slab-streaming
    kv_len-bounded decode kernel) + int8 weight-only projections + int8 LM
    head (benchmarks/kosmos_ttft.py --int8)."""
    import dataclasses

    from unilm_tpu.models.kosmos import (UniGPT, UniGPTConfig, kosmos2_5,
                                         make_unigpt_generate_fns,
                                         quantize_lm_head)
    from unilm_tpu.ops.quant import quantize_dense_tree

    if on_tpu:
        # 64 amortized steps: the +-10 ms host-call constant is then worth
        # +-0.16 ms/token on the measurement
        T, steps, iters = 2052, 64, 5
        cfg = kosmos2_5(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                        image_tower=None, scan_layers=True,
                        kv_cache_dtype="int8")
    else:
        T, steps, iters = 8, 4, 2
        cfg = UniGPTConfig(vocab_size=256, embed_dim=64, num_layers=2,
                           num_heads=4, ffn_dim=128, max_positions=64,
                           use_flash=False, scan_layers=True)
    model = UniGPT(cfg)
    cache = T + (4000 if on_tpu else 16)
    tokens = jnp.full((1, T), 4, jnp.int32)
    params = jax.jit(lambda r: model.init(r, tokens)["params"])(
        jax.random.PRNGKey(1))
    jax.block_until_ready(params)
    _PROJ = {"q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2", "fc3"}
    params = quantize_dense_tree(
        params, predicate=lambda p: p[-2] in _PROJ and any(
            s.startswith("layers") for s in p))
    params = quantize_lm_head(params)
    cfg = dataclasses.replace(cfg, quant_weights=True, quant_lm_head=True)
    model = UniGPT(cfg)
    prefill, step = make_unigpt_generate_fns(model, cache_size=cache)

    def decode_loop(params, cache_state, tok):
        def body(i, carry):
            tok, cache_state, acc = carry
            logits, cache_state = step(params, tok, cache_state, None)
            nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            return (nxt, cache_state, acc + logits.astype(jnp.float32).sum())

        _, _, acc = jax.lax.fori_loop(0, steps, body,
                                      (tok, cache_state, 0.0))
        return acc

    _, cache_vars = prefill(params, tokens, None)
    jd = jax.jit(decode_loop)
    float(jd(params, cache_vars, tokens[:, -1:]))  # compile
    times = []
    for _ in range(iters):
        t0 = time.time()
        float(jd(params, cache_vars, tokens[:, -1:]))
        times.append(time.time() - t0)
    med = statistics.median(times)
    if on_tpu:
        med = max(med - 0.030, 1e-6)  # tunnel, amortized over `steps`
    per_tok_ms = med / steps * 1e3
    out = {
        "metric": "Kosmos-2.5 bs=1 decode (int8, 2k ctx)",
        "value": round(per_tok_ms, 2),
        "unit": "ms/token",
        "tok_s": round(1e3 / per_tok_ms, 1),
        "vs_baseline": round(DECODE_TARGET_MS / per_tok_ms, 3),
    }
    if not on_tpu:
        out["smoke"] = True
    print(json.dumps(out), flush=True)


def bench_serving(on_tpu: bool):
    """Line 5 — serving engine decode throughput (tokens/sec) at the
    recommended single-chip config: 1.3B text decoder, B=8
    continuous-batching slots, ctx 2048, int8 KV pool + int8 weight-only
    projections + scanned layer stack, contiguous-run slab kernel
    (ServingConfig(kv_dtype='int8', weight_dtype='int8') on a
    scan_layers model). Audits the round-1 self-reported 1,460 tok/s
    (vs_baseline = ours / 1460)."""
    import dataclasses

    import numpy as np

    from unilm_tpu.models.kosmos import (UniGPT, UniGPTConfig, kosmos2_5,
                                         stack_unigpt_params)
    from unilm_tpu.ops.quant import quantize_dense_tree
    from unilm_tpu.runtime.serving import PagedGPT

    if on_tpu:
        B, ctx, steps, page, iters = 8, 2048, 32, 64, 5
        cfg = kosmos2_5(dtype=jnp.bfloat16, image_tower=None)
    else:
        B, ctx, steps, page, iters = 2, 32, 4, 16, 2
        cfg = UniGPTConfig(vocab_size=256, embed_dim=64, num_layers=2,
                           num_heads=4, ffn_dim=128, max_positions=64,
                           use_flash=False)
    model = UniGPT(cfg)
    params = jax.jit(
        lambda r: model.init(r, jnp.ones((1, 8), jnp.int32))["params"]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if on_tpu:
        params = stack_unigpt_params(dict(params), cfg.num_layers)
        _PROJ = {"q_proj", "k_proj", "v_proj", "out_proj",
                 "fc1", "fc2", "fc3"}
        params = quantize_dense_tree(
            params, predicate=lambda p: p[-2] in _PROJ and any(
                s.startswith("layers") for s in p))
        cfg = dataclasses.replace(cfg, scan_layers=True, quant_weights=True)
    paged = PagedGPT(cfg)
    H, D = cfg.num_heads, cfg.embed_dim // cfg.num_heads
    chunk = 8
    mp = -(-(ctx + steps) // page)
    stride = -(-mp // chunk) * chunk
    num_pages = chunk + B * stride + chunk
    L = cfg.num_layers
    quant = on_tpu
    kv_dt = jnp.int8 if quant else cfg.dtype
    k_pools = jnp.zeros((L * num_pages, page, H * D), kv_dt)
    v_pools = jnp.zeros_like(k_pools)
    scale_pool = (jnp.full((L * num_pages // chunk, 8, chunk * page), 0.01,
                           jnp.float32) if quant else None)
    bases_np = chunk + stride * np.arange(B, dtype=np.int32)
    tables = jnp.asarray(bases_np[:, None] + np.arange(mp, dtype=np.int32))
    bases = jnp.asarray(bases_np)
    lengths0 = jnp.full((B,), ctx, jnp.int32)
    tok0 = jnp.full((B, 1), 4, jnp.int32)

    def loop(params, k_pools, v_pools, tok, lengths):
        def body(i, carry):
            tok, k_pools, v_pools, sp, lengths, acc = carry
            res = paged.apply(
                {"params": params}, tok, k_pools, v_pools, tables, lengths,
                jnp.ones_like(lengths),
                bases=bases if on_tpu else None,
                scale_pool=sp if quant else None)
            if quant:
                logits, k_pools, v_pools, sp = res
            else:
                logits, k_pools, v_pools = res
            nxt = jnp.argmax(
                logits[:, -1].astype(jnp.float32), -1)[:, None].astype(jnp.int32)
            return (nxt, k_pools, v_pools, sp, lengths + 1,
                    acc + logits.astype(jnp.float32).sum())

        _, _, _, _, _, acc = jax.lax.fori_loop(
            0, steps, body,
            (tok, k_pools, v_pools,
             scale_pool if quant else jnp.zeros((), jnp.float32),
             lengths, 0.0))
        return acc

    jl = jax.jit(loop)
    float(jl(params, k_pools, v_pools, tok0, lengths0))  # compile
    times = []
    for _ in range(iters):
        t0 = time.time()
        float(jl(params, k_pools, v_pools, tok0, lengths0))
        times.append(time.time() - t0)
    med = statistics.median(times)
    if on_tpu:
        med = max(med - 0.030, 1e-6)
    tok_s = B * steps / med
    out = {
        "metric": "Serving engine decode (B=8, int8 KV)",
        "value": round(tok_s, 1),
        "unit": "tokens/sec",
        "step_ms": round(med / steps * 1e3, 2),
        "vs_baseline": round(tok_s / SERVING_BASELINE_TOK_S, 3),
    }
    if not on_tpu:
        out["smoke"] = True
    print(json.dumps(out), flush=True)


def bench_train(on_tpu: bool):
    """1.3B train-step MFU via benchmarks/train_mfu.py (gpt1p3b workload)."""
    from benchmarks.train_mfu import bench_gpt

    args = argparse.Namespace(
        seq=2048 if on_tpu else 128,
        micro_batch=2,
        accum=4 if on_tpu else 1,
        optimizer="adafactor",
        fused_ce=True,
        ce_chunk=8192 if on_tpu else 256,
        tiny=not on_tpu,  # CPU smoke: harness check, not a measurement
        no_flash=not on_tpu,
        no_remat=True,
        remat_policy="full",
        param_dtype="bf16",
        breakdown=False,
        inner=4 if on_tpu else 2,
        steps=5 if on_tpu else 2,
    )
    r = bench_gpt(args)
    out = {
        "metric": "UniGPT-1.3B train step",
        "value": max(r["tokens_per_s"], 0),
        "unit": "tokens/sec/chip",
        "mfu": max(r["mfu"], 0.0),
        "step_ms": r["step_ms"],
        "vs_baseline": round(max(r["mfu"], 0.0) / REFERENCE_TRAIN_MFU, 3),
    }
    if not on_tpu:
        out["smoke"] = True  # tiny config: harness check, not a measurement
    print(json.dumps(out), flush=True)


def main():
    # Fail fast if the axon tunnel is wedged: backend init then hangs
    # indefinitely inside make_c_api_client (a killed client can leave the
    # TPU grant unreleased). Better a clear error line + nonzero exit than
    # a silent driver timeout. Normal first init is ~10-30 s.
    import os as _os
    import threading as _threading

    def _init_timed_out():
        print(json.dumps({
            "metric": "backend-init",
            "error": "TPU backend init exceeded 300s — axon tunnel likely "
                     "wedged (see PERFORMANCE.md machine notes); no "
                     "benchmarks were run",
        }), flush=True)
        _os._exit(3)

    _watchdog = _threading.Timer(300.0, _init_timed_out)
    _watchdog.daemon = True
    _watchdog.start()
    on_tpu = jax.default_backend() == "tpu"
    _watchdog.cancel()
    batch = 128 if on_tpu else 8
    iters = 20 if on_tpu else 2
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = beit_base_patch16_224(dtype=dtype, use_flash=on_tpu)
    if not on_tpu:
        cfg = type(cfg)(**{**cfg.__dict__, "num_layers": 2})
    model = BeitForImageClassification(cfg)

    rng = jax.random.PRNGKey(0)
    images = jax.random.normal(rng, (batch, cfg.img_size, cfg.img_size, 3), dtype)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), images)

    def loop(params, images):
        def body(i, acc):
            logits = model.apply(params, images + acc * 0.0)
            return acc + jnp.sum(logits.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    run = jax.jit(loop)
    float(run(params, images))  # compile
    times = []
    for _ in range(5):
        t0 = time.time()
        float(run(params, images))
        times.append(time.time() - t0)
    t = statistics.median(times)
    if on_tpu:
        # Subtract the axon tunnel's host round-trip (~30 ms measured on this
        # image; an empty jitted call costs 28-32 ms wall). Sensitivity: the
        # loop runs batch*iters=2560 images in ~1 s, so a +-10 ms error in
        # this constant moves the result by only ~1%.
        t = max(t - 0.030, 1e-6)
    img_s = batch * iters / t

    print(
        json.dumps(
            {
                "metric": "BEiT-B ImageNet eval throughput",
                "value": round(img_s, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s / A100_BASELINE_IMG_S, 3),
            }
        ),
        flush=True,
    )

    # Train-step and TTFT metrics are additive: a failure must not take
    # down the eval headline above, so keep rc=0 and report errors inline.
    try:
        bench_train(on_tpu)
    except Exception:
        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "UniGPT-1.3B train step",
                    "value": None,
                    "unit": "tokens/sec/chip",
                    "error": "train benchmark failed; see traceback above",
                }
            ),
            flush=True,
        )
    try:
        bench_ttft(on_tpu)
    except Exception:
        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "Kosmos-2.5 p50 TTFT (bs=1)",
                    "value": None,
                    "unit": "ms",
                    "error": "ttft benchmark failed; see traceback above",
                }
            ),
            flush=True,
        )
    try:
        bench_decode(on_tpu)
    except Exception:
        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "Kosmos-2.5 bs=1 decode (int8, 2k ctx)",
                    "value": None,
                    "unit": "ms/token",
                    "error": "decode benchmark failed; see traceback above",
                }
            ),
            flush=True,
        )
    try:
        bench_serving(on_tpu)
    except Exception:
        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "Serving engine decode (B=8, int8 KV)",
                    "value": None,
                    "unit": "tokens/sec",
                    "error": "serving benchmark failed; see traceback above",
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
