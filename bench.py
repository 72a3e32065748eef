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

    @jax.jit
    def ttft(params, patches, tokens, img_mask, segs):
        feats = model.apply({"params": params}, patches,
                            method=model.encode_image)
        logits, _ = model.apply(
            {"params": params}, tokens, cache, feats, img_mask, segs, True,
            method=model.prefill, mutable=["cache"],
        )
        return logits[:, -1].astype(jnp.float32).sum()

    float(ttft(params, patches, tokens, img_mask, segs))  # compile
    times = []
    for _ in range(iters):
        t0 = time.time()
        float(ttft(params, patches, tokens, img_mask, segs))
        times.append(time.time() - t0)
    med = statistics.median(times)
    if on_tpu:
        med = max(med - 0.030, 1e-6)  # axon tunnel round-trip
    out = {
        "metric": "Kosmos-2.5 p50 TTFT (bs=1)",
        "value": round(med * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round(TTFT_TARGET_MS / (med * 1e3), 3),
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
    on_tpu = jax.default_backend() == "tpu"
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


if __name__ == "__main__":
    main()
