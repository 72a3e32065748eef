"""Headline benchmark: BEiT-B ImageNet-1k eval throughput (images/sec/chip).

Matches BASELINE.json config #1 (run_class_finetuning --eval). The baseline
is A100-parity for ViT-B/16 224 inference (~1500 img/s with PyTorch AMP on
one A100, no TensorRT); vs_baseline = ours / 1500.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Note: the axon tunnel adds ~30 ms per synced host call, so iterations are
amortized inside one jitted lax.fori_loop.
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp

from unilm_tpu.models.beit import BeitForImageClassification, beit_base_patch16_224

A100_BASELINE_IMG_S = 1500.0


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
        )
    )


if __name__ == "__main__":
    main()
