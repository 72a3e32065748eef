"""BEiT eval throughput at the PUBLISHED-checkpoint configs.

The golden numbers the repo reproduces are mostly BEiT-LARGE
(87.396 @ 224^2, 88.6 @ 512^2 — BASELINE.md, beit/README.md:75-77), while
the driver-audited bench.py line is BEiT-B. This measures img/s/chip for
beit_{base,large} at 224^2 / 384^2 (bf16, fused encoder attention), the
"fast at the config that matters" check.

  python benchmarks/beit_eval.py --model large --img 224 384
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="large", choices=["base", "large"])
    p.add_argument("--img", type=int, nargs="+", default=[224])
    p.add_argument("--batch", type=int, default=0, help="0 = auto per size")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from unilm_tpu.models.beit import (BeitForImageClassification,
                                       beit_base_patch16_224,
                                       beit_large_patch16_224)

    for img in args.img:
        if args.model == "large":
            cfg = beit_large_patch16_224(dtype=jnp.bfloat16)
        else:
            cfg = beit_base_patch16_224(dtype=jnp.bfloat16)
        cfg = type(cfg)(**{**cfg.__dict__, "img_size": img})
        batch = args.batch or (64 if (args.model == "large" and img > 224)
                               else 128)
        model = BeitForImageClassification(cfg)
        images = jax.random.normal(
            jax.random.PRNGKey(0), (batch, img, img, 3), jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.PRNGKey(1), images)

        def loop(params, images):
            def body(i, acc):
                logits = model.apply(params, images + acc * 0.0)
                return acc + jnp.sum(logits.astype(jnp.float32))
            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        run = jax.jit(loop)
        t0 = time.time()
        float(run(params, images))
        print(f"{args.model}@{img}: compile {time.time()-t0:.1f}s", flush=True)
        times = []
        for _ in range(5):
            t0 = time.time()
            float(run(params, images))
            times.append(time.time() - t0)
        tunnel = 0.030 if jax.default_backend() == "tpu" else 0.0
        t = max(statistics.median(times) - tunnel, 1e-9)
        print(f"beit_{args.model} {img}x{img} B={batch}: "
              f"{batch*args.iters/t:.1f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
