"""On-chip timing for the flash-attention backward paths.

Compares the fused one-pass backward (_flash_backward_fused: dk/dv VMEM
accumulators, one softmax recompute) against the two-kernel split backward
(UNILM_TPU_SPLIT_BWD=1) on the training shapes that matter:

    python benchmarks/flash_bwd_bench.py [--split]

Prints ms per fwd+bwd and the causal-usable TFLOP/s (7*B*H*T*S*D matmul
FLOPs for the bwd + 2 for the fwd, halved for causal).
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(B, T, S, H, D, causal, dtype, reps=10):
    from unilm_tpu.ops import flash_attention as fa

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, T, H, D), dtype)
    k = jax.random.normal(ks[1], (B, S, H, D), dtype)
    v = jax.random.normal(ks[2], (B, S, H, D), dtype)

    inner = 4  # fwd+bwd per timed call (scan amortizes dispatch overhead)

    @jax.jit
    def f(q, k, v):
        def body(c, _):
            g = jax.grad(
                lambda q: jnp.sum(
                    fa.flash_attention(q, k, v, causal=causal).astype(
                        jnp.float32) ** 2),
            )(q + c)
            # fold into a scalar carry: the scalar fetch is the hard sync
            return jnp.sum(g[:1, :1]).astype(q.dtype) * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), None, length=inner)
        return c

    float(f(q, k, v))  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(q, k, v))  # scalar D2H fetch = hard sync
        times.append((time.perf_counter() - t0 - 0.030) / inner)
    med = statistics.median(times)
    flops = 9.0 * B * H * T * S * D * (0.5 if causal else 1.0)
    return med * 1e3, flops / med / 1e12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--split", action="store_true",
                   help="the two-kernel backward (the default path)")
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args()
    if not args.split:
        os.environ["UNILM_TPU_FUSED_BWD"] = "1"
    print(f"device: {jax.devices()[0].device_kind}  "
          f"path: {'split' if args.split else 'fused'}")
    shapes = [
        # (B, T, S, H, D, causal)   training hot shapes
        (2, 2048, 2048, 32, 64, True),    # 1.3B UniGPT microbatch
        (2, 2048, 2048, 16, 128, True),
        (2, 4096, 4096, 16, 64, True),
        (8, 1024, 1024, 12, 64, True),
        (8, 1024, 1024, 12, 64, False),   # encoder-ish, blocked grid
    ]
    if args.split:
        shapes.append((1, 8192, 8192, 16, 64, True))  # fused gate rejects
    for B, T, S, H, D, causal in shapes:
        ms, tf = bench(B, T, S, H, D, causal, jnp.bfloat16, args.reps)
        print(f"B={B} T={T} H={H} D={D} causal={causal}: "
              f"{ms:7.2f} ms  {tf:6.1f} TF/s")


if __name__ == "__main__":
    main()
