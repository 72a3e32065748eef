"""Serving decode throughput: paged engine vs contiguous full-cache decode.

Measures tokens/sec for the Kosmos-2.5 1.3B text decoder (E=1536, 24L) at
several batch sizes:

- "contiguous": the single-stream generate path (core attention cache,
  static cache_size = prompt+4000) batched naively — every step reads the
  FULL padded cache for every sequence.
- "paged": PagedGPT decode over the page pool + block tables (Pallas
  block-table kernel) — every step reads only each sequence's true pages.

The decode loop runs on-device (lax.fori_loop in one jit) and the axon
tunnel round-trip (~30 ms) is subtracted.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    fn(*args)  # compile / warmup
    times = []
    for _ in range(reps):
        t0 = time.time()
        fn(*args)
        times.append(time.time() - t0)
    return max(statistics.median(times) - 0.030, 1e-9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 8, 16])
    p.add_argument("--ctx", type=int, default=2048, help="tokens already in cache")
    p.add_argument("--cache", type=int, default=6144, help="contiguous cache size")
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--page_size", type=int, default=64)
    p.add_argument("--skip_full", action="store_true", help="skip the full-cache baseline")
    p.add_argument("--paths", default="table,run", help="comma list: table,run")
    p.add_argument("--kv", default="model", help="model | int8 (run path only)")
    args = p.parse_args()

    from unilm_tpu.models.kosmos import UniGPT, kosmos2_5, make_unigpt_generate_fns
    from unilm_tpu.runtime.serving import PagedGPT, ServingConfig

    cfg = kosmos2_5(dtype=jnp.bfloat16)
    cfg = type(cfg)(**{**cfg.__dict__, "image_tower": None})
    model = UniGPT(cfg)
    params = jax.jit(
        lambda r: model.init(r, jnp.ones((1, 8), jnp.int32))["params"]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print("params ready (1.3B decoder, bf16)")

    paged = PagedGPT(cfg)
    H, D = cfg.num_heads, cfg.embed_dim // cfg.num_heads

    for B in args.batches:
        # ---- contiguous: prefill ctx tokens, decode over full static cache.
        # The cache is donated (as runtime.generate's while_loop carry would
        # be), so each timing rep re-prefills a fresh cache (untimed).
        prefill, step = make_unigpt_generate_fns(model, cache_size=args.cache)
        tokens = jnp.full((B, args.ctx), 4, jnp.int32)

        def loop_contig(params, cache, tok):
            def body(i, carry):
                tok, cache, acc = carry
                logits, cache = step(params, tok, cache, None)
                nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
                return (nxt, cache, acc + logits.astype(jnp.float32).sum())
            _, _, acc = jax.lax.fori_loop(
                0, args.steps, body, (tok, cache, 0.0))
            return acc

        jc = jax.jit(loop_contig, donate_argnums=(1,))

        def contig_once():
            _, cache = prefill(params, tokens, None)
            jax.block_until_ready(cache)
            t0 = time.time()
            float(jc(params, cache, tokens[:, -1:]))
            return time.time() - t0

        if args.skip_full:
            t_contig = None
        else:
          try:
            contig_once()  # compile
            t_contig = max(
                statistics.median([contig_once() for _ in range(5)]) - 0.030,
                1e-9,
            )
          except Exception as e:  # noqa: BLE001 - report OOM as a result
            t_contig = None
            print(f"B={B:3d}: full-cache OOM/failed ({type(e).__name__})")

        # ---- paged: pool sized for B sequences of ctx+steps tokens
        # (+chunk_pages tail margin for the run kernel's slab overread)
        chunk = 8
        mp = -(-(args.ctx + args.steps) // args.page_size)
        stride = -(-mp // chunk) * chunk  # chunk-aligned run stride
        num_pages = chunk + B * stride + chunk
        scfg = ServingConfig(page_size=args.page_size, num_pages=num_pages,
                             max_pages_per_seq=mp, chunk_pages=chunk)
        L = cfg.num_layers
        kv_dt = jnp.int8 if args.kv == "int8" else cfg.dtype
        k_pools = jnp.zeros((L * num_pages, args.page_size, H * D), kv_dt)
        v_pools = jnp.zeros_like(k_pools)
        scale_pool = None
        if args.kv == "int8":
            nslab = L * num_pages // chunk
            scale_pool = jnp.full(
                (nslab, 8, chunk * args.page_size), 0.01, jnp.float32)
        bases_np = chunk + stride * np.arange(B, dtype=np.int32)
        tables = jnp.asarray(bases_np[:, None] + np.arange(mp, dtype=np.int32))
        bases = jnp.asarray(bases_np)
        lengths = jnp.full((B,), args.ctx, jnp.int32)

        def make_loop(use_bases):
            quant = scale_pool is not None and use_bases
            def loop_paged(params, k_pools, v_pools, tok, lengths):
                def body(i, carry):
                    tok, k_pools, v_pools, sp, lengths, acc = carry
                    res = paged.apply(
                        {"params": params}, tok, k_pools, v_pools, tables,
                        lengths, jnp.ones_like(lengths),
                        bases=bases if use_bases else None,
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
                    0, args.steps, body,
                    (tok, k_pools, v_pools,
                     scale_pool if quant else jnp.zeros((), jnp.float32),
                     lengths, 0.0))
                return acc
            return jax.jit(loop_paged)  # no donation: timeit reuses the pools

        paths = args.paths.split(",")
        t_paged = t_run = None
        if "table" in paths:
            jp = make_loop(False)
            t_paged = timeit(lambda: float(jp(params, k_pools, v_pools,
                                              tokens[:, -1:], lengths)))
        if "run" in paths:
            jr = make_loop(True)
            t_run = timeit(lambda: float(jr(params, k_pools, v_pools,
                                            tokens[:, -1:], lengths)))

        n = B * args.steps
        contig_txt = (
            f"full-cache {n/t_contig:8.1f} tok/s ({t_contig/args.steps*1e3:6.2f} ms/step)"
            if t_contig else "full-cache OOM"
        )
        table_txt = (f"paged-table {n/t_paged:8.1f} tok/s "
                     f"({t_paged/args.steps*1e3:6.2f} ms/step)"
                     if t_paged else "paged-table skipped")
        run_txt = (f"paged-run {n/t_run:8.1f} tok/s "
                   f"({t_run/args.steps*1e3:6.2f} ms/step)"
                   if t_run else "paged-run skipped")
        print(f"B={B:3d} ctx={args.ctx}: {contig_txt} | {table_txt} | {run_txt}")


if __name__ == "__main__":
    main()
