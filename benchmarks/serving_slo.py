"""Serving SLO benchmark: Poisson arrivals -> p50/p99 TTFT and TPOT per class.

The reference serves its models through inference scripts
(kosmos-2.5/inference.py) and defers production serving to vLLM-class
engines whose story is exactly these SLOs; this measures them for
runtime/serving.ServingEngine under a mixed continuous-batching load:

- open-loop Poisson arrival process at --rate req/s for --duration s,
  seeded (the trace is deterministic given the flags);
- two request classes: `short` (--short_prompt tokens, default 64) and
  `long` (--long_prompt, default 1024), mixed at --long_frac;
- TTFT = first emitted token wall-time minus SCHEDULED arrival (includes
  queueing); TPOT = (last - first token time) / (n_tokens - 1);
- decode stall = the longest gap between consecutive emitted tokens of a
  request, after its first token: the metric chunked prefill bounds
  (a full-prompt prefill of a long arrival stalls every running decode
  for the whole prompt; a Sarathi-style chunk stalls them for one bucket).

Variants: --prefill_bucket N (64 = chunked, >= long prompt = unchunked),
--kv int8, --weights int8. Model: the Kosmos-2.5 1.3B text decoder
(E=1536, 24L) as in serving_bench.py; --tiny for a CPU harness check.

Prints one JSON line per class plus an aggregate line.
"""

import argparse
import json
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache (same knobs as tests/conftest.py): this host is
# CPU-starved, so XLA compiles dominate wall time; cache pays the cost once
# across the chunked/unchunked/int8 config sweep.
_cache_dir = os.environ.get("UNILM_JAX_CACHE",
                            os.path.expanduser("~/.cache/unilm_tpu_jax"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def make_trace(args):
    """Deterministic Poisson trace: [(arrival_s, req_id, class, prompt, gen)]."""
    rng = np.random.RandomState(args.seed)
    trace, t = [], 0.0
    i = 0
    while t < args.duration:
        t += rng.exponential(1.0 / args.rate)
        if t >= args.duration:
            break
        is_long = rng.rand() < args.long_frac
        plen = args.long_prompt if is_long else args.short_prompt
        prompt = rng.randint(3, args.vocab - 1, size=plen).tolist()
        trace.append((t, f"r{i}", "long" if is_long else "short",
                      prompt, args.gen_tokens))
        i += 1
    return trace


def drive(engine, trace):
    """Run the engine against the timed trace; returns per-request metrics.

    Mirrors ServingEngine.run()'s scheduler loop (admit -> one prefill
    chunk -> one decode step) but gated on the wall clock so arrivals
    land mid-flight."""
    pending = deque(trace)
    arrival = {r[1]: r[0] for r in trace}
    cls = {r[1]: r[2] for r in trace}
    tok_times = {r[1]: [] for r in trace}
    counts = {r[1]: 0 for r in trace}

    t0 = time.perf_counter()
    while (pending or engine.queue or engine.active.any()
           or engine._prefilling_slots()):
        now = time.perf_counter() - t0
        while pending and pending[0][0] <= now:
            _, rid, _, prompt, gen = pending.popleft()
            engine.submit(rid, prompt, gen)
        while engine._try_admit():
            pass
        pre = engine._prefilling_slots()
        if pre:
            engine._prefill_chunk(pre[0])
        if engine.active.any():
            engine.step()
        elif not pre and not engine.queue and pending:
            time.sleep(min(max(pending[0][0] - now, 0.0), 0.002))
        now = time.perf_counter() - t0
        for rid, toks in engine.outputs.items():
            n = len(toks)
            while counts[rid] < n:  # one timestamp per new token
                tok_times[rid].append(now)
                counts[rid] += 1

    recs = []
    for rid, times in tok_times.items():
        if len(times) < 2:
            continue
        gaps = np.diff(times)
        recs.append({
            "cls": cls[rid],
            "ttft": times[0] - arrival[rid],
            "tpot": (times[-1] - times[0]) / (len(times) - 1),
            "stall": float(gaps.max()),
            "n": len(times),
        })
    return recs


def summarize(recs, wall):
    out = []
    for c in ("short", "long"):
        rs = [r for r in recs if r["cls"] == c]
        if not rs:
            continue
        pct = lambda k, q: round(float(np.percentile([r[k] for r in rs], q)) * 1e3, 1)
        out.append({
            "class": c, "requests": len(rs),
            "ttft_p50_ms": pct("ttft", 50), "ttft_p99_ms": pct("ttft", 99),
            "tpot_p50_ms": pct("tpot", 50), "tpot_p99_ms": pct("tpot", 99),
            "stall_p99_ms": pct("stall", 99),
        })
    total_tok = sum(r["n"] for r in recs)
    out.append({"class": "all", "requests": len(recs),
                "tokens": total_tok,
                "tok_per_s": round(total_tok / wall, 1),
                "wall_s": round(wall, 1)})
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rate", type=float, default=2.0, help="arrivals/s")
    p.add_argument("--duration", type=float, default=30.0)
    p.add_argument("--long_frac", type=float, default=0.25)
    p.add_argument("--short_prompt", type=int, default=64)
    p.add_argument("--long_prompt", type=int, default=1024)
    p.add_argument("--gen_tokens", type=int, default=64)
    p.add_argument("--prefill_bucket", type=int, default=64)
    p.add_argument("--kv", default="model", choices=["model", "int8"])
    p.add_argument("--weights", default="model", choices=["model", "int8"])
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    from unilm_tpu.models.kosmos import UniGPT, UniGPTConfig, kosmos2_5
    from unilm_tpu.runtime.serving import ServingConfig, ServingEngine

    if args.tiny:
        cfg = UniGPTConfig(vocab_size=256, embed_dim=32, num_layers=2,
                           num_heads=2, ffn_dim=48, max_positions=2048,
                           use_flash=False, image_tower=None)
    else:
        cfg = kosmos2_5(dtype=jnp.bfloat16)
        cfg = type(cfg)(**{**cfg.__dict__, "image_tower": None})
    args.vocab = cfg.vocab_size
    t_init = time.perf_counter()
    model = UniGPT(cfg)
    params = jax.jit(
        lambda r: model.init(r, jnp.ones((1, 8), jnp.int32))["params"]
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    print(f"[slo] init {time.perf_counter() - t_init:.1f}s", file=sys.stderr)

    page = 64
    pages_per_seq = -(-(args.long_prompt + args.gen_tokens) // page) + 1
    scfg = ServingConfig(
        max_batch=args.max_batch, page_size=page,
        num_pages=args.max_batch * pages_per_seq + 64,
        max_pages_per_seq=pages_per_seq,
        max_new_tokens=args.gen_tokens, eos=cfg.vocab_size - 1,  # never hit
        prefill_bucket=args.prefill_bucket,
        kv_dtype=args.kv, weight_dtype=args.weights, seed=args.seed)
    engine = ServingEngine(cfg, scfg, params)

    trace = make_trace(args)
    # warmup: compile prefill + decode programs off the clock, one request
    # per class so both table layouts and the contig path are compiled
    t_warm = time.perf_counter()
    engine.submit("warm0", [5] * args.long_prompt, 4)
    engine.submit("warm1", [5] * args.short_prompt, 4)
    engine.run()
    for rid in ("warm0", "warm1"):
        engine.outputs.pop(rid)
    print(f"[slo] warmup {time.perf_counter() - t_warm:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    recs = drive(engine, trace)
    wall = time.perf_counter() - t0
    hdr = {"config": {"rate": args.rate, "duration": args.duration,
                      "long_frac": args.long_frac,
                      "prefill_bucket": args.prefill_bucket,
                      "kv": args.kv, "weights": args.weights,
                      "max_batch": args.max_batch}}
    print(json.dumps(hdr), flush=True)
    for row in summarize(recs, wall):
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
