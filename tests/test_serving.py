"""Serving engine: paged continuous batching vs contiguous-cache reference.

The key property: `PagedGPT` consumes UniGPT params verbatim and the engine's
greedy streams match per-sequence contiguous-cache greedy decoding exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.models.kosmos import UniGPT, UniGPTConfig, make_unigpt_generate_fns
from unilm_tpu.runtime.generate import GenerationConfig, greedy_generate
from unilm_tpu.runtime.serving import (
    PagedGPT, SamplingParams, ServingConfig, ServingEngine, batched_sample,
)


def tiny_cfg(**kw):
    kw.setdefault("vocab_size", 64)
    kw.setdefault("embed_dim", 32)
    kw.setdefault("num_layers", 2)
    kw.setdefault("num_heads", 2)
    kw.setdefault("ffn_dim", 48)
    kw.setdefault("max_positions", 128)
    kw.setdefault("use_flash", False)
    kw.setdefault("image_tower", None)
    return UniGPTConfig(**kw)


def init_params(cfg):
    model = UniGPT(cfg)
    tokens = jnp.ones((1, 4), jnp.int32)
    return model.init(jax.random.PRNGKey(0), tokens)["params"]


def reference_greedy(cfg, params, prompt, max_new, eos):
    model = UniGPT(cfg)
    prefill, step = make_unigpt_generate_fns(model, cache_size=64)
    gcfg = GenerationConfig(max_new_tokens=max_new, eos=eos,
                            pad=cfg.padding_idx, beam_size=1)
    toks, _ = greedy_generate(gcfg, prefill, step, params,
                              jnp.asarray([prompt], jnp.int32))
    return np.asarray(toks)[0, len(prompt):]


@pytest.mark.parametrize("xpos", [True, False])
def test_engine_matches_contiguous_greedy(xpos):
    cfg = tiny_cfg(xpos_rel_pos=xpos)
    params = init_params(cfg)
    eos = 63  # unlikely; budget terminates
    scfg = ServingConfig(max_batch=2, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=6, eos=eos,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    prompts = {
        "a": [5, 9, 11],
        "b": [7, 3, 3, 8, 12, 4, 30],
        "c": [22, 41],  # admitted only after a slot frees (continuous batching)
    }
    for rid, p in prompts.items():
        eng.submit(rid, p)
    out = eng.run()
    for rid, p in prompts.items():
        ref = reference_greedy(cfg, params, p, 6, eos)
        np.testing.assert_array_equal(
            np.asarray(out[rid]), ref[: len(out[rid])], err_msg=rid
        )
        assert len(out[rid]) == 6


def test_eos_frees_slot_and_pages():
    cfg = tiny_cfg()
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=1, page_size=8, num_pages=16,
                         max_pages_per_seq=4, max_new_tokens=4, eos=0,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    free0 = len(eng.free_pages)
    eng.submit("x", [5, 6, 7], max_new_tokens=4)
    eng.submit("y", [9, 10], max_new_tokens=4)
    out = eng.run()
    retained = sum(1 for rc in eng.page_rc.values() if rc == 0)
    assert len(eng.free_pages) + retained == free0  # returned or retained
    assert all(rc == 0 for rc in eng.page_rc.values())  # no live sharers
    assert not eng.active.any()
    assert set(out) == {"x", "y"} and all(len(v) >= 1 for v in out.values())


def test_backpressure_raises_when_impossible():
    cfg = tiny_cfg()
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=1, page_size=8, num_pages=4,
                         max_pages_per_seq=2, max_new_tokens=64, eos=0,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    eng.submit("too_long", list(range(3, 20)), max_new_tokens=64)
    with pytest.raises(MemoryError):
        eng.run()


def test_batched_sample_heterogeneous_slots():
    """Greedy/topk/topp slots coexist in one call; picks respect each cut."""
    rng = np.random.RandomState(0)
    V = 200
    logits = jnp.asarray(rng.randn(4, V).astype(np.float32) * 3)
    temps = jnp.asarray([0.0, 1.0, 1.0, 0.7], jnp.float32)
    topks = jnp.asarray([0, 5, 0, 0], jnp.int32)
    topps = jnp.asarray([0.0, 0.0, 0.3, 0.0], jnp.float32)
    order = np.argsort(-np.asarray(logits), axis=-1)
    counts = {1: set(), 2: set(), 3: set()}
    for i in range(200):
        tok = np.asarray(batched_sample(
            logits, temps, topks, topps, jax.random.PRNGKey(i), max_topk=64))
        assert tok[0] == order[0, 0]  # greedy slot is deterministic argmax
        for b in counts:
            counts[b].add(int(tok[b]))
    assert counts[1] <= set(order[1, :5].tolist())  # top-k=5 respected
    assert len(counts[1]) > 1  # and actually samples
    # top-p=0.3: kept set is the smallest prefix with cum-prob >= 0.3
    p = np.exp(np.sort(np.asarray(logits[2]))[::-1])
    p /= p.sum()
    n_keep = int(np.searchsorted(np.cumsum(p), 0.3)) + 1
    assert counts[2] <= set(order[2, :n_keep].tolist())
    assert len(counts[3]) > 1  # plain temperature sampling explores


def test_engine_sampling_reproducible_and_in_topk():
    cfg = tiny_cfg()
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=2, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=6, eos=63,
                         prefill_bucket=8, seed=11)
    sp = SamplingParams(temperature=0.9, top_k=4)

    def run():
        eng = ServingEngine(cfg, scfg, params)
        eng.submit("s", [5, 9, 11], sampling=sp)
        eng.submit("g", [7, 3, 3, 8], sampling=SamplingParams())  # greedy
        return eng.run()

    out1, out2 = run(), run()
    assert out1 == out2  # fixed seed + admission order => bit-reproducible
    ref = reference_greedy(cfg, params, [7, 3, 3, 8], 6, 63)
    np.testing.assert_array_equal(np.asarray(out1["g"]), ref[: len(out1["g"])])


def test_tensor_parallel_engine_matches_single_device():
    """TP serving over a 'tensor' mesh axis produces the single-device greedy
    streams (pools sharded over heads; GSPMD inserts the Megatron psums)."""
    from jax.sharding import Mesh

    cfg = tiny_cfg(num_heads=4, embed_dim=64)
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=2, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=5, eos=63,
                         prefill_bucket=8)
    prompts = {"a": [5, 9, 11], "b": [7, 3, 3, 8, 12], "c": [30, 4]}

    def run(mesh):
        eng = ServingEngine(cfg, scfg, params, mesh=mesh)
        for rid, p in prompts.items():
            eng.submit(rid, p)
        return eng.run()

    base = run(None)
    devices = np.array(jax.devices()[:4]).reshape(4)
    with Mesh(devices, ("tensor",)) as mesh:
        tp = run(mesh)
    assert base == tp


def test_paged_gpt_accepts_unigpt_params():
    """Param trees must be identical (serving loads training checkpoints)."""
    cfg = tiny_cfg()
    u_params = init_params(cfg)
    scfg = ServingConfig(page_size=8, num_pages=16, max_pages_per_seq=4)
    model = PagedGPT(cfg)
    L, H, D = cfg.num_layers, cfg.num_heads, cfg.embed_dim // cfg.num_heads
    kp = jnp.zeros((L * scfg.num_pages, scfg.page_size, H * D), cfg.dtype)
    p_params = model.init(
        jax.random.PRNGKey(1), jnp.ones((1, 4), jnp.int32), kp, kp,
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.full((1,), 4, jnp.int32),
    )["params"]
    u_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(u_params)}
    p_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(p_params)}
    assert p_paths == u_paths


def test_int8_kv_engine_matches_greedy():
    """int8 KV (per-token scales) decodes the same greedy stream as bf16 on
    a tiny model (quantization error ~1e-2 logit scale; deterministic)."""
    cfg = tiny_cfg()
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=2, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=6, eos=63,
                         prefill_bucket=8, chunk_pages=2, kv_dtype="int8")
    eng = ServingEngine(cfg, scfg, params)
    assert eng.pools[0].dtype == jnp.int8 and len(eng.pools) == 3
    prompts = {"a": [5, 9, 11], "b": [7, 3, 3, 8, 12, 4, 30]}
    for rid, p in prompts.items():
        eng.submit(rid, p)
    out = eng.run()
    for rid, p in prompts.items():
        ref = reference_greedy(cfg, params, p, 6, 63)
        np.testing.assert_array_equal(np.asarray(out[rid]),
                                      ref[: len(out[rid])], err_msg=rid)


def test_quantize_kv_rows_roundtrip():
    from unilm_tpu.ops.paged_attention import quantize_kv_rows

    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(4, 64).astype(np.float32) * 3)
    v = jnp.asarray(rng.randn(4, 64).astype(np.float32) * 0.1)
    ki, vi, ks, vs = quantize_kv_rows(k, v)
    assert ki.dtype == jnp.int8
    k2 = np.float32(ki) * np.asarray(ks)[:, None]
    v2 = np.float32(vi) * np.asarray(vs)[:, None]
    assert np.abs(k2 - np.asarray(k)).max() < np.abs(np.asarray(k)).max() / 100
    assert np.abs(v2 - np.asarray(v)).max() < np.abs(np.asarray(v)).max() / 100


def test_moe_engine_matches_greedy():
    """X-MoE decoder layers serve through the engine (deterministic routing)
    and match the contiguous-cache greedy reference exactly."""
    cfg = tiny_cfg(moe_freq=2, moe_experts=2)
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=2, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=5, eos=63,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    prompts = {"a": [5, 9, 11], "b": [7, 3, 3, 8, 12]}
    for rid, p in prompts.items():
        eng.submit(rid, p)
    out = eng.run()
    for rid, p in prompts.items():
        ref = reference_greedy(cfg, params, p, 5, 63)
        np.testing.assert_array_equal(np.asarray(out[rid]),
                                      ref[: len(out[rid])], err_msg=rid)


def test_chunked_prefill_long_prompt_interleaves():
    """A prompt longer than prefill_bucket is prefilled in chunks (one
    program, no per-length compiles) while another slot keeps decoding,
    and still matches the contiguous-cache greedy reference exactly."""
    cfg = tiny_cfg()
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=2, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=6, eos=63,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    long_prompt = list(np.random.RandomState(5).randint(3, 60, size=29))
    prompts = {"short": [5, 9, 11], "long": long_prompt}
    for rid, p in prompts.items():
        eng.submit(rid, p)
    out = eng.run()
    for rid, p in prompts.items():
        ref = reference_greedy(cfg, params, p, 6, 63)
        np.testing.assert_array_equal(np.asarray(out[rid]),
                                      ref[: len(out[rid])], err_msg=rid)
        assert len(out[rid]) == 6


def test_prefix_caching_reuses_pages_and_matches():
    """A repeated prompt prefix is served from cached pages: the second
    request prefills fewer chunks and the streams still match the
    contiguous-cache greedy reference exactly."""
    cfg = tiny_cfg()
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=1, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=4, eos=63,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    sys_prompt = list(np.random.RandomState(1).randint(3, 60, size=16))
    p1 = sys_prompt + [7, 9]
    p2 = sys_prompt + [11, 13, 4]
    eng.submit("r1", p1)
    out1 = eng.run()
    chunks_r1 = eng.stats["prefill_chunks"]
    eng.submit("r2", p2)
    out2 = eng.run()
    chunks_r2 = eng.stats["prefill_chunks"] - chunks_r1
    assert eng.stats["prefix_hit_pages"] == 2  # 16 tokens = 2 full pages
    assert chunks_r2 < chunks_r1  # shared prefix skipped
    for rid, p, out in (("r1", p1, out1), ("r2", p2, out2)):
        ref = reference_greedy(cfg, params, p, 4, 63)
        np.testing.assert_array_equal(np.asarray(out[rid]),
                                      ref[: len(out[rid])], err_msg=rid)


def test_prefix_cache_eviction_under_pressure():
    """Retained prefix pages are evicted when the pool runs dry, and the
    engine keeps serving correctly."""
    cfg = tiny_cfg()
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=1, page_size=8, num_pages=16,
                         max_pages_per_seq=4, max_new_tokens=3, eos=63,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    rng = np.random.RandomState(2)
    for i in range(6):  # distinct prompts overflow the retained set
        p = list(rng.randint(3, 60, size=17))
        eng.submit(f"r{i}", p)
        out = eng.run()
        ref = reference_greedy(cfg, params, p, 3, 63)
        np.testing.assert_array_equal(np.asarray(out[f"r{i}"]),
                                      ref[: len(out[f"r{i}"])])
    assert eng.stats["evicted_pages"] > 0


def test_speculative_decoding_exact_and_accepts():
    """Prompt-lookup speculative decoding emits multiple tokens per verify
    step on repetitive content while matching the non-speculative greedy
    stream EXACTLY."""
    cfg = tiny_cfg()
    params = init_params(cfg)
    base_kw = dict(max_batch=2, page_size=8, num_pages=32,
                   max_pages_per_seq=8, max_new_tokens=10, eos=63,
                   prefill_bucket=8)
    # repetitive prompt => the model tends to repeat => drafts accept
    prompt = [5, 9, 11, 5, 9, 11, 5, 9, 11, 5, 9]

    eng0 = ServingEngine(cfg, ServingConfig(**base_kw), params)
    eng0.submit("r", prompt)
    out0 = eng0.run()

    eng1 = ServingEngine(cfg, ServingConfig(**base_kw, spec_k=4), params)
    eng1.submit("r", prompt)
    out1 = eng1.run()

    assert out0 == out1  # exactness: spec decode never changes the stream
    assert eng1.stats["spec_steps"] > 0
    assert eng1.stats["spec_accepted"] > 0  # multi-token steps happened


def test_speculative_mixed_with_sampled_slot():
    """A sampled slot decodes normally while a greedy slot speculates; both
    streams are reproducible and the greedy one is exact."""
    cfg = tiny_cfg()
    params = init_params(cfg)
    kw = dict(max_batch=2, page_size=8, num_pages=32, max_pages_per_seq=8,
              max_new_tokens=8, eos=63, prefill_bucket=8, seed=3)
    prompt = [5, 9, 11, 5, 9, 11, 5, 9]

    def run(spec):
        eng = ServingEngine(cfg, ServingConfig(**kw, spec_k=4 if spec else 0),
                            params)
        eng.submit("g", prompt)
        eng.submit("s", [7, 3, 3], sampling=SamplingParams(temperature=0.8))
        return eng.run()

    a, b = run(False), run(True)
    assert a["g"] == b["g"]  # greedy slot exact under speculation


def test_page_aligned_prompt_prefix_cache_exact():
    """ADVICE r1 (high): a page-aligned prompt resubmitted after its pages
    were cached must NOT be served entirely from cache — the last prompt
    token is recomputed so the first sample comes from a real query."""
    cfg = tiny_cfg()
    params = init_params(cfg)
    scfg = ServingConfig(max_batch=1, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=4, eos=63,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    prompt = list(np.random.RandomState(5).randint(3, 60, size=16))  # 2 pages
    eng.submit("r1", prompt)
    out1 = eng.run()
    eng.submit("r2", prompt)  # identical, fully page-aligned
    out2 = eng.run()
    ref = reference_greedy(cfg, params, prompt, 4, 63)
    np.testing.assert_array_equal(np.asarray(out1["r1"]), ref[: len(out1["r1"])])
    np.testing.assert_array_equal(np.asarray(out2["r2"]), ref[: len(out2["r2"])])
    assert eng.stats["prefix_hit_pages"] == 1  # capped below the full 2 pages


def test_admit_under_pressure_does_not_evict_matched_pages():
    """ADVICE r1 (high): _try_admit must pin matched prefix pages before
    eviction; previously eviction could reclaim them (rc==0) and the
    engine crashed with KeyError / reused the pages in the same table."""
    cfg = tiny_cfg()
    params = init_params(cfg)
    # tight pool: retained prefixes + a new admission force eviction while
    # the new prompt's own prefix chain is the deepest retained chain
    scfg = ServingConfig(max_batch=1, page_size=8, num_pages=16,
                         max_pages_per_seq=4, max_new_tokens=3, eos=63,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    rng = np.random.RandomState(7)
    long_prompt = list(rng.randint(3, 60, size=25))  # 3 full pages + 1
    eng.submit("a", long_prompt)
    out_a = eng.run()
    # fill the retained set further with a different prompt
    other = list(rng.randint(3, 60, size=17))
    eng.submit("b", other)
    eng.run()
    # resubmit the first prompt: its (deep) retained chain matches; pool
    # pressure triggers eviction during admission
    eng.submit("c", long_prompt)
    out_c = eng.run()  # must not raise
    ref = reference_greedy(cfg, params, long_prompt, 3, 63)
    np.testing.assert_array_equal(np.asarray(out_a["a"]), ref[: len(out_a["a"])])
    np.testing.assert_array_equal(np.asarray(out_c["c"]), ref[: len(out_c["c"])])


def test_spec_step_preserves_sampled_slot_distribution():
    """ADVICE r1 (medium): during a spec step, a temperature>0 slot must be
    advanced by batched_sample with its own params — not by the greedy
    verify argmax. With a huge temperature the sampled stream must diverge
    from the pure-greedy stream (argmax forcing would make them equal)."""
    cfg = tiny_cfg()
    params = init_params(cfg)
    kw = dict(max_batch=2, page_size=8, num_pages=32, max_pages_per_seq=8,
              max_new_tokens=16, eos=63, prefill_bucket=8, seed=13)
    g_prompt = [5, 9, 11, 5, 9, 11, 5, 9]  # repetitive => drafts fire
    s_prompt = [7, 3, 3]

    eng = ServingEngine(cfg, ServingConfig(**kw, spec_k=4), params)
    eng.submit("g", g_prompt)
    eng.submit("s", s_prompt, sampling=SamplingParams(temperature=5.0))
    out = eng.run()
    assert eng.stats["spec_steps"] > 0  # speculation actually happened
    # greedy slot stays exact
    ref_g = reference_greedy(cfg, params, g_prompt, 16, 63)
    np.testing.assert_array_equal(np.asarray(out["g"]), ref_g[: len(out["g"])])
    # sampled slot: near-uniform sampling over 64 tokens for 16 steps matches
    # the deterministic greedy continuation with probability ~64^-16
    ref_s = reference_greedy(cfg, params, s_prompt, 16, 63)
    assert list(out["s"]) != list(ref_s[: len(out["s"])])


def test_chunked_prefill_bounds_decode_stalls():
    """Sarathi-style chunked prefill (serving.py _prefill_chunk): while a
    request decodes, a newly admitted LONG prompt must never occupy the
    engine for more than one prefill_bucket of prompt tokens between two
    decode steps — the structural bound behind the serving SLO benchmark's
    stall metric (benchmarks/serving_slo.py). With bucket >= prompt length
    the whole prompt lands in one gap (the unchunked baseline)."""
    cfg = tiny_cfg(max_positions=256)
    params = init_params(cfg)
    long_prompt = [7] * 96

    def max_prefill_tokens_between_decodes(bucket):
        scfg = ServingConfig(max_batch=2, page_size=8, num_pages=64,
                             max_pages_per_seq=16, max_new_tokens=24,
                             eos=63, prefill_bucket=bucket)
        eng = ServingEngine(cfg, scfg, params)
        eng.submit("a", [5, 9, 11], 24)   # decoding while b prefills
        events = []
        orig_chunk, orig_step = eng._prefill_chunk, eng.step

        def chunk(slot):
            before = eng.slots[slot].filled
            orig_chunk(slot)
            after = (eng.slots[slot].filled if eng.slots[slot]
                     else len(long_prompt))
            events.append(("prefill", after - before))

        def step():
            orig_step()
            events.append(("decode", 0))

        eng._prefill_chunk, eng.step = chunk, step
        # let "a" start decoding, then the long prompt arrives mid-flight
        while len(eng.outputs["a"]) < 4:
            while eng._try_admit():
                pass
            pre = eng._prefilling_slots()
            if pre:
                eng._prefill_chunk(pre[0])
            if eng.active.any():
                eng.step()
        eng.submit("b", list(long_prompt), 4)
        eng.run()
        assert len(eng.outputs["b"]) == 4
        # max prompt tokens prefilled between two consecutive decode steps
        gap, worst = 0, 0
        for kind, n in events:
            if kind == "decode":
                worst = max(worst, gap)
                gap = 0
            else:
                gap += n
        return max(worst, gap)

    chunked = max_prefill_tokens_between_decodes(16)
    unchunked = max_prefill_tokens_between_decodes(128)
    assert chunked <= 16, chunked
    assert unchunked >= len(long_prompt), unchunked


def test_scan_layers_engine_matches_greedy():
    """cfg.scan_layers: the serving stack runs as ONE lax.scan over stacked
    params (looped checkpoint auto-converted by the engine); greedy streams
    match the contiguous reference exactly."""
    cfg_loop = tiny_cfg(subln=True, xpos_rel_pos=True)
    cfg = tiny_cfg(subln=True, xpos_rel_pos=True, scan_layers=True)
    params = init_params(cfg_loop)  # looped tree; engine stacks it
    eos = 63
    scfg = ServingConfig(max_batch=2, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=6, eos=eos,
                         prefill_bucket=8)
    eng = ServingEngine(cfg, scfg, params)
    prompts = {"a": [5, 9, 11], "b": [7, 3, 3, 8, 12, 4, 30]}
    for rid, p in prompts.items():
        eng.submit(rid, p)
    outs = eng.run()
    for rid, p in prompts.items():
        ref = reference_greedy(cfg_loop, params, p, 6, eos)
        np.testing.assert_array_equal(np.asarray(outs[rid]), ref,
                                      err_msg=rid)


def test_scan_layers_engine_int8_weights_and_kv():
    """scan_layers + weight_dtype=int8 + kv_dtype=int8 (the fast single-chip
    serving config): streams still match the bf16 looped reference on a tiny
    model (quantization error below the argmax margin here)."""
    cfg_loop = tiny_cfg(subln=True, xpos_rel_pos=True)
    cfg = tiny_cfg(subln=True, xpos_rel_pos=True, scan_layers=True)
    params = init_params(cfg_loop)
    eos = 63
    scfg = ServingConfig(max_batch=2, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=5, eos=eos,
                         prefill_bucket=8, weight_dtype="int8",
                         kv_dtype="int8")
    eng = ServingEngine(cfg, scfg, params)
    eng.submit("a", [5, 9, 11])
    outs = eng.run()
    ref = reference_greedy(cfg_loop, params, [5, 9, 11], 5, eos)
    np.testing.assert_array_equal(np.asarray(outs["a"]), ref)
