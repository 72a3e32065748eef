"""Int8 weight-only quantization (ops/quant.py) — the serving int8 path.

Covers the full chain that `ServingEngine(weight_dtype="int8")` exercises:
quantize_int8 error bound, the Pallas int8 matmul vs its XLA fallback,
QuantDense vs nn.Dense logit parity on a real decoder config, tree
compatibility of quantize_dense_tree with a quant-model init, and the
engine's greedy stream vs a contiguous-cache reference running the SAME
quantized function.

Reference point: the reference serves in fp16 (`kosmos-2.5/inference.py:132`
model.half()); int8 weights are a beyond-reference decode optimization, so
the oracle here is our own dense math, not a torch port.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.models.kosmos import UniGPT, UniGPTConfig, make_unigpt_generate_fns
from unilm_tpu.ops.quant import (
    QuantDense, _xla_int8_matmul, int8_matmul, quantize_dense_tree,
    quantize_int8,
)
from unilm_tpu.runtime.generate import GenerationConfig, greedy_generate
from unilm_tpu.runtime.serving import ServingConfig, ServingEngine

jax.config.update("jax_default_matmul_precision", "highest")

# The predicate ServingEngine uses (runtime/serving.py): decoder-layer
# projections only; embeddings/norms/gates stay full precision.
_PROJ = {"q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2", "fc3"}


def _proj_predicate(p):
    return p[-2] in _PROJ and any(s.startswith("layers_") for s in p)


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


def test_quantize_int8_roundtrip_error_bound():
    """Per-channel symmetric int8: |w - dequant| <= scale/2 elementwise, and
    the relative matmul error on xavier weights stays in the ~3e-3 class the
    module docstring claims (below bf16 decode noise)."""
    rng = jax.random.PRNGKey(0)
    w = jax.nn.initializers.xavier_uniform()(rng, (256, 512), jnp.float32)
    wi, scale = quantize_int8(w, axis=0)
    assert wi.dtype == jnp.int8 and scale.shape == (512,)
    deq = wi.astype(jnp.float32) * scale[None, :]
    # rounding bound: half a quantization step per element (ties at exactly
    # half a step are legal under round-half-to-even, hence the f32 slack)
    err = np.abs(np.asarray(w - deq))
    bound = np.asarray(scale)[None, :] * 0.5
    assert (err <= bound * (1 + 1e-5) + 1e-8).all(), float(
        (err / np.maximum(bound, 1e-12)).max())
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 256), jnp.float32)
    ref = x @ w
    got = x @ deq
    rel = np.linalg.norm(np.asarray(ref - got)) / np.linalg.norm(np.asarray(ref))
    assert rel < 5e-3, rel


def test_quantize_int8_extremes_saturate_without_overflow():
    w = jnp.asarray([[3.0, -0.5], [-3.0, 0.25]], jnp.float32)
    wi, scale = quantize_int8(w, axis=0)
    assert int(np.abs(np.asarray(wi)).max()) <= 127
    deq = wi.astype(jnp.float32) * scale[None, :]
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w), atol=3 / 127)


@pytest.mark.parametrize("M,K,N", [(16, 256, 256), (3, 512, 128), (1, 128, 384)])
def test_int8_matmul_kernel_matches_xla_fallback(M, K, N):
    """The Pallas kernel (interpret mode on CPU) must equal the XLA
    dequantize-via-f32-accumulator fallback bit-for-bit at f32."""
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (M, K), jnp.float32)
    w = jax.random.normal(kw, (K, N), jnp.float32) * 0.05
    wi, scale = quantize_int8(w, axis=0)
    got = int8_matmul(x, wi, scale, interpret=True)
    ref = _xla_int8_matmul(x, wi, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_int8_matmul_unsplittable_shape_takes_fallback():
    """K/N not multiples of 128 route to the XLA fallback and stay correct."""
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 48), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (48, 72), jnp.float32) * 0.1
    wi, scale = quantize_int8(w, axis=0)
    got = int8_matmul(x, wi, scale)
    ref = x @ (wi.astype(jnp.float32) * scale[None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_matmul_batched_leading_dims():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(6), (128, 128), jnp.float32) * 0.1
    wi, scale = quantize_int8(w, axis=0)
    got = int8_matmul(x, wi, scale, interpret=True)
    assert got.shape == (2, 3, 128)
    ref = _xla_int8_matmul(x, wi, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_quant_dense_matches_dense_function():
    """QuantDense(quantized params) == dequantized dense math exactly."""
    import flax.linen as nn

    K, N = 64, 96
    dense = nn.Dense(N)
    x = jax.random.normal(jax.random.PRNGKey(7), (5, K), jnp.float32)
    dp = dense.init(jax.random.PRNGKey(8), x)["params"]
    qd = QuantDense(features=N, dtype=jnp.float32)
    qp = quantize_dense_tree(dict(dp))
    y = qd.apply({"params": qp}, x)
    wi, scale = quantize_int8(dp["kernel"], axis=0)
    ref = x @ (wi.astype(jnp.float32) * scale[None, :]) + dp["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_quantize_dense_tree_matches_quant_model_init_structure():
    """The converted tree must drop into UniGPT(quant_weights=True) — same
    tree structure, shapes, and dtypes as that model's own init."""
    cfg = tiny_cfg()
    params = UniGPT(cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))["params"]
    qparams = quantize_dense_tree(params, predicate=_proj_predicate)

    qcfg = dataclasses.replace(cfg, quant_weights=True)
    qinit = UniGPT(qcfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))["params"]

    ref = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), qinit)
    got = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), qparams)
    assert ref == got


def test_quant_decoder_logit_parity():
    """Full UniGPT decoder forward: int8-weight logits track dense logits
    (quantization noise only) and agree on argmax at every position on a
    random tiny model."""
    cfg = tiny_cfg(num_layers=3)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 3, 60)
    params = UniGPT(cfg).init(jax.random.PRNGKey(0), tokens)["params"]
    dense_logits = UniGPT(cfg).apply({"params": params}, tokens)

    qcfg = dataclasses.replace(cfg, quant_weights=True)
    qparams = quantize_dense_tree(params, predicate=_proj_predicate)
    q_logits = UniGPT(qcfg).apply({"params": qparams}, tokens)

    d = np.asarray(dense_logits, np.float32)
    q = np.asarray(q_logits, np.float32)
    rel = np.linalg.norm(d - q) / np.linalg.norm(d)
    assert rel < 2e-2, rel
    assert (d.argmax(-1) == q.argmax(-1)).mean() > 0.95


def _engine_stream(cfg, scfg, params, prompts):
    eng = ServingEngine(cfg, scfg, params)
    for rid, p in prompts.items():
        eng.submit(rid, p)
    return {k: np.asarray(v) for k, v in eng.run().items()}


def test_engine_int8_weights_matches_quantized_reference():
    """ServingEngine(weight_dtype='int8') greedy streams == contiguous-cache
    greedy decode of the SAME quantized function (exact equality: both sides
    run int8 weights, so this isolates the serving wiring, not quantization
    noise)."""
    cfg = tiny_cfg()
    params = UniGPT(cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))["params"]
    eos = 63
    scfg = ServingConfig(max_batch=2, page_size=8, num_pages=32,
                         max_pages_per_seq=8, max_new_tokens=6, eos=eos,
                         prefill_bucket=8, weight_dtype="int8")
    prompts = {"a": [5, 9, 11], "b": [7, 3, 3, 8, 12, 4, 30]}
    out = _engine_stream(cfg, scfg, params, prompts)

    # reference: quantize offline exactly as the engine does, decode with
    # the contiguous-cache UniGPT path
    qcfg = dataclasses.replace(cfg, quant_weights=True)
    qparams = quantize_dense_tree(params, predicate=_proj_predicate)
    model = UniGPT(qcfg)
    prefill, step = make_unigpt_generate_fns(model, cache_size=64)
    gcfg = GenerationConfig(max_new_tokens=6, eos=eos, pad=cfg.padding_idx,
                            beam_size=1)
    for rid, p in prompts.items():
        toks, _ = greedy_generate(gcfg, prefill, step, qparams,
                                  jnp.asarray([p], jnp.int32))
        ref = np.asarray(toks)[0, len(p):len(p) + len(out[rid])]
        np.testing.assert_array_equal(out[rid], ref, err_msg=rid)


def test_engine_int8_weights_close_to_dense_stream():
    """int8 vs full-precision engine streams: with a margin-dominated tiny
    model the streams should agree (sanity that quantization does not derail
    decode)."""
    cfg = tiny_cfg()
    # scale up weights so logit margins dominate 3e-3 quantization noise
    params = UniGPT(cfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))["params"]
    eos = 63
    kw = dict(max_batch=2, page_size=8, num_pages=32, max_pages_per_seq=8,
              max_new_tokens=6, eos=eos, prefill_bucket=8)
    prompts = {"a": [5, 9, 11]}
    dense = _engine_stream(cfg, ServingConfig(**kw), params, prompts)
    quant = _engine_stream(cfg, ServingConfig(**kw, weight_dtype="int8"),
                           params, prompts)
    agree = (dense["a"] == quant["a"]).mean()
    assert agree >= 0.8, (dense["a"], quant["a"])
