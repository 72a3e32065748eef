"""Differential Transformer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.models.diff_transformer import (
    DiffTransformerConfig,
    DiffTransformerLM,
    lambda_init_fn,
)


def test_forward_and_causality():
    cfg = DiffTransformerConfig(
        vocab_size=50, embed_dim=32, num_layers=2, num_heads=2, ffn_dim=64
    )
    m = DiffTransformerLM(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 8), 0, 50)
    params = m.init(jax.random.PRNGKey(1), toks)["params"]
    logits = m.apply({"params": params}, toks)
    assert logits.shape == (2, 8, 50)
    assert np.isfinite(np.asarray(logits)).all()

    t2 = toks.at[0, 7].set((toks[0, 7] + 1) % 50)
    l2 = m.apply({"params": params}, t2)
    np.testing.assert_allclose(np.asarray(logits[0, :7]), np.asarray(l2[0, :7]), atol=1e-5)
    assert np.abs(np.asarray(logits[0, 7] - l2[0, 7])).max() > 1e-4


def test_lambda_init_schedule():
    assert np.isclose(lambda_init_fn(0), 0.2)
    assert lambda_init_fn(10) > lambda_init_fn(1)


def test_gqa_variant():
    cfg = DiffTransformerConfig(
        vocab_size=50, embed_dim=32, num_layers=1, num_heads=4, num_kv_heads=2,
        ffn_dim=64,
    )
    m = DiffTransformerLM(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 6), 0, 50)
    params = m.init(jax.random.PRNGKey(1), toks)["params"]
    out = m.apply({"params": params}, toks)
    assert out.shape == (1, 6, 50)
