"""RetNet multi-scale retention: train-form vs O(1) recurrent decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.models.retnet import (
    RetNetConfig,
    RetNetDecoder,
    init_retnet_states,
    retention_decays,
)
from unilm_tpu.ops.retention import chunk_gate_retention, naive_gate_retention


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape) * 0.5


def test_retention_rectangular_state():
    """Dv != Dk (RetNet value dim is 2x key dim)."""
    B, T, H, Dk, Dv = 2, 12, 3, 4, 8
    q, k = rand(0, B, T, H, Dk), rand(1, B, T, H, Dk)
    v = rand(2, B, T, H, Dv)
    g = -jnp.abs(rand(3, B, T, H)) * 0.1
    o_chunk, s_chunk = chunk_gate_retention(q, k, v, g, chunk_size=4)
    o_naive, s_naive = naive_gate_retention(q, k, v, g)
    assert o_chunk.shape == (B, T, H, Dv)
    assert s_chunk.shape == (B, H, Dk, Dv)
    np.testing.assert_allclose(o_chunk, o_naive, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(s_chunk, s_naive, atol=1e-4, rtol=1e-3)


def test_decays_monotone():
    d = retention_decays(8)
    assert (jnp.diff(d) > 0).all() and (d < 0).all()  # slower decay at higher heads


class TestRetNet:
    def cfg(self):
        return RetNetConfig(
            vocab_size=64, embed_dim=32, num_layers=2, num_heads=2,
            ffn_dim=48, chunk_size=4,
        )

    def test_train_matches_recurrent_decode(self):
        cfg = self.cfg()
        model = RetNetDecoder(cfg)
        B, T = 2, 10
        tokens = jax.random.randint(jax.random.PRNGKey(0), (B, T), 0, cfg.vocab_size)
        params = model.init(jax.random.PRNGKey(1), tokens)
        logits_par, _ = model.apply(params, tokens)

        states = init_retnet_states(cfg, B)
        outs = []
        for t in range(T):
            step_logits, states = model.apply(
                params, tokens[:, t : t + 1], states=states,
                positions=jnp.array([t]), mode="decode",
            )
            outs.append(step_logits)
        logits_rec = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(logits_par, logits_rec, atol=2e-4, rtol=1e-3)

    def test_state_continuation_train_form(self):
        """Chunked training with carried state == one full pass (long-doc packing)."""
        cfg = self.cfg()
        model = RetNetDecoder(cfg)
        B, T = 1, 12
        tokens = jax.random.randint(jax.random.PRNGKey(2), (B, T), 0, cfg.vocab_size)
        params = model.init(jax.random.PRNGKey(3), tokens)
        full, _ = model.apply(params, tokens)
        a, s = model.apply(params, tokens[:, :6], positions=jnp.arange(6))
        b, _ = model.apply(params, tokens[:, 6:], states=s, positions=jnp.arange(6, 12))
        np.testing.assert_allclose(
            jnp.concatenate([a, b], 1), full, atol=2e-4, rtol=1e-3
        )

    def test_grad_flows(self):
        cfg = self.cfg()
        model = RetNetDecoder(cfg)
        tokens = jax.random.randint(jax.random.PRNGKey(4), (2, 8), 0, cfg.vocab_size)
        params = model.init(jax.random.PRNGKey(5), tokens)

        def loss(p):
            logits, _ = model.apply(p, tokens)
            return jnp.mean(
                -jax.nn.log_softmax(logits[:, :-1])[
                    jnp.arange(2)[:, None], jnp.arange(7)[None], tokens[:, 1:]
                ]
            )

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(jnp.isfinite(x).all() for x in leaves)
        assert any(jnp.abs(x).max() > 0 for x in leaves)
