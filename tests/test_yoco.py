"""YOCO + gated retention tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.models.yoco import YOCO, YOCOConfig, make_yoco_generate_fns
from unilm_tpu.ops.retention import (
    chunk_gate_retention,
    naive_gate_retention,
    recurrent_gate_retention,
)


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape) * 0.5


class TestRetention:
    @pytest.mark.parametrize("T,chunk", [(16, 4), (17, 4), (8, 8), (32, 16)])
    def test_chunk_matches_naive(self, T, chunk):
        B, H, D = 2, 3, 8
        q, k, v = rand(0, B, T, H, D), rand(1, B, T, H, D), rand(2, B, T, H, D)
        g = -jnp.abs(rand(3, B, T, H)) * 0.1  # log-gates <= 0
        o_chunk, s_chunk = chunk_gate_retention(q, k, v, g, chunk)
        o_naive, s_naive = naive_gate_retention(q, k, v, g)
        np.testing.assert_allclose(o_chunk, o_naive, atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(s_chunk, s_naive, atol=1e-4, rtol=1e-3)

    def test_initial_state_continuation(self):
        B, T, H, D = 1, 12, 2, 4
        q, k, v = rand(0, B, T, H, D), rand(1, B, T, H, D), rand(2, B, T, H, D)
        g = -jnp.abs(rand(3, B, T, H)) * 0.1
        o_full, s_full = chunk_gate_retention(q, k, v, g, 4)
        o1, s1 = chunk_gate_retention(q[:, :6], k[:, :6], v[:, :6], g[:, :6], 4)
        o2, s2 = chunk_gate_retention(
            q[:, 6:], k[:, 6:], v[:, 6:], g[:, 6:], 4, initial_state=s1
        )
        np.testing.assert_allclose(
            jnp.concatenate([o1, o2], 1), o_full, atol=1e-4, rtol=1e-3
        )
        np.testing.assert_allclose(s2, s_full, atol=1e-4, rtol=1e-3)


def tiny_cfg(**kw):
    d = dict(
        vocab_size=64, dim=32, self_layers=2, cross_layers=2, num_heads=4,
        kv_heads=2, ffn_dim=64, window_size=4, use_flash=False,
    )
    d.update(kw)
    return YOCOConfig(**d)


class TestYOCO:
    @pytest.mark.parametrize("self_type", ["sliding_window", "gate_retention"])
    def test_forward(self, self_type):
        cfg = tiny_cfg(self_type=self_type)
        model = YOCO(cfg)
        toks = jax.random.randint(jax.random.PRNGKey(0), (2, 10), 0, 64)
        params = model.init(jax.random.PRNGKey(1), toks)["params"]
        logits = model.apply({"params": params}, toks)
        assert logits.shape == (2, 10, 64)
        assert np.isfinite(np.asarray(logits)).all()

    @pytest.mark.parametrize("self_type", ["sliding_window", "gate_retention"])
    def test_prefill_decode_parity(self, self_type):
        cfg = tiny_cfg(self_type=self_type)
        model = YOCO(cfg)
        T = 12
        toks = jax.random.randint(jax.random.PRNGKey(0), (1, T), 0, 64)
        params = model.init(jax.random.PRNGKey(1), toks)["params"]
        full = model.apply({"params": params}, toks)

        prefill, step = make_yoco_generate_fns(model, cache_size=T)
        logits, cache = prefill(params, toks[:, :5], None)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, :5]), atol=3e-4, rtol=1e-3
        )
        outs = []
        for t in range(5, T):
            lg, cache = step(params, toks[:, t : t + 1], cache, None)
            outs.append(lg)
        inc = jnp.concatenate(outs, 1)
        np.testing.assert_allclose(
            np.asarray(inc), np.asarray(full[:, 5:]), atol=3e-4, rtol=1e-3
        )

    def test_kv_cache_is_shared_single_pair(self):
        """The YOCO property: exactly ONE global kv pair regardless of
        cross-layer count (halved KV memory vs a standard decoder)."""
        cfg = tiny_cfg(cross_layers=3)
        model = YOCO(cfg)
        toks = jax.random.randint(jax.random.PRNGKey(0), (1, 6), 0, 64)
        params = model.init(jax.random.PRNGKey(1), toks)["params"]
        _, vars_ = model.apply(
            {"params": params}, toks, "prefill", 6, mutable=["cache"]
        )
        cache_keys = [k for k in vars_["cache"] if "global" in k]
        assert sorted(cache_keys) == ["global_key", "global_value"]
