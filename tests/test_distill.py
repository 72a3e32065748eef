"""MiniLM v1/v2 self-attention relation distillation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Encoder
from unilm_tpu.runtime.distill import (
    collect_qkv,
    minilm_v1_loss,
    minilm_v2_loss,
    relation_log_probs,
)


def run_capture(cfg, params, x, mask):
    model = Encoder(cfg)
    _, inter = model.apply(
        params, x, key_padding_mask=mask, mutable=["intermediates"]
    )
    return collect_qkv(inter["intermediates"])


def make(cfg, key, B=2, T=8):
    x = jax.random.normal(key, (B, T, cfg.embed_dim)) * 0.5
    params = Encoder(cfg).init(key, x)
    params = {"params": params["params"]}
    return params, x


def test_collect_qkv_layer_order_and_shapes():
    cfg = TransformerConfig(embed_dim=16, num_heads=2, ffn_dim=32, num_layers=3,
                            use_flash=False)
    key = jax.random.PRNGKey(0)
    params, x = make(cfg, key)
    qkv = run_capture(cfg, params, x, None)
    assert len(qkv) == 3
    for q, k, v in qkv:
        assert q.shape == (2, 8, 2, 8) and k.shape == q.shape and v.shape == q.shape


def test_v2_zero_for_identical_and_positive_otherwise():
    cfg = TransformerConfig(embed_dim=16, num_heads=2, ffn_dim=32, num_layers=1,
                            use_flash=False)
    params, x = make(cfg, jax.random.PRNGKey(1))
    mask = jnp.array([[True] * 8, [True] * 5 + [False] * 3])
    (qkv,) = run_capture(cfg, params, x, mask)
    assert float(minilm_v2_loss(qkv, qkv, 4, mask)) < 1e-6
    other = tuple(t + 0.3 for t in qkv)
    assert float(minilm_v2_loss(qkv, other, 4, mask)) >= 0.0
    # v1 likewise
    assert float(minilm_v1_loss(qkv, qkv, mask)) < 1e-6


def test_relation_heads_ignore_padding():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 2, 4))
    mask = jnp.array([[True, True, True, True, False, False]])
    logp = relation_log_probs(x, 2, mask)
    p = np.asarray(jnp.exp(logp))
    np.testing.assert_allclose(p[..., 4:].sum(), 0.0, atol=1e-6)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)


def test_student_learns_teacher_relations():
    """A few SGD steps on the v2 loss must reduce it; head counts differ
    (the v2 selling point) and only student params receive grads."""
    t_cfg = TransformerConfig(embed_dim=24, num_heads=4, ffn_dim=48, num_layers=2,
                              use_flash=False)
    s_cfg = TransformerConfig(embed_dim=12, num_heads=2, ffn_dim=24, num_layers=1,
                              use_flash=False)
    key = jax.random.PRNGKey(3)
    B, T = 2, 8
    tokens = jax.random.normal(key, (B, T, t_cfg.embed_dim)) * 0.5
    s_tokens = tokens[..., : s_cfg.embed_dim]
    t_params, _ = make(t_cfg, jax.random.PRNGKey(4), B, T)
    s_params, _ = make(s_cfg, jax.random.PRNGKey(5), B, T)

    t_qkv = run_capture(t_cfg, t_params, tokens, None)[-1]

    def loss_fn(sp):
        s_model = Encoder(s_cfg)
        _, inter = s_model.apply(sp, s_tokens, mutable=["intermediates"])
        s_qkv = collect_qkv(inter["intermediates"])[-1]
        return minilm_v2_loss(t_qkv, s_qkv, num_relation_heads=4)

    opt = optax.adam(1e-2)
    state = opt.init(s_params)
    l0 = float(loss_fn(s_params))
    step = jax.jit(lambda p, s: _step(p, s, loss_fn, opt))
    for _ in range(20):
        s_params, state = step(s_params, state)
    l1 = float(loss_fn(s_params))
    assert l1 < l0 * 0.9, (l0, l1)


def _step(p, s, loss_fn, opt):
    g = jax.grad(loss_fn)(p)
    updates, s = opt.update(g, s, p)
    return optax.apply_updates(p, updates), s
