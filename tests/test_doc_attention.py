"""doc_attention (blocked one-pass encoder kernel) vs dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_default_matmul_precision", "highest")

from unilm_tpu.ops.doc_attention import doc_attention, doc_backward, supports


def dense_ref(q, k, v, bias, kpm, scale):
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k,
                        preferred_element_type=jnp.float32).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if kpm is not None:
        logits = jnp.where(kpm[:, None, None, :], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))


def mk(B=2, T=37, S=37, H=4, D=32, bias_b=None, bias_h=None, kpm=False,
       dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, T, H, D), dtype) * 0.4
    k = jnp.asarray(rng.randn(B, S, H, D), dtype) * 0.4
    v = jnp.asarray(rng.randn(B, S, H, D), dtype)
    bias = None
    if bias_b is not None:
        bias = jnp.asarray(rng.randn(bias_b, bias_h, T, S), dtype) * 0.5
    mask = None
    if kpm:
        mask = jnp.asarray(rng.rand(B, S) > 0.2)
        mask = mask.at[:, 0].set(True)
    return q, k, v, bias, mask


@pytest.mark.parametrize("bias_b,bias_h,kpm", [
    (None, None, False), (None, None, True),
    (1, 1, False), (1, 4, True), (2, 4, False), (2, 4, True),
])
def test_fwd_matches_dense(bias_b, bias_h, kpm):
    q, k, v, bias, mask = mk(bias_b=bias_b, bias_h=bias_h, kpm=kpm)
    D = q.shape[-1]
    out = doc_attention(q, k, v, bias, mask, D**-0.5, 16, True)
    ref = dense_ref(q, k, v, bias, mask, D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bias_b,bias_h,kpm", [
    (None, None, False), (None, None, True),
    (1, 1, True), (1, 4, False), (2, 4, False), (2, 4, True),
])
def test_bwd_matches_dense(bias_b, bias_h, kpm):
    q, k, v, bias, mask = mk(bias_b=bias_b, bias_h=bias_h, kpm=kpm, seed=3)
    B, T, H, D = q.shape
    g = jnp.asarray(np.random.RandomState(7).randn(*q.shape), q.dtype)

    def loss_doc(q, k, v, bias=None):
        o = doc_attention(q, k, v, bias, mask, D**-0.5, 16, True)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_ref(q, k, v, bias=None):
        o = dense_ref(q, k, v, bias, mask, D**-0.5)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    args = (q, k, v) if bias is None else (q, k, v, bias)
    nargs = len(args)
    gd = jax.grad(loss_doc, argnums=tuple(range(nargs)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(nargs)))(*args)
    names = ["dq", "dk", "dv", "dbias"]
    for n, a, b in zip(names, gd, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5, err_msg=n)


def test_blocked_q_many_blocks():
    """T spanning several q-blocks incl. a ragged tail."""
    q, k, v, bias, mask = mk(B=2, T=70, S=45, bias_b=2, bias_h=4, kpm=True,
                             seed=5)
    D = q.shape[-1]
    out = doc_attention(q, k, v, bias, mask, D**-0.5, 16, True)
    ref = dense_ref(q, k, v, bias, mask, D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_supports():
    q, k, v, bias, _ = mk(bias_b=2, bias_h=4)
    assert supports(q, k, bias, causal=False, window=0, kv_len=None,
                    q_offset=None)
    assert not supports(q, k, bias, causal=True, window=0, kv_len=None,
                        q_offset=None)
    big_k = jnp.zeros((2, 4096, 4, 32))
    assert not supports(q, big_k, None, causal=False, window=0, kv_len=None,
                        q_offset=None)


def test_head_major_bias_parity():
    """HeadMajorBias([H,B,T,S]) == plain [B,H,T,S] bias, fwd and grads."""
    from unilm_tpu.ops.doc_attention import HeadMajorBias

    q, k, v, bias, mask = mk(B=2, T=41, S=41, bias_b=2, bias_h=4, kpm=True,
                             seed=9)
    D = q.shape[-1]
    hb = jnp.moveaxis(bias, 1, 0)
    g = jnp.asarray(np.random.RandomState(11).randn(*q.shape), q.dtype)

    def loss_h(q, k, v, hb):
        o = doc_attention(q, k, v, HeadMajorBias(hbts=hb), mask, D**-0.5,
                          16, True)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    def loss_b(q, k, v, bias):
        o = doc_attention(q, k, v, bias, mask, D**-0.5, 16, True)
        return jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32))

    vh, gh = jax.value_and_grad(loss_h, argnums=(0, 1, 2, 3))(q, k, v, hb)
    vb, gb = jax.value_and_grad(loss_b, argnums=(0, 1, 2, 3))(q, k, v, bias)
    np.testing.assert_allclose(float(vh), float(vb), rtol=1e-6)
    for n, a, b in zip(["dq", "dk", "dv"], gh[:3], gb[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, err_msg=n)
    np.testing.assert_allclose(np.asarray(gh[3]),
                               np.asarray(jnp.moveaxis(gb[3], 1, 0)),
                               atol=1e-6, err_msg="dbias")
