"""Ring attention vs full attention on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from unilm_tpu.ops.attention import dot_product_attention, make_causal_mask
from unilm_tpu.parallel import make_mesh
from unilm_tpu.parallel.ring_attention import ring_attention


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(causal):
    assert jax.device_count() >= 8
    mesh = make_mesh({"data": -1})  # 8 devices on one axis; reuse as seq axis
    B, T, H, D = 2, 64, 4, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D)) * 0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D)) * 0.5
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D)) * 0.5

    mask = None
    if causal:
        mask = make_causal_mask(jnp.arange(T), jnp.arange(T))[None, None]
    ref = dot_product_attention(q, k, v, mask=mask)

    f = shard_map(
        lambda q, k, v: ring_attention(q, k, v, axis_name="data", causal=causal),
        mesh=mesh,
        in_specs=(P(None, "data"), P(None, "data"), P(None, "data")),
        out_specs=P(None, "data"),
    )
    out = jax.jit(f)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


# --------------------------------------------------------------------------- #
# Flash-chunk ring attention (trainable): fwd + grad parity vs dense global
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("devs,causal", [(4, True), (4, False), (8, True)])
def test_ring_flash_matches_dense_global(devs, causal):
    from unilm_tpu.parallel.ring_attention import ring_attention_flash

    assert jax.device_count() >= devs
    mesh = make_mesh({"data": -1}, devices=jax.devices()[:devs])
    B, T, H, D = 2, 8 * devs, 2, 16
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, T, H, D), jnp.float32) * 0.5
    k = jnp.asarray(rng.randn(B, T, H, D), jnp.float32) * 0.5
    v = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    g = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)

    ring = shard_map(
        lambda q, k, v: ring_attention_flash(
            q, k, v, "data", causal, None, 512, 512, True),
        mesh=mesh,
        in_specs=(P(None, "data"), P(None, "data"), P(None, "data")),
        out_specs=P(None, "data"),
        check_rep=False,  # pallas_call doesn't thread vma/rep metadata
    )

    def dense(q, k, v):
        logits = jnp.einsum("bthd,bshd->bhts", q * D**-0.5, k).astype(jnp.float32)
        if causal:
            m = jnp.tril(jnp.ones((T, T), bool))
            logits = jnp.where(m[None, None], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32)).astype(q.dtype)

    out = jax.jit(ring)(q, k, v)
    want = jax.jit(dense)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def loss_ring(q, k, v):
        return jnp.sum(ring(q, k, v).astype(jnp.float32) * g)

    def loss_dense(q, k, v):
        return jnp.sum(dense(q, k, v).astype(jnp.float32) * g)

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.jit(jax.grad(loss_dense, argnums=(0, 1, 2)))(q, k, v)
    for n, a, b in zip(["dq", "dk", "dv"], gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4, err_msg=n)
