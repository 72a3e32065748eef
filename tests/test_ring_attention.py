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
            q, k, v, None, "data", causal, None, 512, 512, True),
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


# --------------------------------------------------------------------------- #
# Key-padding masks through the ring (round 5: the SP kpm lift)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("devs,causal", [(4, False), (4, True), (8, False)])
def test_ring_flash_kpm_matches_dense(devs, causal):
    """Ragged lengths over the seq axis: row 1's tail chunks are ENTIRELY
    masked (the chunk-dead merge case) and row 2 has NO valid key at all
    (globally-dead rows must emit 0 output and 0 grads)."""
    from unilm_tpu.parallel.ring_attention import ring_attention_flash

    assert jax.device_count() >= devs
    mesh = make_mesh({"data": -1}, devices=jax.devices()[:devs])
    B, T, H, D = 3, 8 * devs, 2, 16
    Tl = T // devs
    lengths = np.array([T - Tl // 2, Tl, 0])  # ragged / chunk-dead / all-dead
    kpm = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])  # [B, T] bool
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, T, H, D), jnp.float32) * 0.5
    k = jnp.asarray(rng.randn(B, T, H, D), jnp.float32) * 0.5
    v = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    g = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)

    ring = shard_map(
        lambda q, k, v, m: ring_attention_flash(
            q, k, v, m, "data", causal, None, 512, 512, True),
        mesh=mesh,
        in_specs=(P(None, "data"),) * 4,
        out_specs=P(None, "data"),
        check_rep=False,
    )

    def dense(q, k, v):
        logits = jnp.einsum(
            "bthd,bshd->bhts", q * D**-0.5, k).astype(jnp.float32)
        keep = jnp.broadcast_to(kpm[:, None, None, :], logits.shape)
        if causal:
            keep = jnp.logical_and(
                keep, jnp.tril(jnp.ones((T, T), bool))[None, None])
        logits = jnp.where(keep, logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)
        # rows with NO valid key: exact attention is empty-sum = 0, not the
        # softmax's uniform limit
        p = jnp.where(jnp.any(keep, axis=-1, keepdims=True), p, 0.0)
        return jnp.einsum(
            "bhts,bshd->bthd", p, v.astype(jnp.float32)).astype(q.dtype)

    out = jax.jit(ring)(q, k, v, kpm)
    want = jax.jit(dense)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    assert np.all(np.asarray(out[2]) == 0.0)  # globally-dead batch row

    gr = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(ring(q, k, v, kpm) * g), argnums=(0, 1, 2)
    ))(q, k, v)
    gd = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(dense(q, k, v) * g), argnums=(0, 1, 2)
    ))(q, k, v)
    for n, a, b in zip(["dq", "dk", "dv"], gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4, err_msg=n)
    assert np.all(np.asarray(gr[0][2]) == 0.0)  # dead row: no dq


def test_core_seq_axis_accepts_key_padding_mask():
    """cfg.seq_axis self-attention with a ragged kpm ≡ the dense module
    (same params, seq_axis=None) — the core-level wiring of the kpm lift."""
    import dataclasses

    from unilm_tpu.core.attention import MultiheadAttention
    from unilm_tpu.core.config import TransformerConfig

    devs = 4
    mesh = make_mesh({"seq": -1}, devices=jax.devices()[:devs])
    B, T, E, H = 2, 8 * devs, 32, 4
    cfg_sp = TransformerConfig(
        vocab_size=64, embed_dim=E, num_layers=1, num_heads=H, ffn_dim=64,
        max_positions=T, use_flash=False, seq_axis="seq")
    cfg_dense = dataclasses.replace(cfg_sp, seq_axis=None)

    x = jnp.asarray(np.random.RandomState(0).randn(B, T, E), jnp.float32)
    kpm = jnp.asarray(np.arange(T)[None, :] < np.array([T, 10])[:, None])

    dense_mod = MultiheadAttention(cfg_dense)
    params = dense_mod.init(jax.random.PRNGKey(0), x)["params"]
    want = dense_mod.apply({"params": params}, x, key_padding_mask=kpm)

    sp_mod = MultiheadAttention(cfg_sp)
    f = shard_map(
        lambda p, x, m: sp_mod.apply({"params": p}, x, key_padding_mask=m),
        mesh=mesh,
        in_specs=(P(), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_rep=False,
    )
    got = jax.jit(f)(params, x, kpm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-4)
