"""Chunked-vocab CE vs dense cross_entropy_loss: value + gradient parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.ops.fused_ce import chunked_cross_entropy
from unilm_tpu.runtime.train import cross_entropy_loss

jax.config.update("jax_default_matmul_precision", "highest")


def _setup(N=64, E=32, V=1000, seed=0):
    r = np.random.RandomState(seed)
    x = jnp.asarray(r.randn(N, E), jnp.float32)
    emb = jnp.asarray(r.randn(V, E) * 0.1, jnp.float32)
    tgt = jnp.asarray(r.randint(0, V, N), jnp.int32)
    mask = jnp.asarray((r.rand(N) > 0.2), jnp.float32)
    return x, emb, tgt, mask


def dense(x, emb, tgt, mask, ls=0.0):
    return cross_entropy_loss(x @ emb.T, tgt, mask, label_smoothing=ls)


@pytest.mark.parametrize("chunk", [1000, 256, 96])  # exact, even, ragged
@pytest.mark.parametrize("ls", [0.0, 0.1])
def test_value_parity(chunk, ls):
    x, emb, tgt, mask = _setup()
    ref, n_ref = dense(x, emb, tgt, mask, ls)
    out, n = chunked_cross_entropy(x, emb, tgt, mask, chunk=chunk,
                                   label_smoothing=ls)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    assert float(n) == float(n_ref)


@pytest.mark.parametrize("chunk", [256, 96])
@pytest.mark.parametrize("ls", [0.0, 0.1])
def test_grad_parity(chunk, ls):
    x, emb, tgt, mask = _setup()

    def f_dense(x, emb):
        loss, n = dense(x, emb, tgt, mask, ls)
        return loss / n

    def f_chunked(x, emb):
        loss, n = chunked_cross_entropy(x, emb, tgt, mask, chunk=chunk,
                                        label_smoothing=ls)
        return loss / n

    gd = jax.grad(f_dense, argnums=(0, 1))(x, emb)
    gc = jax.grad(f_chunked, argnums=(0, 1))(x, emb)
    np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gd[0]),
                               atol=2e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gd[1]),
                               atol=2e-6, rtol=1e-4)


def test_batched_shapes_and_no_mask():
    """[B, T, E] features, no mask — matches flattened dense path."""
    x, emb, tgt, _ = _setup(N=60)
    xb = x.reshape(4, 15, -1)
    tb = tgt.reshape(4, 15)
    ref, n_ref = dense(x, emb, tgt, None)
    out, n = chunked_cross_entropy(xb, emb, tb, None, chunk=128)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    assert float(n) == 60.0 == float(n_ref)


def test_bf16_features_fp32_accumulate():
    """bf16 inputs: loss finite and close to fp32-cast dense computation."""
    x, emb, tgt, mask = _setup()
    xb, eb = x.astype(jnp.bfloat16), emb.astype(jnp.bfloat16)
    ref, _ = dense(xb.astype(jnp.float32), eb.astype(jnp.float32), tgt, mask)
    out, _ = chunked_cross_entropy(xb, eb, tgt, mask, chunk=256)
    # matmul itself runs in bf16 inputs + fp32 accumulation
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-2)
    g = jax.grad(lambda a, b: chunked_cross_entropy(a, b, tgt, mask)[0],
                 argnums=(0, 1))(xb, eb)
    assert g[0].dtype == jnp.bfloat16 and g[1].dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g[0].astype(jnp.float32)).all())


def test_sharded_mesh_parity():
    """Chunked CE under GSPMD: features data-sharded, embedding
    vocab-sharded on fsdp (parallel/sharding.py embedding rule) — loss and
    grads must match the single-device dense result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    B, T, E, V = 8, 16, 32, 512
    r = np.random.RandomState(3)
    x = jnp.asarray(r.randn(B, T, E), jnp.float32)
    emb = jnp.asarray(r.randn(V, E) * 0.1, jnp.float32)
    tgt = jnp.asarray(r.randint(0, V, (B, T)), jnp.int32)
    mask = jnp.asarray((r.rand(B, T) > 0.2), jnp.float32)

    ref = jax.grad(
        lambda a, b: dense(a, b, tgt.reshape(-1), mask.reshape(-1))[0],
        argnums=(0, 1))(x.reshape(-1, E), emb)
    ref_loss = float(dense(x.reshape(-1, E), emb, tgt.reshape(-1),
                           mask.reshape(-1))[0])

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "fsdp"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    es = jax.device_put(emb, NamedSharding(mesh, P("fsdp", None)))

    @jax.jit
    def f(x, emb):
        return chunked_cross_entropy(x, emb, tgt, mask, chunk=128)[0]

    loss = float(f(xs, es))
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
    g = jax.jit(jax.grad(f, argnums=(0, 1)))(xs, es)
    np.testing.assert_allclose(np.asarray(g[0]).reshape(-1, E),
                               np.asarray(ref[0]), atol=2e-6, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(ref[1]),
                               atol=2e-6, rtol=1e-4)


def test_jit_and_scan_compatible():
    x, emb, tgt, mask = _setup(N=32, V=300)

    @jax.jit
    def f(x, emb):
        loss, n = chunked_cross_entropy(x, emb, tgt, mask, chunk=128)
        return loss / n

    v1 = float(f(x, emb))
    v2 = float(dense(x, emb, tgt, mask)[0] / dense(x, emb, tgt, mask)[1])
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
