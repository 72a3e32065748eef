"""Symbolic bucket-bias machinery (ops/bucket_bias.py) vs dense oracles.

The production LayoutLMv3 bias path is materialize-head-major + stream
(models/layoutlmv3.py fused_bias -> ops/doc_attention); these tests pin
the pieces it is built on: plane packing, the one-hot MXU materialization
against the original relative_attention_bias, and the shared-table
gradient collector (ONE contraction of the layer-summed logit grads).
The in-kernel VPU-gather attention was pruned in round 5 (measured slower
than materialize+stream at every supported shape — module docstring).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unilm_tpu.ops.attention import attention, dot_product_attention
from unilm_tpu.ops.bucket_bias import (
    BucketBias,
    materialize_bias,
    pack_bucket_planes,
    unpack_field,
)


def make_case(B=2, T=37, H=4, D=16, nbs=(32, 64, 64), bcast=False, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, T, H, D), jnp.float32) * 0.5
    k = jnp.asarray(rng.randn(B, T, H, D), jnp.float32) * 0.5
    v = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    Bp = 1 if bcast else B
    planes = [
        jnp.asarray(rng.randint(0, nb, (Bp, T, T)), jnp.int32) for nb in nbs
    ]
    tables = tuple(
        jnp.asarray(rng.randn(nb, H), jnp.float32) * 0.3 for nb in nbs
    )
    kpm = jnp.asarray(rng.rand(B, T) > 0.2)
    kpm = kpm.at[:, 0].set(True)  # never a fully-masked row
    return q, k, v, planes, tables, kpm


def dense_ref(q, k, v, bb, kpm, scale):
    bias = materialize_bias(bb, jnp.float32)
    mask = kpm[:, None, None, :]
    return dot_product_attention(q, k, v, bias=bias, mask=mask, scale=scale)


@pytest.mark.parametrize("nbs", [(32, 64, 64), (48,)])
def test_pack_unpack_roundtrip(nbs):
    _, _, _, planes, _, _ = make_case(nbs=nbs)
    packed = pack_bucket_planes(*planes)
    for t, p in enumerate(planes):
        np.testing.assert_array_equal(
            np.asarray(unpack_field(packed, t)), np.asarray(p))


@pytest.mark.parametrize("bcast", [False, True])
def test_attention_dispatch_materializes(bcast):
    """attention() accepts a symbolic BucketBias and matches the dense
    oracle (the dispatch materializes, then streams)."""
    q, k, v, planes, tables, kpm = make_case(bcast=bcast)
    bb = BucketBias(packed=pack_bucket_planes(*planes), tables=tables,
                    scale=0.25)
    out = attention(q, k, v, bias=bb, key_padding_mask=kpm, scale=0.125,
                    use_flash=False)
    ref = dense_ref(q, k, v, bb, kpm, scale=0.125)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bcast", [False, True])
def test_collector_grad_parity(bcast):
    """Table grads via the shared bias_grad_collector (vbias route, the
    production pattern: bias = stop_grad(dense) + vbias): two 'layers'
    share the tables; JAX must sum their cotangents and the collector's
    single contraction must equal the dense per-layer grads."""
    from unilm_tpu.ops.bucket_bias import bias_grad_collector

    q, k, v, planes, tables, kpm = make_case(T=29, bcast=bcast, seed=5)
    packed = pack_bucket_planes(*planes)
    B, T, H = q.shape[0], q.shape[1], q.shape[2]
    g = jnp.asarray(np.random.RandomState(9).randn(*q.shape), jnp.float32)
    mask = kpm[:, None, None, :]

    def collected_loss(q, k, v, tables):
        bb = BucketBias(packed=packed, tables=tables, scale=0.25)
        dense = jax.lax.stop_gradient(materialize_bias(bb, jnp.float32))
        vbias = bias_grad_collector(
            tables, packed, (dense.shape[0], H, T, T), "float32", 0.25)
        bias = dense + vbias
        o1 = dot_product_attention(q, k, v, bias=bias, mask=mask, scale=0.125)
        o2 = dot_product_attention(o1, k, v, bias=bias, mask=mask, scale=0.125)
        return jnp.sum(o2 * g)

    def dense_loss(q, k, v, tables):
        bb = BucketBias(packed=packed, tables=tables, scale=0.25)
        o1 = dense_ref(q, k, v, bb, kpm, scale=0.125)
        o2 = dense_ref(o1, k, v, bb, kpm, scale=0.125)
        return jnp.sum(o2 * g)

    gf = jax.grad(collected_loss, argnums=(0, 1, 2, 3))(q, k, v, tables)
    gd = jax.grad(dense_loss, argnums=(0, 1, 2, 3))(q, k, v, tables)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gd)):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=5e-4)


def test_model_fused_matches_materialized(monkeypatch):
    """LayoutLMv3 forward+grads identical with fused_bias on (streaming
    head-major path) vs off (materialized relative_attention_bias path)."""
    monkeypatch.setenv("UNILM_TPU_FLASH_INTERPRET", "1")
    import dataclasses

    from unilm_tpu.models.layoutlmv3 import (
        LayoutLMv3ForTokenClassification,
        LayoutLMv3Config,
    )

    cfg = LayoutLMv3Config(
        vocab_size=120, hidden_size=48, num_layers=2, num_heads=4, ffn_dim=96,
        max_positions=64, coordinate_size=8, shape_size=8, input_size=32,
        patch_size=16, num_labels=5, visual_embed=True,
    )
    rng = np.random.RandomState(0)
    B, T = 2, 24
    ids = jnp.asarray(rng.randint(3, 119, (B, T)), jnp.int32)
    xy = rng.randint(0, 900, (B, T, 2, 2))
    xy.sort(axis=2)
    bbox = jnp.asarray(xy.transpose(0, 1, 3, 2).reshape(B, T, 4), jnp.int32)
    imgs = jnp.asarray(rng.rand(B, 32, 32, 3), jnp.float32)
    mask = jnp.asarray(rng.rand(B, T) > 0.2)
    labels = jnp.asarray(rng.randint(0, 5, (B, T)), jnp.int32)

    outs, grads = [], []
    for fused in (True, False):
        c = dataclasses.replace(cfg, fused_bias=fused)
        model = LayoutLMv3ForTokenClassification(c)
        params = model.init(jax.random.PRNGKey(0), ids, bbox, mask, imgs)["params"]

        def loss(p):
            lg = model.apply({"params": p}, ids, bbox, mask, imgs)
            oh = jax.nn.one_hot(labels, 5)
            return -jnp.mean(jax.nn.log_softmax(lg) * oh), lg

        (l, lg), gr = jax.value_and_grad(loss, has_aux=True)(params)
        outs.append(lg)
        grads.append(gr)

    # 1e-4: the fused path folds the bias scale into the tables before
    # the one-hot dot (different rounding order than scale-after-sum)
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=2e-3)


def test_materialize_matches_relative_attention_bias():
    """BucketBias materialization == the original relative_attention_bias."""
    from unilm_tpu.models.layoutlmv3 import (
        LayoutLMv3Config,
        relative_attention_bias,
        relative_bucket_planes,
    )

    cfg = LayoutLMv3Config(hidden_size=48, num_heads=4)
    rng = np.random.RandomState(2)
    B, T, V = 2, 20, 5
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    xy = rng.randint(0, 900, (B, T, 2, 2))
    xy.sort(axis=2)
    bbox = jnp.asarray(xy.transpose(0, 1, 3, 2).reshape(B, T, 4), jnp.int32)
    seg = jnp.asarray(rng.randint(0, 4, (B, T - V)), jnp.int32)
    vs = seg[:, :, None] == seg[:, None, :]
    t1 = jnp.asarray(rng.randn(cfg.rel_pos_bins, 4), jnp.float32)
    tx = jnp.asarray(rng.randn(cfg.rel_2d_pos_bins, 4), jnp.float32)
    ty = jnp.asarray(rng.randn(cfg.rel_2d_pos_bins, 4), jnp.float32)

    ref = relative_attention_bias(cfg, t1, tx, ty, pos, bbox,
                                  valid_span=vs, visual_len=V)
    planes = relative_bucket_planes(cfg, pos, bbox, valid_span=vs, visual_len=V)
    bb = BucketBias(packed=pack_bucket_planes(*planes), tables=(t1, tx, ty),
                    scale=float(cfg.hidden_size // cfg.num_heads) ** -0.5)
    got = materialize_bias(bb, jnp.float32)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
