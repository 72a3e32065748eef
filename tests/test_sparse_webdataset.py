"""ReSA block-sparse decode attention + webdataset tar-shard streaming."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# ------------------------------ ReSA --------------------------------------- #

def _dense_ref(q, k, v, kv_len, scale):
    s = jnp.einsum("bhd,bshd->bhs", q[:, 0] * scale, k,
                   preferred_element_type=jnp.float32)
    mask = (jnp.arange(k.shape[1]) < kv_len)[None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("bhs,bshd->bhd", p, v,
                      preferred_element_type=jnp.float32)[:, None]


def test_sparse_equals_dense_when_all_blocks_selected():
    from unilm_tpu.ops.sparse_attention import (
        ReSAConfig,
        block_key_summary,
        select_blocks,
        sparse_decode_attention,
    )

    B, S, H, D, bs = 2, 256, 4, 32, 32
    cfg = ReSAConfig(block_size=bs, topk_blocks=S // bs)  # k = all blocks
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    kv_len = jnp.asarray(200)
    summ = block_key_summary(k, bs)
    ids = select_blocks(q, summ, kv_len, cfg)
    out = sparse_decode_attention(q, k, v, ids, kv_len, cfg, scale=D**-0.5)
    ref = _dense_ref(q, k, v, kv_len, D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_block_selection_finds_hot_block_and_forces_sink_local():
    from unilm_tpu.ops.sparse_attention import (
        ReSAConfig,
        block_key_summary,
        select_blocks,
    )

    B, S, H, D, bs = 1, 512, 2, 16, 64
    cfg = ReSAConfig(block_size=bs, topk_blocks=4, sink_blocks=1, local_blocks=1)
    q = jnp.ones((B, 1, H, D))
    k = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D)) * 0.01
    # plant a strongly-aligned block at block 4
    k = k.at[:, 4 * bs : 5 * bs].set(1.0)
    kv_len = jnp.asarray(S)
    ids = set(np.asarray(select_blocks(q, block_key_summary(k, bs), kv_len, cfg))[0])
    assert 4 in ids        # hot block found
    assert 0 in ids        # sink forced
    assert (S // bs) - 1 in ids  # local (newest) forced


def test_resa_near_lossless_on_peaked_attention():
    """When attention mass is concentrated (the regime sparse decode
    targets), top-k blocks reproduce dense output closely."""
    from unilm_tpu.ops.sparse_attention import (
        ReSAConfig,
        block_key_summary,
        select_blocks,
        sparse_decode_attention,
    )

    B, S, H, D, bs = 1, 1024, 4, 32, 64
    # 2 forced (sink + newest) + 2 hot + 1 slack
    cfg = ReSAConfig(block_size=bs, topk_blocks=5, sink_blocks=1, local_blocks=1)
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, 1, H, D)) * 2.0
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D)) * 0.05
    # two block-aligned hot regions (blocks 2 and 11)
    k = k.at[:, 128:192].set(q[:, 0][:, None] * 0.8)
    k = k.at[:, 704:768].set(q[:, 0][:, None] * 0.7)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    kv_len = jnp.asarray(S)
    ids = select_blocks(q, block_key_summary(k, bs), kv_len, cfg)
    out = sparse_decode_attention(q, k, v, ids, kv_len, cfg)
    ref = _dense_ref(q, k, v, kv_len, D**-0.5)
    err = float(jnp.max(jnp.abs(out - ref))) / float(jnp.max(jnp.abs(ref)))
    assert err < 0.05


def test_resa_decode_step_rectify_cadence():
    from unilm_tpu.ops.sparse_attention import (
        ReSAConfig,
        block_key_summary,
        resa_decode_step,
        update_block_summary,
    )

    B, S, H, D, bs = 1, 128, 2, 16, 32
    cfg = ReSAConfig(block_size=bs, topk_blocks=2, rectify_interval=4,
                     sink_blocks=1, local_blocks=1)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    kv_len = jnp.asarray(96)
    summ = block_key_summary(k, bs)
    ref = _dense_ref(q, k, v, kv_len, D**-0.5)
    # step 0 and 4 -> dense (exact); step 1 -> sparse (approximate)
    out0 = resa_decode_step(q, k, v, summ, kv_len, jnp.asarray(0), cfg)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)
    out1 = resa_decode_step(q, k, v, summ, kv_len, jnp.asarray(1), cfg)
    assert out1.shape == ref.shape

    # incremental summary update matches recompute
    k2 = k.at[:, 96].set(jax.random.normal(jax.random.PRNGKey(3), (B, H, D)))
    s_inc = update_block_summary(summ, k2, jnp.asarray(96), bs)
    # block 3 mean over its valid prefix (exactly one element, at pos 96)
    np.testing.assert_allclose(
        np.asarray(s_inc[0, 3]), np.asarray(k2[0, 96]), atol=1e-6
    )


# --------------------------- webdataset ------------------------------------ #

def _make_shards(tmp_path, n_shards=2, per=4, img=16):
    from PIL import Image

    from unilm_tpu.data.webdataset import write_tar_shard

    paths = []
    k = 0
    for si in range(n_shards):
        samples = []
        for _ in range(per):
            buf = io.BytesIO()
            arr = (np.full((img, img, 3), (k * 37) % 255, np.uint8))
            Image.fromarray(arr).save(buf, format="PNG")
            samples.append({
                "__key__": f"{k:06d}",
                "png": buf.getvalue(),
                "cls": str(k % 16).encode(),
            })
            k += 1
        p = tmp_path / f"shard_{si}.tar"
        write_tar_shard(str(p), samples)
        paths.append(str(p))
    return paths


def test_webdataset_stream_and_batches(tmp_path):
    from unilm_tpu.data.webdataset import classification_batches, webdataset_stream

    paths = _make_shards(tmp_path)
    stream = webdataset_stream(paths, image_size=16, seed=0, shuffle_buffer=4)
    batches = classification_batches(stream, 4)
    b = next(batches)
    assert b["images"].shape == (4, 16, 16, 3)
    assert b["labels"].shape == (4,)
    assert b["images"].dtype == np.float32

    # checkpointable: state roundtrip reproduces the stream
    next(batches)
    state = batches.getstate()
    want = [next(batches)["labels"] for _ in range(3)]
    batches.setstate(state)
    got = [next(batches)["labels"] for _ in range(3)]
    for a, c in zip(want, got):
        np.testing.assert_array_equal(a, c)


def test_webdataset_finite_epoch(tmp_path):
    from unilm_tpu.data.webdataset import webdataset_stream

    paths = _make_shards(tmp_path, n_shards=1, per=3)
    stream = webdataset_stream(paths, image_size=8, infinite=False,
                               shuffle_buffer=1)
    seen = [s["__key__"] for s in stream]
    assert len(seen) == 3
