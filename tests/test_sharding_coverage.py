"""Sharding-rule coverage: every model's param tree must shard under fsdp.

Guards sharding-rule rot as models grow (VERDICT round-2 item #9): for each
registered flagship architecture, every >=2D parameter that HAS a dim
divisible by the fsdp axis must get a non-replicated PartitionSpec from
infer_param_shardings — i.e. ZeRO-3-style parameter sharding
(reference: fairseq/distributed/fully_sharded_data_parallel.py:23) covers
the whole tree, not just the leaves the name-rules happened to match.
"""

import jax
import jax.numpy as jnp
import pytest

from unilm_tpu.parallel import infer_param_shardings, make_mesh


def _abstract_params(build):
    return jax.eval_shape(build, jax.random.PRNGKey(0))["params"]


def _beit():
    from unilm_tpu.models import registry

    cfg, m = registry.build("beit_base_patch16_224")
    img = jnp.zeros((1, 224, 224, 3))
    return _abstract_params(lambda r: m.init(r, img))


def _layoutlmv3():
    from unilm_tpu.models import registry

    cfg, m = registry.build("layoutlmv3_base")
    ids = jnp.zeros((1, 16), jnp.int32)
    bbox = jnp.zeros((1, 16, 4), jnp.int32)
    img = jnp.zeros((1, cfg.input_size, cfg.input_size, 3))
    return _abstract_params(lambda r: m.init(r, ids, bbox, images=img))


def _trocr():
    from unilm_tpu.models import registry

    cfg, m = registry.build("trocr_base")
    img = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    toks = jnp.zeros((1, 8), jnp.int32)
    return _abstract_params(lambda r: m.init(r, img, toks))


def _kosmos():
    from unilm_tpu.models import registry

    cfg, m = registry.build("kosmos2_5")
    toks = jnp.zeros((1, 64), jnp.int32)
    mask = jnp.zeros((1, 64), bool).at[:, 2:6].set(True)
    segs = jnp.zeros((1, 64), jnp.int32)
    patches = jnp.zeros((1, 8, 2 + cfg.pix2struct.patch_dim))
    return _abstract_params(lambda r: m.init(r, toks, patches, mask, segs))


def _retnet():
    from unilm_tpu.models import registry

    cfg, m = registry.build("retnet_base")
    toks = jnp.zeros((1, 16), jnp.int32)
    return _abstract_params(lambda r: m.init(r, toks))


def _yoco():
    from unilm_tpu.models import registry

    cfg, m = registry.build("yoco_base")
    toks = jnp.zeros((1, 16), jnp.int32)
    return _abstract_params(lambda r: m.init(r, toks))


def _beit3():
    from unilm_tpu.models import registry

    cfg, m = registry.build("beit3_base")
    img = jnp.zeros((1, 224, 224, 3))
    return _abstract_params(lambda r: m.init(r, img))


MODELS = {
    "beit_base": _beit,
    "layoutlmv3_base": _layoutlmv3,
    "trocr_base": _trocr,
    "kosmos2_5": _kosmos,
    "retnet_base": _retnet,
    "yoco_base": _yoco,
    "beit3_base": _beit3,
}


@pytest.fixture(scope="module")
def fsdp_mesh():
    return make_mesh({"fsdp": -1})


@pytest.mark.parametrize("name", sorted(MODELS))
def test_fsdp_covers_all_2d_params(name, fsdp_mesh):
    params = MODELS[name]()
    sh = infer_param_shardings(params, fsdp_mesh)
    fsdp = fsdp_mesh.shape["fsdp"]

    bad, total, sharded_size = [], 0, 0
    leaves = jax.tree_util.tree_leaves_with_path(params)
    shardings = jax.tree_util.tree_leaves(sh)
    for (path, leaf), s in zip(leaves, shardings):
        if leaf.ndim < 2:
            continue
        total += leaf.size
        spec = s.spec
        replicated = all(ax is None for ax in spec)
        if not replicated:
            sharded_size += leaf.size
        divisible = any(d % fsdp == 0 and d > 1 for d in leaf.shape)
        if divisible and replicated:
            keys = "/".join(getattr(p, "key", str(p)) for p in path)
            bad.append(f"{keys} {leaf.shape}")
    assert not bad, f"{name}: replicated >=2D params under fsdp:\n" + "\n".join(bad)
    # size-weighted: nearly all matrix parameters must actually shard
    assert sharded_size / total > 0.95, (
        f"{name}: only {sharded_size/total:.1%} of >=2D param size sharded"
    )


def test_tensor_parallel_hits_attention_and_ffn():
    """Under a tensor axis, column/row-parallel kernels must use it
    (Megatron splits, model_parallel/megatron_trainer.py:27)."""
    mesh = make_mesh({"tensor": 2, "fsdp": -1})
    params = MODELS["retnet_base"]()
    sh = infer_param_shardings(params, mesh)
    hits = 0
    for (path, leaf), s in zip(
        jax.tree_util.tree_leaves_with_path(params), jax.tree_util.tree_leaves(sh)
    ):
        keys = "/".join(getattr(p, "key", str(p)) for p in path)
        if any(k in keys for k in ("q_proj", "k_proj", "v_proj", "out_proj",
                                   "fc1", "fc2")) and keys.endswith("kernel"):
            assert "tensor" in s.spec, f"{keys}: {s.spec} misses tensor axis"
            hits += 1
    assert hits >= 4
