"""Pipeline parallelism (GPipe over shard_map) vs sequential oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from unilm_tpu.parallel import make_mesh
from unilm_tpu.parallel.pipeline import pipeline_apply, stack_stage_params


def mlp_layer_params(key, d):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (d, 2 * d)) * 0.1,
        "w2": jax.random.normal(k2, (2 * d, d)) * 0.1,
    }


def apply_layer(p, x):
    return x + jnp.tanh(x @ p["w1"]) @ p["w2"]


def apply_stage(stage_params, x):
    # stage_params leaves: [per_stage, ...]
    def body(h, lp):
        return apply_layer(lp, h), None

    out, _ = jax.lax.scan(body, x, stage_params)
    return out


@pytest.mark.parametrize("stages,layers,micro", [(4, 8, 6), (2, 4, 3), (8, 8, 2)])
def test_pipeline_matches_sequential(stages, layers, micro):
    assert jax.device_count() >= stages
    mesh = make_mesh({"data": -1}, devices=jax.devices()[:stages])  # axis reused as stage
    d = 16
    keys = jax.random.split(jax.random.PRNGKey(0), layers)
    layer_params = [mlp_layer_params(k, d) for k in keys]
    stacked = stack_stage_params(layer_params, stages)
    x = jax.random.normal(jax.random.PRNGKey(1), (micro, 4, d))

    # sequential oracle
    ref = x
    for lp in layer_params:
        ref = jax.vmap(lambda mb: apply_layer(lp, mb))(ref)

    f = shard_map(
        lambda p, xx: pipeline_apply(apply_stage, p, xx, axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"), P(None)),
        out_specs=P(None),
    )
    # shard_map with P('data') on leading stage dim leaves [1, per, ...]; squeeze
    def wrapped(p, xx):
        p = jax.tree.map(lambda l: l[0], p)
        return pipeline_apply(apply_stage, p, xx, axis_name="data")

    f = shard_map(wrapped, mesh=mesh, in_specs=(P("data"), P(None)),
                  out_specs=P(None))
    out = jax.jit(f)(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
