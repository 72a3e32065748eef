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
