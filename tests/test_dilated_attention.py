"""LongNet dilated attention: exactness in the dense limit, dilation
structure, causality, mixture sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.ops.attention import dot_product_attention, make_causal_mask
from unilm_tpu.ops.dilated_attention import dilated_attention

B, H, D = 2, 4, 16


def rand(seed, *shape):
    return jax.random.normal(jax.random.PRNGKey(seed), shape) * 0.5


def dense_ref(q, k, v, causal):
    T = q.shape[1]
    mask = None
    if causal:
        mask = make_causal_mask(jnp.arange(T), jnp.arange(T))[None, None]
    return dot_product_attention(q, k, v, mask=mask)


def test_single_full_segment_equals_dense():
    T = 64
    q, k, v = rand(0, B, T, H, D), rand(1, B, T, H, D), rand(2, B, T, H, D)
    for causal in (False, True):
        out = dilated_attention(
            q, k, v, segment_lengths=(T,), dilation_rates=(1,), causal=causal
        )
        ref = dense_ref(q, k, v, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_segmented_blocks_are_independent():
    """w < T: tokens must not attend across segment boundaries."""
    T, w = 64, 16
    q, k, v = rand(0, B, T, H, D), rand(1, B, T, H, D), rand(2, B, T, H, D)
    out = dilated_attention(q, k, v, segment_lengths=(w,), dilation_rates=(1,),
                            causal=True)
    # per-segment dense reference
    refs = []
    for s in range(T // w):
        sl = slice(s * w, (s + 1) * w)
        refs.append(dense_ref(q[:, sl], k[:, sl], v[:, sl], True))
    ref = jnp.concatenate(refs, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_dilation_attends_only_same_offset():
    """r=2: even positions attend only even positions (offset head group)."""
    T, w, r = 32, 32, 2
    q, k, v = rand(0, 1, T, H, D), rand(1, 1, T, H, D), rand(2, 1, T, H, D)
    out = dilated_attention(q, k, v, segment_lengths=(w,), dilation_rates=(r,),
                            causal=True)
    # head group 0 covers offset 0 (even positions): compare vs dense over
    # the even subsequence
    hg = H // r
    q0, k0, v0 = (x[:, ::2, :hg] for x in (q, k, v))
    ref_even = dense_ref(q0, k0, v0, True)
    np.testing.assert_allclose(
        np.asarray(out[:, ::2, :hg]), np.asarray(ref_even), atol=2e-5, rtol=1e-4
    )
    # odd positions in head group 0 got no attention from this offset: zeros
    assert float(jnp.abs(out[:, 1::2, :hg]).max()) == 0.0
    # ...but head group 1 (offset 1) covers them
    q1, k1, v1 = (x[:, 1::2, hg:] for x in (q, k, v))
    ref_odd = dense_ref(q1, k1, v1, True)
    np.testing.assert_allclose(
        np.asarray(out[:, 1::2, hg:]), np.asarray(ref_odd), atol=2e-5, rtol=1e-4
    )


def test_mixture_weights_favor_denser_config():
    """Multi-config output is a convex combination of the per-config outputs."""
    T = 32
    q, k, v = rand(0, B, T, H, D), rand(1, B, T, H, D), rand(2, B, T, H, D)
    out = dilated_attention(
        q, k, v, segment_lengths=(8, 32), dilation_rates=(1, 2), causal=True
    )
    o1 = dilated_attention(q, k, v, segment_lengths=(8,), dilation_rates=(1,),
                           causal=True)
    o2 = dilated_attention(q, k, v, segment_lengths=(32,), dilation_rates=(2,),
                           causal=True)
    lo = jnp.minimum(o1, o2) - 1e-4
    hi = jnp.maximum(o1, o2) + 1e-4
    # positions covered by both configs must lie between the two outputs
    covered = (jnp.abs(o2) > 0)  # dilated config covers its offsets
    between = (out >= lo) & (out <= hi)
    assert bool(jnp.all(jnp.where(covered, between, True)))
    assert bool(jnp.isfinite(out).all())
