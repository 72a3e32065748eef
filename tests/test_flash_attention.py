"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.ops.attention import dot_product_attention, make_causal_mask, make_window_mask
from unilm_tpu.ops import flash_attention as fa

B, H, D = 2, 4, 64


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * 0.5


def reference(q, k, v, bias=None, kpm=None, causal=False, q_offset=0, kv_len=None, window=0):
    T, S = q.shape[1], k.shape[1]
    q_pos = jnp.arange(T) + q_offset
    k_pos = jnp.arange(S)
    mask = None

    def _and(a, b):
        return b if a is None else a & b

    if kpm is not None:
        mask = _and(mask, kpm[:, None, None, :])
    if causal:
        mask = _and(mask, make_causal_mask(q_pos, k_pos)[None, None])
    if window:
        mask = _and(mask, make_window_mask(q_pos, k_pos, window)[None, None])
    if kv_len is not None:
        mask = _and(mask, (k_pos < kv_len)[None, None, None, :])
    return dot_product_attention(q, k, v, bias=bias, mask=mask)


@pytest.mark.parametrize("T,S", [(128, 128), (197, 197), (64, 256)])
@pytest.mark.parametrize("causal", [False, True])
def test_basic_and_causal(T, S, causal):
    if causal and T != S:
        pytest.skip("causal needs square here")
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    out = fa.flash_attention(q, k, v, causal=causal, interpret=True, block_q=64, block_k=64)
    ref = reference(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("bias_b,bias_h", [(1, 1), (1, H), (B, H)])
def test_additive_bias(bias_b, bias_h):
    T = S = 96
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    bias = rand(3, bias_b, bias_h, T, S) * 2.0
    out = fa.flash_attention(q, k, v, bias=bias, interpret=True, block_q=32, block_k=32)
    ref = reference(q, k, v, bias=bias)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_key_padding_mask():
    T = S = 80
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    kpm = jnp.ones((B, S), bool).at[0, 50:].set(False).at[1, 20:40].set(False)
    out = fa.flash_attention(q, k, v, key_padding_mask=kpm, interpret=True, block_q=32, block_k=32)
    ref = reference(q, k, v, kpm=kpm)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_kv_len_and_offset_prefill():
    """Prefill semantics: cache of size S, valid prefix kv_len, q at offset."""
    S, T = 256, 64
    q = rand(0, B, T, H, D)
    k, v = rand(1, B, S, H, D), rand(2, B, S, H, D)
    kv_len = jnp.asarray(160, jnp.int32)
    q_offset = jnp.asarray(96, jnp.int32)
    out = fa.flash_attention(
        q, k, v, causal=True, q_offset=q_offset, kv_len=kv_len,
        interpret=True, block_q=64, block_k=64,
    )
    ref = reference(q, k, v, causal=True, q_offset=96, kv_len=160)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_sliding_window():
    T = S = 256
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    out = fa.flash_attention(
        q, k, v, causal=True, window=64, interpret=True, block_q=64, block_k=64
    )
    ref = reference(q, k, v, causal=True, window=64)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_window_first_block_fully_masked_rows():
    """Regression: rows whose first running k-block is fully masked."""
    T = S = 128
    q, k, v = rand(0, 1, T, H, D), rand(1, 1, S, H, D), rand(2, 1, S, H, D)
    out = fa.flash_attention(
        q, k, v, causal=True, window=16, interpret=True, block_q=128, block_k=128
    )
    ref = reference(q, k, v, causal=True, window=16)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_grad_matches_reference():
    T = S = 64
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    bias = rand(3, 1, H, T, S)

    def loss_flash(q, k, v, bias):
        return jnp.sum(
            fa.flash_attention(q, k, v, bias=bias, causal=True, interpret=True,
                               block_q=32, block_k=32) ** 2
        )

    def loss_ref(q, k, v, bias):
        return jnp.sum(reference(q, k, v, bias=bias, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "causal,window,with_mask,with_bias",
    [
        (False, 0, False, False),
        (True, 0, False, False),
        (True, 64, False, False),
        (False, 0, True, False),
        (True, 0, False, True),   # full [B,H,T,S] bias -> Pallas dbias
        (False, 0, True, True),   # bias + key padding (LayoutLMv3 route)
    ],
)
def test_grad_pallas_backward(causal, window, with_mask, with_bias):
    """Pallas backward kernels (dq/dk/dv [+dbias]) vs XLA autodiff."""
    T = S = 160
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    bias = rand(3, B, H, T, S) if with_bias else None
    kpm = (
        jnp.ones((B, S), bool).at[0, 120:].set(False).at[1, 30:50].set(False)
        if with_mask else None
    )

    def loss_flash(q, k, v, bias):
        return jnp.sum(
            fa.flash_attention(
                q, k, v, bias=bias, key_padding_mask=kpm, causal=causal,
                window=window, interpret=True, block_q=64, block_k=64,
            ) ** 2
        )

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            reference(q, k, v, bias=bias, kpm=kpm, causal=causal, window=window) ** 2
        )

    args = (q, k, v, bias) if with_bias else (q, k, v, None)
    nargs = 4 if with_bias else 3
    gf = jax.grad(lambda *a: loss_flash(*a, *(() if with_bias else (None,))),
                  argnums=tuple(range(nargs)))(*args[:nargs])
    gr = jax.grad(lambda *a: loss_ref(*a, *(() if with_bias else (None,))),
                  argnums=tuple(range(nargs)))(*args[:nargs])
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "causal,T,S,bias_h",
    [
        (False, 197, 197, True),   # BEiT fine-tune shape (ragged, padded)
        (True, 96, 96, True),
        (False, 64, 128, True),    # cross-shaped
        (False, 64, 64, False),    # [1,1,T,S] stays on the dense fallback
    ],
)
def test_grad_broadcast_bias_batch_accumulated(causal, T, S, bias_h):
    """[1,H,T,S] bias with B>1: dbias must SUM over batch via the in-kernel
    row accumulator (bias_acc_b), not the dense fallback — except the
    [1,1,T,S] head-broadcast case which still falls back."""
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    bias = rand(3, 1, H if bias_h else 1, T, S)

    def loss_flash(q, k, v, bias):
        return jnp.sum(
            fa.flash_attention(q, k, v, bias=bias, causal=causal,
                               interpret=True, block_q=64, block_k=64) ** 2
        )

    def loss_ref(q, k, v, bias):
        return jnp.sum(reference(q, k, v, bias=bias, causal=causal) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)


def test_grad_pallas_backward_prefill_offset():
    """Backward through the q_offset/kv_len prefill path."""
    S, T = 256, 64
    q = rand(0, B, T, H, D)
    k, v = rand(1, B, S, H, D), rand(2, B, S, H, D)
    kv_len = jnp.asarray(160, jnp.int32)
    q_offset = jnp.asarray(96, jnp.int32)

    def loss_flash(q, k, v):
        return jnp.sum(
            fa.flash_attention(
                q, k, v, causal=True, q_offset=q_offset, kv_len=kv_len,
                interpret=True, block_q=64, block_k=64,
            ) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(reference(q, k, v, causal=True, q_offset=96, kv_len=160) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "T,S,bias_mode",
    [
        (197, 197, "bh"),    # BEiT fine-tune: [1, H, T, S] rel-pos table
        (197, 197, "none"),
        (64, 128, "h1"),     # cross-shaped, head-broadcast bias
        (96, 96, "batch"),   # per-batch bias
        (200, 197, "bh"),    # S padding -> colmask folded into bias
    ],
)
def test_fused_encoder_backward_onepass(T, S, bias_mode):
    """One-pass Pallas backward of fused_encoder_attention vs XLA autodiff
    (dq/dk/dv and broadcast-reduced dbias)."""
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    scale = D**-0.5
    if bias_mode == "none":
        bias = None
    else:
        bdim = B if bias_mode == "batch" else 1
        hdim = 1 if bias_mode == "h1" else H
        bias = rand(3, bdim, hdim, T, S) * 2.0

    assert fa._vit_bwd_profitable(B, H, T, S, D, 0 if bias is None else bias.shape[1], 4)

    def loss_fused(q, k, v, bias):
        return jnp.sum(
            fa.fused_encoder_attention(q, k, v, bias, scale, True) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(fa._vit_ref(q, k, v, bias, scale) ** 2)

    argnums = (0, 1, 2) if bias is None else (0, 1, 2, 3)
    gf = jax.grad(loss_fused, argnums=argnums)(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=argnums)(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=2e-3)


@pytest.mark.slow
def test_fused_encoder_backward_full_bias_flash_route():
    """Full per-example [B,H,T,S] bias at a shape where the one-pass
    backward is VMEM-unprofitable (LayoutLMv3's 1D+2D bucket bias at
    S~709): _vit_bwd must route through the blocked flash backward's vjp
    (per-block dbias, no materialized [B,H,T,S] f32 logits), not the
    dense fallback. T=S=413 also exercises the pad/colmask handling of
    the blocked path under a full bias."""
    T = S = 413
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    scale = D**-0.5
    bias = rand(3, B, H, T, S) * 2.0
    assert not fa._vit_bwd_profitable(B, H, T, S, D, H, 4)

    def loss_fused(q, k, v, bias):
        return jnp.sum(
            fa.fused_encoder_attention(q, k, v, bias, scale, True) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(fa._vit_ref(q, k, v, bias, scale) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=2e-3)


def test_lse_residual_compact_3d():
    """Every forward variant must emit its lse residual as compact [B,H,T]:
    a [B,H,T,1] residual is tile-padded 128x in HBM (600 MB/layer at
    BEiT-B batch 512 — the round-2 training OOM)."""
    qoff = jnp.zeros((1,), jnp.int32)

    # blocked grid (T > onepass budget at these block sizes)
    T = S = 256
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    lim = jnp.full((1,), S, jnp.int32)
    _, lse = fa._flash_forward(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2), None, None,
        qoff, lim, causal=False, window=0, block_q=64, block_k=64,
        interpret=True)
    assert lse.shape == (B, H, T)

    # one-pass
    _, lse = fa._flash_forward_onepass(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2), None, None,
        qoff, lim, causal=False, window=0, full_kv=True, interpret=True)
    assert lse.shape == (B, H, T)

    # triangular causal grid
    _, lse = fa._flash_forward_tri(
        q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2), None, None,
        qoff, lim, block=64, interpret=True)
    assert lse.shape == (B, H, T)


def test_bf16():
    T = S = 128
    q = rand(0, B, T, H, D).astype(jnp.bfloat16)
    k = rand(1, B, S, H, D).astype(jnp.bfloat16)
    v = rand(2, B, S, H, D).astype(jnp.bfloat16)
    out = fa.flash_attention(q, k, v, causal=True, interpret=True)
    ref = reference(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(jnp.float32), ref.astype(jnp.float32), atol=3e-2, rtol=3e-2
    )


def test_triangular_causal_schedule():
    """Opt-in triangular grid must match the reference exactly."""
    import os

    T = S = 160
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    os.environ["UNILM_TPU_TRI_FLASH"] = "1"
    try:
        out = fa.flash_attention(q, k, v, causal=True, interpret=True,
                                 block_q=64, block_k=64)
    finally:
        del os.environ["UNILM_TPU_TRI_FLASH"]
    ref = reference(q, k, v, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_causal_q_offset_square_shape_regression():
    """Regression (round-2 review): causal + nonzero q_offset at T == S must
    not statically elide the masked body (NaN output)."""
    T = S = 256
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    q_offset = jnp.asarray(4, jnp.int32)
    out = fa.flash_attention(
        q, k, v, causal=True, q_offset=q_offset, interpret=True,
        block_q=64, block_k=64,
    )
    assert bool(jnp.isfinite(out).all())
    ref = reference(q, k, v, causal=True, q_offset=4)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "causal,window,kv,qoff,square",
    [
        (False, 0, None, None, False),
        (True, 0, None, None, True),    # tri + no_masked_body path
        (True, 0, None, None, False),
        (True, 0, None, 4, True),       # q_offset breaks diagonal alignment
        (True, 64, None, None, True),
        (True, 0, 100, 32, False),
    ],
)
def test_blocked_kernel_forced(monkeypatch, causal, window, kv, qoff, square):
    """The one-pass kernel absorbs every small-T shape, so the BLOCKED
    kernel's body-selection logic (fast/diag/masked, static elision) must be
    tested explicitly — a round-2 early-return bug shipped green because no
    CPU test reached the blocked path (caught only on TPU at T>=512)."""
    monkeypatch.setattr(fa, "_onepass_profitable",
                        lambda *a, **kw: False)
    T = S = 128
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    bq, bk = (64, 64) if square else (64, 32)
    out = fa.flash_attention(
        q, k, v, causal=causal, window=window,
        kv_len=None if kv is None else jnp.asarray(kv, jnp.int32),
        q_offset=None if qoff is None else jnp.asarray(qoff, jnp.int32),
        interpret=True, block_q=bq, block_k=bk,
    )
    assert bool(jnp.isfinite(out).all()), "blocked kernel left output unwritten"
    ref = reference(q, k, v, causal=causal, window=window,
                    kv_len=kv, q_offset=qoff or 0)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("causal,T,S,with_mask", [
    (True, 96, 96, False),
    (False, 64, 128, True),
    (True, 256, 256, False),   # multi-block, exercises the dk/dv row slices
])
def test_grad_fused_onepass_backward(monkeypatch, causal, T, S, with_mask):
    """Opt-in fused dq+dk+dv backward (UNILM_TPU_FUSED_BWD) vs reference."""
    monkeypatch.setenv("UNILM_TPU_FUSED_BWD", "1")
    q, k, v = rand(0, B, T, H, D), rand(1, B, S, H, D), rand(2, B, S, H, D)
    mask = None
    if with_mask:
        mask = jnp.arange(S)[None, :] < (S - 16)
        mask = jnp.broadcast_to(mask, (B, S))

    def loss_flash(q, k, v):
        return jnp.sum(
            fa.flash_attention(q, k, v, causal=causal, key_padding_mask=mask,
                               interpret=True, block_q=64, block_k=64) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference(q, k, v, causal=causal, kpm=mask) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)
