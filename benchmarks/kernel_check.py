"""On-chip Pallas kernel validation: every custom kernel vs its XLA oracle.

The CPU test suite runs kernels in interpret mode, which cannot catch
Mosaic/TPU-lowering bugs (a round-2 unwritten-output bug shipped green on
CPU and surfaced only on real hardware). This script runs each kernel ON
THE CHIP at shapes that exercise the TPU-only paths (blocked grids, tri
mask, one-pass, layout-native, paged DMA) and compares against XLA.

Run every round:  python benchmarks/kernel_check.py
Exit code 0 + one PASS line per kernel, or FAIL with the max error.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name, got, want, tol):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    ok = err <= tol and bool(jnp.isfinite(got.astype(jnp.float32)).all())
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_err {err:.2e} (tol {tol:.0e})")
    if not ok:
        FAILED.append(name)


def ref_attn(q, k, v, causal=False, window=0, kv_len=None, q_offset=0, kpm=None,
             bias=None, scale=None):
    from unilm_tpu.ops.attention import (
        dot_product_attention, make_causal_mask, make_window_mask,
    )

    T, S = q.shape[1], k.shape[1]
    qp, kp = jnp.arange(T) + q_offset, jnp.arange(S)
    mask = None

    def _and(a, b):
        return b if a is None else a & b

    if kpm is not None:
        mask = _and(mask, kpm[:, None, None, :])
    if causal:
        mask = _and(mask, make_causal_mask(qp, kp)[None, None])
    if window:
        mask = _and(mask, make_window_mask(qp, kp, window)[None, None])
    if kv_len is not None:
        mask = _and(mask, (kp < kv_len)[None, None, None, :])
    return dot_product_attention(q, k, v, bias=bias, mask=mask, scale=scale)


def main():
    assert jax.default_backend() == "tpu", "run on the chip"
    from unilm_tpu.ops import flash_attention as fa

    B, H, D = 2, 4, 64
    r = lambda s, *sh: jax.random.normal(jax.random.PRNGKey(s), sh, jnp.float32) * 0.5

    # ---- blocked flash: every body-selection path at T >= 512 -------------
    T = S = 1024
    q, k, v = r(0, B, T, H, D), r(1, B, S, H, D), r(2, B, S, H, D)
    j = jax.jit(lambda q, k, v, **kw: fa.flash_attention(q, k, v, **kw),
                static_argnames=("causal", "window", "block_q", "block_k"))
    check("flash causal sq1024+tri", j(q, k, v, causal=True),
          ref_attn(q, k, v, causal=True), 5e-3)
    check("flash causal sq512", j(q, k, v, causal=True, block_q=512, block_k=512),
          ref_attn(q, k, v, causal=True), 5e-3)
    check("flash noncausal", j(q, k, v), ref_attn(q, k, v), 5e-3)
    check("flash window=128", j(q, k, v, causal=True, window=128),
          ref_attn(q, k, v, causal=True, window=128), 5e-3)
    qo = jnp.asarray(64, jnp.int32)
    check("flash causal q_offset",
          jax.jit(lambda q, k, v: fa.flash_attention(q, k, v, causal=True, q_offset=qo))(q, k, v),
          ref_attn(q, k, v, causal=True, q_offset=64), 5e-3)
    kl = jnp.asarray(700, jnp.int32)
    check("flash prefill kv_len+offset",
          jax.jit(lambda q2, k, v: fa.flash_attention(
              q2, k, v, causal=True, q_offset=qo, kv_len=kl))(q[:, :256], k, v),
          ref_attn(q[:, :256], k, v, causal=True, q_offset=64, kv_len=700), 5e-3)
    kpm = kpm2 = jnp.ones((B, S), bool).at[0, 800:].set(False)
    check("flash key-padding",
          jax.jit(lambda q, k, v: fa.flash_attention(q, k, v, key_padding_mask=kpm))(q, k, v),
          ref_attn(q, k, v, kpm=kpm), 5e-3)
    bias = r(3, 1, H, T, S)
    check("flash bias",
          jax.jit(lambda q, k, v, b: fa.flash_attention(q, k, v, bias=b))(q, k, v, bias),
          ref_attn(q, k, v, bias=bias), 5e-3)

    # ---- blocked flash backward -------------------------------------------
    def gl(f):
        return jax.jit(jax.grad(lambda q, k, v: jnp.sum(f(q, k, v) ** 2),
                                argnums=(0, 1, 2)))

    gk = gl(lambda q, k, v: fa.flash_attention(q, k, v, causal=True))(q, k, v)
    gr = gl(lambda q, k, v: ref_attn(q, k, v, causal=True))(q, k, v)
    for n, a, b in zip("qkv", gk, gr):
        check(f"flash backward d{n}", a, b, 2e-2)
    gk = gl(lambda q, k, v: fa.flash_attention(q, k, v, key_padding_mask=kpm2))(q, k, v)
    gr = gl(lambda q, k, v: ref_attn(q, k, v, kpm=kpm2))(q, k, v)
    for n, a, b in zip("qkv", gk, gr):
        check(f"flash backward+kpm d{n}", a, b, 2e-2)

    # broadcast-bias backward (bias_acc_b row accumulator): dbias sums over B
    Tb = Sb = 197
    qb, kb, vb = r(0, B, Tb, H, D), r(1, B, Sb, H, D), r(2, B, Sb, H, D)
    bias_b = r(3, 1, H, Tb, Sb)

    def glb(f):
        return jax.jit(jax.grad(lambda q, k, v, b: jnp.sum(f(q, k, v, b) ** 2),
                                argnums=(0, 1, 2, 3)))

    gk = glb(lambda q, k, v, b: fa.flash_attention(
        q, k, v, bias=b))(qb, kb, vb, bias_b)
    gr = glb(lambda q, k, v, b: ref_attn(q, k, v, bias=b))(qb, kb, vb, bias_b)
    for n, a, b in zip(("q", "k", "v", "bias"), gk, gr):
        check(f"flash backward bcast-bias d{n}", a, b, 2e-2)

    # ---- one-pass + layout-native encoder kernels --------------------------
    T2 = S2 = 197
    q2, k2, v2 = r(0, B, T2, H, D), r(1, B, S2, H, D), r(2, B, S2, H, D)
    bias2 = r(3, 1, H, T2, S2)
    check("onepass causal (short T)",
          jax.jit(lambda q, k, v: fa.flash_attention(q, k, v, causal=True))(q2, k2, v2),
          ref_attn(q2, k2, v2, causal=True), 5e-3)
    check("fused_encoder_attention",
          jax.jit(lambda q, k, v, b: fa.fused_encoder_attention(q, k, v, b, D**-0.5))(
              q2, k2, v2, bias2),
          ref_attn(q2, k2, v2, bias=bias2), 5e-3)

    # one-pass encoder backward (_vit_bwd_kernel): dq/dk/dv + batch-summed
    # dbias vs XLA autodiff through the reference
    gk = glb(lambda q, k, v, b: fa.fused_encoder_attention(
        q, k, v, b, D**-0.5))(q2, k2, v2, bias2)
    gr = glb(lambda q, k, v, b: ref_attn(q, k, v, bias=b))(q2, k2, v2, bias2)
    for n, a, b in zip(("q", "k", "v", "bias"), gk, gr):
        check(f"fused encoder backward d{n}", a, b, 2e-2)

    # ---- paged decode kernel ----------------------------------------------
    from unilm_tpu.ops.paged_attention import paged_decode_attention

    page, MP = 64, 16
    P = B * MP + 4
    rng = np.random.RandomState(0)
    qd = r(0, B, 1, 16, D)
    kp_ = r(1, P, page, 16, D)
    vp_ = r(2, P, page, 16, D)
    tables = jnp.asarray(rng.permutation(P)[: B * MP].reshape(B, MP), jnp.int32)
    lengths = jnp.asarray([900, 1000], jnp.int32)
    got = jax.jit(paged_decode_attention)(qd, kp_, vp_, tables, lengths)
    kg = kp_[tables].reshape(B, MP * page, 16, D)
    vg = vp_[tables].reshape(B, MP * page, 16, D)
    want = ref_attn(qd, kg, vg, kv_len=None, kpm=(jnp.arange(MP * page)[None] <
                                                  lengths[:, None]))
    check("paged decode", got, want, 5e-3)

    # ---- fused append+attend serving kernel ---------------------------------
    from unilm_tpu.ops.paged_attention import paged_decode_append_attention

    kn, vn = r(3, B, 1, 16, D), r(4, B, 1, 16, D)
    got_a, kp2, vp2 = jax.jit(paged_decode_append_attention)(
        qd, kn, vn, kp_.reshape(P, page, 16 * D), vp_.reshape(P, page, 16 * D),
        tables, lengths)
    kp2 = kp2.reshape(P, page, 16, D)
    vp2 = vp2.reshape(P, page, 16, D)
    kp_ref = np.array(kp_)
    vp_ref = np.array(vp_)
    for b in range(B):
        L = int(lengths[b])
        kp_ref[int(tables[b, L // page]), L % page] = np.array(kn)[b, 0]
        vp_ref[int(tables[b, L // page]), L % page] = np.array(vn)[b, 0]
    kg2 = kp_ref[np.array(tables)].reshape(B, MP * page, 16, D)
    vg2 = vp_ref[np.array(tables)].reshape(B, MP * page, 16, D)
    want_a = ref_attn(qd, jnp.asarray(kg2), jnp.asarray(vg2),
                      kpm=(jnp.arange(MP * page)[None] < (lengths + 1)[:, None]))
    check("paged append+attend out", got_a, want_a, 5e-3)
    check("paged append k-pool", kp2, jnp.asarray(kp_ref), 1e-6)
    check("paged append v-pool", vp2, jnp.asarray(vp_ref), 1e-6)

    # ---- contiguous-run append kernel --------------------------------------
    from unilm_tpu.ops.paged_attention import run_decode_append_attention

    chunk = 4
    # runs must start chunk-aligned (slab index maps address chunk units)
    stride_r = -(-MP // chunk) * chunk
    bases_np = np.asarray([chunk + b * stride_r for b in range(B)], np.int32)
    # same pool, but sequences live in contiguous runs starting at bases
    got_r, kr, vr = jax.jit(
        functools.partial(run_decode_append_attention, chunk=chunk))(
        qd, kn, vn, kp_.reshape(P, page, 16 * D), vp_.reshape(P, page, 16 * D),
        jnp.asarray(bases_np), lengths)
    fk = np.array(kp_).reshape(-1, 16, D)
    fvv = np.array(vp_).reshape(-1, 16, D)
    for b in range(B):
        L = int(lengths[b])
        fk[bases_np[b] * page + L] = np.array(kn)[b, 0]
        fvv[bases_np[b] * page + L] = np.array(vn)[b, 0]
    want_r = []
    for b in range(B):
        L = int(lengths[b])
        rows = bases_np[b] * page + np.arange(L + 1)
        ks, vs = fk[rows], fvv[rows]
        s = np.einsum("hd,thd->ht", np.float32(np.array(qd)[b, 0]) * 1.0, np.float32(ks))
        s = s * (D ** -0.5)
        p_ = np.exp(s - s.max(1, keepdims=True)); p_ /= p_.sum(1, keepdims=True)
        want_r.append(np.einsum("ht,thd->hd", p_, np.float32(vs)))
    want_r = jnp.asarray(np.stack(want_r))[:, None]
    check("run append+attend out", got_r, want_r, 5e-3)
    check("run append k-pool", kr.reshape(-1, 16, D), jnp.asarray(fk), 1e-6)
    check("run append v-pool", vr.reshape(-1, 16, D), jnp.asarray(fvv), 1e-6)

    # ---- int8-quantized contiguous-run kernel ------------------------------
    from unilm_tpu.ops.paged_attention import quantize_kv_rows

    HD16 = 16 * D
    S_sl = chunk * page
    rowsK = kp_.reshape(P * page, HD16)
    rowsV = vp_.reshape(P * page, HD16)
    ki8, vi8, ks8, vs8 = quantize_kv_rows(rowsK, rowsV)
    nslab = P // chunk
    sp8 = jnp.zeros((nslab, 8, S_sl), jnp.float32)
    idx = jnp.arange(P * page)
    sp8 = sp8.at[idx // S_sl, 0, idx % S_sl].set(ks8)
    sp8 = sp8.at[idx // S_sl, 1, idx % S_sl].set(vs8)
    got_q, kq, vq, sq = jax.jit(
        functools.partial(run_decode_append_attention, chunk=chunk))(
        qd, kn, vn, ki8.reshape(P, page, HD16), vi8.reshape(P, page, HD16),
        jnp.asarray(bases_np), lengths, scale_pool=sp8)
    # reference: dequantized history + exact new token (want_r used exact
    # history, so compare against a dequantized recompute instead)
    fkq = (np.float32(ki8) * np.asarray(ks8)[:, None]).reshape(-1, 16, D)
    fvq = (np.float32(vi8) * np.asarray(vs8)[:, None]).reshape(-1, 16, D)
    want_q = []
    for b in range(B):
        L = int(lengths[b])
        rows = bases_np[b] * page + np.arange(L)
        ks_a = np.concatenate([fkq[rows], np.float32(np.array(kn))[b]], axis=0)
        vs_a = np.concatenate([fvq[rows], np.float32(np.array(vn))[b]], axis=0)
        sgt = np.einsum("hd,thd->ht", np.float32(np.array(qd)[b, 0]), ks_a) * (D ** -0.5)
        pgt = np.exp(sgt - sgt.max(1, keepdims=True)); pgt /= pgt.sum(1, keepdims=True)
        want_q.append(np.einsum("ht,thd->hd", pgt, vs_a))
    want_q = jnp.asarray(np.stack(want_q))[:, None]
    check("run int8 out", got_q, want_q, 5e-3)

    # ---- fused rotary / swiglu ---------------------------------------------
    try:
        from unilm_tpu.ops import fused

        x = r(0, B, 128, H, D)
        sin = jnp.sin(jnp.arange(128, dtype=jnp.float32))[:, None].repeat(D // 2, 1)
        cos = jnp.cos(jnp.arange(128, dtype=jnp.float32))[:, None].repeat(D // 2, 1)
        if hasattr(fused, "rotary"):
            got = jax.jit(fused.rotary)(x, sin, cos)
            from unilm_tpu.core.positional import apply_xpos

            want = apply_xpos(x.swapaxes(1, 2), sin, cos, 1.0).swapaxes(1, 2)
            check("fused rotary", got, want, 5e-3)
    except Exception as e:
        print(f"SKIP fused rotary: {type(e).__name__}")

    # ---- doc_attention (blocked one-pass encoder, ops/doc_attention.py) --
    from unilm_tpu.ops.doc_attention import HeadMajorBias, doc_attention

    rng = np.random.RandomState(5)
    Bd, Td, Hd, Dd = 3, 93, 4, 32
    qd = jnp.asarray(rng.randn(Bd, Td, Hd, Dd), jnp.bfloat16) * 0.4
    kd = jnp.asarray(rng.randn(Bd, Td, Hd, Dd), jnp.bfloat16) * 0.4
    vd = jnp.asarray(rng.randn(Bd, Td, Hd, Dd), jnp.bfloat16)
    gd = jnp.asarray(rng.randn(Bd, Td, Hd, Dd), jnp.bfloat16)
    bd = jnp.asarray(rng.randn(Bd, Hd, Td, Td), jnp.bfloat16) * 0.4
    kpmd = jnp.asarray(rng.rand(Bd, Td) > 0.15).at[:, 0].set(True)
    scd = Dd**-0.5
    got = jax.jit(lambda *a: doc_attention(*a, scd, 32, False))(qd, kd, vd, bd, kpmd)
    want = ref_attn(qd, kd, vd, kpm=kpmd, bias=bd, scale=scd)
    check("doc fwd bias+kpm", got, want, 5e-3)

    def dl(q, k, v, b):
        o = doc_attention(q, k, v, b, kpmd, scd, 32, False)
        return jnp.sum(o.astype(jnp.float32) * gd.astype(jnp.float32))

    def rl(q, k, v, b):
        o = ref_attn(q, k, v, kpm=kpmd, bias=b, scale=scd)
        return jnp.sum(o.astype(jnp.float32) * gd.astype(jnp.float32))

    gdoc = jax.jit(jax.grad(dl, argnums=(0, 1, 2, 3)))(qd, kd, vd, bd)
    gref = jax.jit(jax.grad(rl, argnums=(0, 1, 2, 3)))(qd, kd, vd, bd)
    for nm, a, b in zip(["dq", "dk", "dv", "dbias"], gdoc, gref):
        check(f"doc bwd {nm}", a, b, 2e-2)

    hm = HeadMajorBias(hbts=jnp.moveaxis(bd, 1, 0))
    got = jax.jit(lambda q, k, v, b: doc_attention(q, k, v, b, kpmd, scd, 32, False))(qd, kd, vd, hm)
    check("doc fwd head-major bias", got, want, 5e-3)

    print("=" * 40)
    if FAILED:
        print("FAILED:", FAILED)
        sys.exit(1)
    print("ALL KERNEL CHECKS PASSED")


if __name__ == "__main__":
    main()
