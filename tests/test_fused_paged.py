"""Fused Pallas elementwise kernels + paged KV cache tests."""

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.ops.fused import rotary_apply, swiglu
from unilm_tpu.runtime.paged_kv import PagedKVConfig, PagePool, paged_attention


def test_swiglu_matches_jnp():
    g = jax.random.normal(jax.random.PRNGKey(0), (3, 50, 128))
    u = jax.random.normal(jax.random.PRNGKey(1), (3, 50, 128))
    out = swiglu(g, u, interpret=True)
    ref = jax.nn.silu(g) * u
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rotary_matches_reference():
    from unilm_tpu.models.yoco import apply_rotary, rotary_sin_cos

    B, T, H, D = 2, 24, 4, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D))
    sin, cos = rotary_sin_cos(jnp.arange(T), D)
    out = rotary_apply(x, sin, cos, interpret=True)
    ref = apply_rotary(x, sin, cos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestPagedKV:
    def make(self):
        cfg = PagedKVConfig(num_pages=16, page_size=4, num_heads=2, head_dim=8,
                            max_pages_per_seq=6, dtype=jnp.float32)
        return cfg, PagePool(cfg)

    def test_allocator_and_append(self):
        cfg, pool = self.make()
        pool.create("a")
        pool.create("b")
        ka = jax.random.normal(jax.random.PRNGKey(0), (10, 2, 8))
        pool.append("a", ka, ka + 1)
        assert pool.length("a") == 10
        assert pool.pages_in_use == 3  # ceil(10/4)
        kb = jax.random.normal(jax.random.PRNGKey(1), (3, 2, 8))
        pool.append("b", kb, kb)
        assert pool.pages_in_use == 4
        pool.free("a")
        assert pool.pages_in_use == 1

    def test_paged_attention_matches_dense(self):
        from unilm_tpu.ops.attention import dot_product_attention

        cfg, pool = self.make()
        rng = np.random.RandomState(0)
        lens = [9, 5]
        ks, vs = [], []
        for i, (sid, L) in enumerate(zip("ab", lens)):
            pool.create(sid)
            k = jnp.asarray(rng.randn(L, 2, 8).astype(np.float32))
            v = jnp.asarray(rng.randn(L, 2, 8).astype(np.float32))
            pool.append(sid, k, v)
            ks.append(k)
            vs.append(v)

        q = jnp.asarray(rng.randn(2, 1, 2, 8).astype(np.float32))
        tables = jnp.asarray(np.stack([pool.block_table("a"), pool.block_table("b")]))
        lengths = jnp.asarray(lens)
        out = paged_attention(q, pool.k_pool, pool.v_pool, tables, lengths)

        for i in range(2):
            ref = dot_product_attention(
                q[i : i + 1], ks[i][None], vs[i][None]
            )
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(ref[0]), atol=1e-5
            )

    def test_incremental_append_consistency(self):
        """Appending in chunks must equal appending at once."""
        cfg, pool = self.make()
        rng = np.random.RandomState(1)
        k = jnp.asarray(rng.randn(7, 2, 8).astype(np.float32))
        pool.create("x")
        pool.append("x", k[:3], k[:3])
        pool.append("x", k[3:], k[3:])
        table = jnp.asarray(pool.block_table("x"))[None]
        q = jnp.asarray(rng.randn(1, 1, 2, 8).astype(np.float32))
        out = paged_attention(q, pool.k_pool, pool.v_pool, table, jnp.asarray([7]))

        cfg2, pool2 = self.make()
        pool2.create("x")
        pool2.append("x", k, k)
        out2 = paged_attention(q, pool2.k_pool, pool2.v_pool,
                               jnp.asarray(pool2.block_table("x"))[None],
                               jnp.asarray([7]))
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_pallas_paged_decode_matches_xla():
    from unilm_tpu.ops.paged_attention import paged_decode_attention

    cfg = PagedKVConfig(num_pages=12, page_size=8, num_heads=4, head_dim=16,
                        max_pages_per_seq=4, dtype=jnp.float32)
    pool = PagePool(cfg)
    rng = np.random.RandomState(0)
    lens = [19, 7, 25]
    for sid, L in zip("abc", lens):
        pool.create(sid)
        k = jnp.asarray(rng.randn(L, 4, 16).astype(np.float32)) * 0.5
        v = jnp.asarray(rng.randn(L, 4, 16).astype(np.float32)) * 0.5
        pool.append(sid, k, v)

    q = jnp.asarray(rng.randn(3, 1, 4, 16).astype(np.float32)) * 0.5
    tables = jnp.asarray(np.stack([pool.block_table(s) for s in "abc"]))
    lengths = jnp.asarray(lens)

    ref = paged_attention(q, pool.k_pool, pool.v_pool, tables, lengths)
    out = paged_decode_attention(q, pool.k_pool, pool.v_pool, tables, lengths,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


class TestServingKernelsInterpret:
    """Interpret-mode semantics of the serving decode kernels (on-chip
    validation lives in benchmarks/kernel_check.py)."""

    def _ref(self, q, k_new, v_new, k_pool, v_pool, rows_of, lengths, scale):
        B, _, H, D = q.shape
        P, page, _, _ = k_pool.shape
        fk = np.array(k_pool).reshape(P * page, H, D)
        fv = np.array(v_pool).reshape(P * page, H, D)
        outs = []
        for b in range(B):
            L = int(lengths[b])
            rows = rows_of(b, L)
            fk[rows[L]] = k_new[b, 0]
            fv[rows[L]] = v_new[b, 0]
            ks, vs = fk[rows[: L + 1]], fv[rows[: L + 1]]
            s = np.einsum("hd,thd->ht", np.float32(q[b, 0]) * scale, np.float32(ks))
            p = np.exp(s - s.max(1, keepdims=True))
            p /= p.sum(1, keepdims=True)
            outs.append(np.einsum("ht,thd->hd", p, np.float32(vs)))
        return (np.stack(outs)[:, None],
                fk.reshape(P, page, H, D), fv.reshape(P, page, H, D))

    def _force_interpret(self, monkeypatch):
        import unilm_tpu.ops.paged_attention as pa
        from jax.experimental import pallas as pl

        orig = pl.pallas_call

        def patched(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(pa.pl, "pallas_call", patched)
        return pa

    def test_table_append_kernel(self, monkeypatch):
        pa = self._force_interpret(monkeypatch)
        rng = np.random.RandomState(0)
        B, H, D, page, P, MP = 3, 4, 64, 16, 20, 6
        q = rng.randn(B, 1, H, D).astype(np.float32)
        kn = rng.randn(B, 1, H, D).astype(np.float32)
        vn = rng.randn(B, 1, H, D).astype(np.float32)
        kp = rng.randn(P, page, H, D).astype(np.float32)
        vp = rng.randn(P, page, H, D).astype(np.float32)
        tables = np.stack([rng.permutation(P)[:MP] for _ in range(B)]).astype(np.int32)
        lengths = np.asarray([0, 17, MP * page - 1], np.int32)
        scale = D**-0.5

        def rows_of(b, L):
            return np.concatenate(
                [tables[b, p] * page + np.arange(page) for p in range(MP)])

        want, wk, wv = self._ref(q, kn, vn, kp, vp, rows_of, lengths, scale)
        HD = H * D
        out, kp2, vp2 = pa.paged_decode_append_attention(
            jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
            jnp.asarray(kp.reshape(P, page, HD)),
            jnp.asarray(vp.reshape(P, page, HD)), jnp.asarray(tables),
            jnp.asarray(lengths), scale)
        np.testing.assert_allclose(np.float32(out), want, atol=2e-5)
        np.testing.assert_array_equal(np.float32(kp2).reshape(P, page, H, D), wk)
        np.testing.assert_array_equal(np.float32(vp2).reshape(P, page, H, D), wv)

    def test_contiguous_run_kernel(self, monkeypatch):
        pa = self._force_interpret(monkeypatch)
        rng = np.random.RandomState(1)
        B, H, D, page, chunk, MPg = 3, 4, 64, 16, 4, 6
        stride = -(-MPg // chunk) * chunk  # chunk-aligned run stride
        P = B * stride + chunk
        q = rng.randn(B, 1, H, D).astype(np.float32)
        kn = rng.randn(B, 1, H, D).astype(np.float32)
        vn = rng.randn(B, 1, H, D).astype(np.float32)
        kp = rng.randn(P, page, H, D).astype(np.float32)
        vp = rng.randn(P, page, H, D).astype(np.float32)
        bases = np.asarray([b * stride for b in range(B)], np.int32)
        lengths = np.asarray([0, 17, MPg * page - 1], np.int32)
        scale = D**-0.5

        def rows_of(b, L):
            return bases[b] * page + np.arange(MPg * page)

        want, wk, wv = self._ref(q, kn, vn, kp, vp, rows_of, lengths, scale)
        HD = H * D
        out, kp2, vp2 = pa.run_decode_append_attention(
            jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
            jnp.asarray(kp.reshape(P, page, HD)),
            jnp.asarray(vp.reshape(P, page, HD)), jnp.asarray(bases),
            jnp.asarray(lengths), max_pages=MPg, scale=scale, chunk=chunk)
        np.testing.assert_allclose(np.float32(out), want, atol=2e-5)
        np.testing.assert_array_equal(np.float32(kp2).reshape(P, page, H, D), wk)
        np.testing.assert_array_equal(np.float32(vp2).reshape(P, page, H, D), wv)
