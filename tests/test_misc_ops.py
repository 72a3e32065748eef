"""Dynamic/light conv, reproducibility, AOT export."""

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.ops.dynamic_conv import DynamicConvLayer, dynamic_conv, light_conv


def naive_dynamic_conv(x, w, padding_l):
    """O(T*K) loop oracle."""
    B, T, C = x.shape
    _, _, H, K = w.shape
    from scipy.special import softmax as sm

    w = sm(w, axis=-1)
    out = np.zeros_like(x)
    for b in range(B):
        for t in range(T):
            for k in range(K):
                src = t + k - padding_l
                if 0 <= src < T:
                    for h in range(H):
                        ch = slice(h * C // H, (h + 1) * C // H)
                        out[b, t, ch] += w[b, t, h, k] * x[b, src, ch]
    return out


def test_dynamic_conv_matches_naive():
    rng = np.random.RandomState(0)
    B, T, C, H, K = 2, 6, 8, 2, 3
    x = rng.randn(B, T, C).astype(np.float32)
    w = rng.randn(B, T, H, K).astype(np.float32)
    pad = K - 1  # causal
    out = dynamic_conv(jnp.asarray(x), jnp.asarray(w), padding_l=pad)
    ref = naive_dynamic_conv(x, w, pad)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_dynamic_conv_causality():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 8, 1, 3).astype(np.float32))
    o1 = dynamic_conv(x, w, causal=True)
    x2 = x.at[0, 7].set(99.0)
    o2 = dynamic_conv(x2, w, causal=True)
    np.testing.assert_allclose(np.asarray(o1[0, :7]), np.asarray(o2[0, :7]), atol=1e-5)


def test_light_conv_shape():
    x = jnp.ones((2, 10, 8))
    w = jnp.ones((2, 3))
    out = light_conv(x, w, num_heads=2)
    assert out.shape == (2, 10, 8)


def test_dynamic_conv_layer():
    m = DynamicConvLayer(dim=16, kernel_size=3, num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    p = m.init(jax.random.PRNGKey(1), x)["params"]
    assert m.apply({"params": p}, x).shape == (2, 6, 16)


def test_reproducibility():
    """Same seed => bit-identical init + train step (the fairseq
    test_reproducibility intent, trivially strong under jax PRNG)."""
    import optax

    from unilm_tpu.core import Decoder, TransformerConfig
    from unilm_tpu.runtime.train import TrainState, cross_entropy_loss, make_train_step
    import flax.linen as nn
    from unilm_tpu.core.embedding import TextEmbedding

    class LM(nn.Module):
        @nn.compact
        def __call__(self, t):
            emb = TextEmbedding(50, 16, name="e")
            cfg = TransformerConfig(embed_dim=16, ffn_dim=32, num_layers=1,
                                    num_heads=2, use_flash=False, dropout=0.1)
            return emb.attend(Decoder(cfg, name="d")(emb(t), deterministic=False))

    def run():
        m = LM()
        toks = jnp.arange(12).reshape(1, 12) % 50
        params = m.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, toks)["params"]
        tx = optax.adamw(1e-3)

        def loss(p, batch, rng):
            logits = m.apply({"params": p}, batch, rngs={"dropout": rng})
            s, n = cross_entropy_loss(logits[:, :-1], batch[:, 1:])
            return s / n, {}

        st = TrainState.create(params, tx)
        step = jax.jit(make_train_step(loss, tx))
        for i in range(3):
            st, metr = step(st, toks, jax.random.PRNGKey(i))
        return st.params, float(metr["loss"])

    p1, l1 = run()
    p2, l2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aot_export_roundtrip():
    """jax.export serialization of a jitted forward (the TorchScript
    test_export equivalent: the deployable artifact reproduces outputs)."""
    from jax import export as jexport

    from unilm_tpu.models.beit import BeitConfig, BeitForImageClassification

    cfg = BeitConfig(img_size=16, patch_size=8, num_classes=4, embed_dim=16,
                     num_layers=1, num_heads=2, ffn_dim=32, use_flash=False)
    model = BeitForImageClassification(cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), img)["params"]

    fn = jax.jit(lambda im: model.apply({"params": params}, im))
    exported = jexport.export(fn)(img)
    blob = exported.serialize()
    assert len(blob) > 1000
    rehydrated = jexport.deserialize(blob)
    out1 = np.asarray(fn(img))
    out2 = np.asarray(rehydrated.call(img))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_model_registry():
    import jax
    import jax.numpy as jnp

    from unilm_tpu.models import registry

    assert "beit_base_patch16_224" in registry.names()
    assert "kosmos2_5" in registry.names()
    assert len(registry.names()) >= 20

    cfg, model = registry.build("beit_base_patch16_224", num_classes=5,
                                img_size=32, patch_size=8, embed_dim=32,
                                num_layers=1, num_heads=4, ffn_dim=64,
                                use_flash=False)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    p = model.init(jax.random.PRNGKey(1), img)["params"]
    assert model.apply(p if "params" in p else {"params": p}, img).shape == (1, 5)

    try:
        registry.build("nope")
        assert False
    except KeyError as e:
        assert "unknown architecture" in str(e)
