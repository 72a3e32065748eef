"""BEiT-2 VQ-KD tokenizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.models.beit2 import (
    Beit2PretrainConfig,
    BEiT2ForMaskedImageModelingCLS,
    DiscreteVAE,
    NormEMAVectorQuantizer,
    VQKD,
    VQKDConfig,
)


def test_quantizer_roundtrip_and_ema():
    q = NormEMAVectorQuantizer(num_tokens=16, codebook_dim=8, decay=0.5)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    variables = q.init(jax.random.PRNGKey(1), z)
    quant, loss, idx = q.apply(variables, z)
    assert quant.shape == z.shape
    assert idx.shape == (2, 5)
    assert float(loss) >= 0
    # quantized vectors are codebook rows (unit norm)
    norms = np.linalg.norm(np.asarray(quant), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    # EMA update moves the codebook
    before = np.asarray(variables["ema"]["embedding"])
    (_, _, _), upd = q.apply(variables, z, update_ema=True, mutable=["ema"])
    after = np.asarray(upd["ema"]["embedding"])
    assert np.abs(after - before).max() > 1e-4
    # still normalized
    np.testing.assert_allclose(np.linalg.norm(after, axis=-1), 1.0, atol=1e-4)


def test_quantizer_straight_through_gradient():
    q = NormEMAVectorQuantizer(num_tokens=8, codebook_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4))
    variables = q.init(jax.random.PRNGKey(1), z)

    def f(z):
        quant, loss, _ = q.apply(variables, z)
        return jnp.sum(quant**2) + loss

    g = jax.grad(f)(z)
    assert np.abs(np.asarray(g)).max() > 0  # gradient flows through ST


def test_vqkd_forward():
    cfg = VQKDConfig(
        img_size=16, patch_size=8, encoder_dim=32, encoder_layers=1,
        encoder_heads=4, decoder_dim=32, decoder_layers=1, decoder_heads=4,
        codebook_size=32, codebook_dim=8, teacher_dim=16, use_flash=False,
    )
    model = VQKD(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), imgs)
    rec, vq_loss, idx = model.apply(variables, imgs)
    assert rec.shape == (2, 4, 16)
    assert idx.shape == (2, 4)
    ids = model.apply(variables, imgs, method=model.get_codebook_indices)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(idx))


def test_discrete_vae():
    model = DiscreteVAE(vocab_size=64, hidden=8, image_size=16, downscale=2)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), imgs)
    ids = model.apply(variables, imgs, method=model.get_codebook_indices)
    assert ids.shape == (2, 16)
    assert int(ids.max()) < 64


def test_beit2_cls_pretrain():
    cfg = Beit2PretrainConfig(
        img_size=16, patch_size=8, embed_dim=32, num_layers=3, num_heads=4,
        vocab_size=64, early_layer=1, use_flash=False,
    )
    model = BEiT2ForMaskedImageModelingCLS(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    mask = jnp.zeros((2, 4), bool).at[:, :2].set(True)
    variables = model.init(jax.random.PRNGKey(1), imgs, mask)
    logits, logits_cls = model.apply(variables, imgs, mask)
    assert logits.shape == (2, 4, 64)
    assert logits_cls.shape == (2, 4, 64)
