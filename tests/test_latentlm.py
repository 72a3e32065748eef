"""LatentLM / σ-VAE tests."""

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.models.latentlm import (
    LatentLM,
    LatentLMConfig,
    SigmaVAE,
    SigmaVAEConfig,
    cosine_alpha_bar,
)


def test_sigma_vae_roundtrip():
    cfg = SigmaVAEConfig(latent_dim=4, channels=(8, 16), sigma=0.1)
    vae = SigmaVAE(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = vae.init(jax.random.PRNGKey(1), imgs, jax.random.PRNGKey(2))["params"]
    recon, rloss, kl = vae.apply({"params": params}, imgs, jax.random.PRNGKey(3))
    assert recon.shape == imgs.shape
    assert float(rloss) > 0 and float(kl) > 0
    z = vae.apply({"params": params}, imgs, method=vae.encode)
    assert z.shape == (2, 4, 4, 4)  # 16 / 2^2 spatial, latent 4


def test_cosine_schedule_monotone():
    t = jnp.linspace(0, 1, 11)
    ab = np.asarray(cosine_alpha_bar(t))
    assert ab[0] > 0.99
    assert ab[-1] < 0.01
    assert (np.diff(ab) < 0).all()


def test_latentlm_train_and_sample():
    cfg = LatentLMConfig(vocab_size=50, embed_dim=32, num_layers=2, num_heads=4,
                         ffn_dim=64, latent_dim=4, use_flash=False)
    m = LatentLM(cfg)
    B, T, Q = 2, 12, 3
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, T), 4, 50)
    latent_mask = jnp.zeros((B, T), bool).at[:, [3, 4, 5]].set(True)
    latents = jax.random.normal(jax.random.PRNGKey(1), (B, Q, 4))
    params = m.init(jax.random.PRNGKey(2), tokens, latents, latent_mask,
                    jax.random.PRNGKey(3))["params"]
    logits, dloss = m.apply({"params": params}, tokens, latents, latent_mask,
                            jax.random.PRNGKey(4))
    assert logits.shape == (B, T, 50)
    assert np.isfinite(float(dloss)) and float(dloss) > 0

    cond = jax.random.normal(jax.random.PRNGKey(5), (B, 32))
    z = m.apply({"params": params}, cond, jax.random.PRNGKey(6), 8,
                method=m.sample_latent)
    assert z.shape == (B, 4)
    assert np.isfinite(np.asarray(z)).all()


def test_latentlm_diffusion_grad_flows():
    cfg = LatentLMConfig(vocab_size=50, embed_dim=32, num_layers=1, num_heads=4,
                         ffn_dim=64, latent_dim=4, use_flash=False)
    m = LatentLM(cfg)
    B, T, Q = 1, 8, 2
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, T), 4, 50)
    latent_mask = jnp.zeros((B, T), bool).at[:, [2, 3]].set(True)
    latents = jax.random.normal(jax.random.PRNGKey(1), (B, Q, 4))
    params = m.init(jax.random.PRNGKey(2), tokens, latents, latent_mask,
                    jax.random.PRNGKey(3))["params"]

    def loss(p):
        _, dl = m.apply({"params": p}, tokens, latents, latent_mask,
                        jax.random.PRNGKey(4))
        return dl

    g = jax.grad(loss)(params)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert gn > 0
