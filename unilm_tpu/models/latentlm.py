"""LatentLM: multimodal LM over continuous latents via next-token diffusion.

Capability-equivalent of LatentLM/ (σ-VAE tokenizer + latent diffusion
language model): images are encoded into continuous latent vectors by a
σ-VAE (fixed-variance posterior); a causal transformer processes interleaved
text tokens + latents, text positions train with CE and latent positions
with a diffusion head (noise-prediction MLP conditioned on the hidden
state); generation samples each latent with a DDIM loop then decodes with
the VAE. The reference's Triton rotary/swiglu kernels map to the shared
core (SURVEY.md §2.8)."""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Decoder


# --------------------------------------------------------------------------- #
# σ-VAE
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class SigmaVAEConfig:
    latent_dim: int = 16
    channels: Tuple[int, ...] = (64, 128, 256)
    sigma: float = 0.1  # fixed posterior std (the σ in σ-VAE)


class SigmaVAE(nn.Module):
    cfg: SigmaVAEConfig

    def setup(self):
        self.enc_convs = [
            nn.Conv(c, (4, 4), strides=(2, 2), padding="SAME", name=f"enc_{i}")
            for i, c in enumerate(self.cfg.channels)
        ]
        self.to_latent = nn.Conv(self.cfg.latent_dim, (1, 1), name="to_latent")
        self.dec_convs = [
            nn.ConvTranspose(c, (4, 4), strides=(2, 2), padding="SAME", name=f"dec_{i}")
            for i, c in enumerate(reversed(self.cfg.channels))
        ]
        self.to_rgb = nn.Conv(3, (3, 3), padding="SAME", name="to_rgb")

    def encode(self, images: jax.Array) -> jax.Array:
        """[B, H, W, 3] -> latent grid [B, h, w, latent_dim] (posterior mean)."""
        x = images
        for conv in self.enc_convs:
            x = jax.nn.silu(conv(x))
        return self.to_latent(x)

    def sample_posterior(self, mean: jax.Array, rng) -> jax.Array:
        return mean + self.cfg.sigma * jax.random.normal(rng, mean.shape)

    def decode(self, z: jax.Array) -> jax.Array:
        x = z
        for conv in self.dec_convs:
            x = jax.nn.silu(conv(x))
        return self.to_rgb(x)

    def __call__(self, images, rng):
        mean = self.encode(images)
        z = self.sample_posterior(mean, rng)
        recon = self.decode(z)
        recon_loss = jnp.mean((recon - images) ** 2)
        # KL of N(mean, σ²I) || N(0, I) with fixed σ: 0.5(mean² + σ² - 1 - 2logσ)
        s2 = self.cfg.sigma**2
        kl = 0.5 * jnp.mean(mean**2 + s2 - 1.0 - math.log(s2))
        return recon, recon_loss, kl


# --------------------------------------------------------------------------- #
# diffusion utilities (cosine schedule, DDPM loss, DDIM sampling)
# --------------------------------------------------------------------------- #


def cosine_alpha_bar(t: jax.Array, s: float = 0.008) -> jax.Array:
    """ᾱ(t) for t in [0, 1] (improved-DDPM cosine schedule)."""
    f = jnp.cos((t + s) / (1 + s) * jnp.pi / 2) ** 2
    f0 = math.cos(s / (1 + s) * math.pi / 2) ** 2
    return f / f0


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000) * jnp.arange(half) / half)
    ang = t[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class DiffusionHead(nn.Module):
    """ε-prediction MLP conditioned on the transformer hidden state
    (LatentLM next-token diffusion head)."""

    latent_dim: int
    hidden: int = 256
    time_dim: int = 64

    @nn.compact
    def __call__(self, z_noisy, t, cond):
        """z_noisy [..., latent], t [...] in [0,1], cond [..., model_dim]."""
        te = timestep_embedding(t, self.time_dim)
        h = jnp.concatenate([z_noisy, te, cond], axis=-1)
        h = jax.nn.silu(nn.Dense(self.hidden, name="fc1")(h))
        h = jax.nn.silu(nn.Dense(self.hidden, name="fc2")(h))
        return nn.Dense(self.latent_dim, name="out")(h)


# --------------------------------------------------------------------------- #
# LatentLM
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class LatentLMConfig:
    vocab_size: int = 32000
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 2048
    latent_dim: int = 16
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    def decoder_cfg(self):
        return TransformerConfig(
            embed_dim=self.embed_dim, ffn_dim=self.ffn_dim,
            num_layers=self.num_layers, num_heads=self.num_heads,
            activation="swiglu", norm_type="rmsnorm", use_bias=False,
            xpos_rel_pos=True, dtype=self.dtype, use_flash=self.use_flash,
        )


class LatentLM(nn.Module):
    """Causal LM over interleaved text tokens + continuous latents.

    inputs: tokens [B, T] with latent positions marked by latent_mask [B, T];
    latents [B, Q, latent_dim] fill the marked slots (in order)."""

    cfg: LatentLMConfig

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.embed_dim,
            embedding_init=nn.initializers.normal(cfg.embed_dim**-0.5),
        )
        self.latent_in = nn.Dense(cfg.embed_dim)
        self.decoder = Decoder(cfg.decoder_cfg())
        self.diffusion_head = DiffusionHead(cfg.latent_dim)

    def backbone(self, tokens, latents, latent_mask):
        from unilm_tpu.models.kosmos import splice_image_features

        emb = self.embed_tokens(tokens)
        if latents is not None:
            emb = splice_image_features(emb, self.latent_in(latents), latent_mask)
        return self.decoder(emb, causal=True)

    def __call__(self, tokens, latents, latent_mask, rng):
        """Training: CE on text positions, diffusion ε-loss on latent
        positions (each latent conditioned on the PREVIOUS hidden state)."""
        h = self.backbone(tokens, latents, latent_mask)
        text_logits = self.embed_tokens.attend(h)

        # diffusion loss: for latent at position p, condition = h[p-1]
        B, Q, LD = latents.shape
        idx = jnp.cumsum(latent_mask.astype(jnp.int32), axis=1) - 1
        # gather conditioning states aligned to each latent slot
        prev_h = jnp.pad(h, ((0, 0), (1, 0), (0, 0)))[:, :-1]
        cond = jnp.zeros((B, Q, h.shape[-1]), h.dtype)
        take = jnp.where(latent_mask[..., None], prev_h, 0).astype(h.dtype)
        # scatter-by-order: k-th True position -> cond[:, k]
        order = jnp.where(latent_mask, idx, Q)  # invalid -> Q (dropped)
        cond = jnp.zeros((B, Q + 1, h.shape[-1]), h.dtype).at[
            jnp.arange(B)[:, None], order
        ].add(take)[:, :Q]

        r1, r2 = jax.random.split(rng)
        t = jax.random.uniform(r1, (B, Q))
        ab = cosine_alpha_bar(t)[..., None]
        noise = jax.random.normal(r2, latents.shape)
        z_noisy = jnp.sqrt(ab) * latents + jnp.sqrt(1 - ab) * noise
        eps = self.diffusion_head(z_noisy, t, cond)
        diff_loss = jnp.mean((eps - noise) ** 2)
        return text_logits, diff_loss

    def sample_latent(self, cond, rng, steps: int = 20):
        """DDIM sampling of one latent per condition row [B, D_model]."""
        B = cond.shape[0]
        z = jax.random.normal(rng, (B, self.cfg.latent_dim))
        ts = jnp.linspace(1.0, 0.0, steps + 1)

        def body(i, z):
            t_now, t_next = ts[i], ts[i + 1]
            ab_now = cosine_alpha_bar(jnp.full((B,), t_now))[..., None]
            ab_next = cosine_alpha_bar(jnp.full((B,), t_next))[..., None]
            eps = self.diffusion_head(z, jnp.full((B,), t_now), cond)
            z0 = (z - jnp.sqrt(1 - ab_now) * eps) / jnp.sqrt(ab_now)
            return jnp.sqrt(ab_next) * z0 + jnp.sqrt(1 - ab_next) * eps

        return jax.lax.fori_loop(0, steps, body, z)
