"""TextDiffuser: text-rendering diffusion with character-mask conditioning.

Capability-equivalent of textdiffuser/ (train.py + inference.py): a latent
diffusion model whose UNet is conditioned on a CHARACTER SEGMENTATION MASK
(per-pixel character-class map rendered from the target text layout) so
generated images contain legible text. The reference fine-tunes a Stable
Diffusion UNet2DConditionModel with 17 input channels (latent + mask
features, train.py:506); this is a compact from-scratch NHWC flax UNet
with the same interfaces:

- character layout -> [H, W] int mask (`render_char_mask`)
- mask embedded as channels and concatenated to the noisy latent
- epsilon-prediction DDPM training loss + DDIM sampling (schedule shared
  with models/latentlm.py's cosine alpha-bar)

No pretrained SD weights are loadable offline; the architecture is sized
to train standalone on rendered-text data.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.models.latentlm import cosine_alpha_bar, timestep_embedding


def _gn(channels: int) -> nn.GroupNorm:
    import math

    return nn.GroupNorm(num_groups=math.gcd(channels, 32) or 1)


# --------------------------------------------------------------------------- #
# Character layout mask (the reference's segmentation-mask conditioning)
# --------------------------------------------------------------------------- #

DEFAULT_CHARSET = " abcdefghijklmnopqrstuvwxyz0123456789"


def render_char_mask(
    text_boxes: Sequence[Tuple[str, Tuple[int, int, int, int]]],
    img_size: int,
    charset: str = DEFAULT_CHARSET,
) -> np.ndarray:
    """[(text, (x0, y0, x1, y1)), ...] -> [H, W] int mask: 0 = background,
    c+1 = charset index of the character occupying that column slice of the
    box (each character gets an equal horizontal slice — the reference
    renders per-character polygons; slices are the axis-aligned analog)."""
    mask = np.zeros((img_size, img_size), np.int32)
    c2i = {c: i for i, c in enumerate(charset)}
    for text, (x0, y0, x1, y1) in text_boxes:
        text = text.lower()
        n = max(len(text), 1)
        w = (x1 - x0) / n
        for i, ch in enumerate(text):
            if ch not in c2i:
                continue
            cx0 = int(x0 + i * w)
            cx1 = max(int(x0 + (i + 1) * w), cx0 + 1)
            mask[y0:y1, cx0:cx1] = c2i[ch] + 1
    return mask


# --------------------------------------------------------------------------- #
# Compact conditional UNet
# --------------------------------------------------------------------------- #

@dataclasses.dataclass(frozen=True)
class TextDiffuserConfig:
    img_size: int = 64
    in_channels: int = 3          # pixel space (or VAE latent channels)
    base_channels: int = 64
    channel_mults: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 1
    charset_size: int = len(DEFAULT_CHARSET) + 1  # + background
    mask_channels: int = 8        # character-mask embedding channels
    time_dim: int = 128
    timesteps: int = 1000
    dtype: Any = jnp.float32


class ResBlock(nn.Module):
    channels: int
    time_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = _gn(x.shape[-1])(x)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(
            jax.nn.silu(h)
        )
        h = h + nn.Dense(self.channels, dtype=self.dtype)(
            jax.nn.silu(temb)
        )[:, None, None, :]
        h = _gn(self.channels)(h)
        h = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype)(
            jax.nn.silu(h)
        )
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype)(x)
        return x + h


class TextDiffuserUNet(nn.Module):
    cfg: TextDiffuserConfig

    @nn.compact
    def __call__(self, z_noisy, t, char_mask):
        """z_noisy [B,H,W,C], t [B] int, char_mask [B,H,W] int -> eps pred."""
        cfg = self.cfg
        temb = nn.Dense(cfg.time_dim)(
            timestep_embedding(t.astype(jnp.float32), cfg.time_dim)
        )
        temb = nn.Dense(cfg.time_dim)(jax.nn.silu(temb))

        memb = nn.Embed(cfg.charset_size, cfg.mask_channels, name="mask_embed")(
            char_mask
        ).astype(z_noisy.dtype)
        x = jnp.concatenate([z_noisy, memb], axis=-1)
        x = nn.Conv(cfg.base_channels, (3, 3), padding="SAME", name="stem")(x)

        skips = []
        for li, mult in enumerate(cfg.channel_mults):
            ch = cfg.base_channels * mult
            for _ in range(cfg.num_res_blocks):
                x = ResBlock(ch, cfg.time_dim, cfg.dtype)(x, temb)
            skips.append(x)
            if li < len(cfg.channel_mults) - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME")(x)
        x = ResBlock(x.shape[-1], cfg.time_dim, cfg.dtype)(x, temb)
        for li, mult in reversed(list(enumerate(cfg.channel_mults))):
            ch = cfg.base_channels * mult
            x = jnp.concatenate([x, skips[li]], axis=-1)
            for _ in range(cfg.num_res_blocks):
                x = ResBlock(ch, cfg.time_dim, cfg.dtype)(x, temb)
            if li > 0:
                B, Hh, Ww, C = x.shape
                x = jax.image.resize(x, (B, Hh * 2, Ww * 2, C), "nearest")
                x = nn.Conv(ch, (3, 3), padding="SAME")(x)
        x = _gn(x.shape[-1])(x)
        return nn.Conv(cfg.in_channels, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros, name="out")(
            jax.nn.silu(x)
        )


# --------------------------------------------------------------------------- #
# Training loss + DDIM sampling
# --------------------------------------------------------------------------- #

def diffusion_loss(
    model: TextDiffuserUNet, params, images, char_mask, rng,
    cfg: TextDiffuserConfig,
):
    """Epsilon-prediction MSE at uniformly sampled timesteps (DDPM)."""
    B = images.shape[0]
    r_t, r_e = jax.random.split(rng)
    t = jax.random.randint(r_t, (B,), 0, cfg.timesteps)
    eps = jax.random.normal(r_e, images.shape, images.dtype)
    ab = cosine_alpha_bar(t.astype(jnp.float32) / cfg.timesteps)
    ab = ab[:, None, None, None]
    z_noisy = jnp.sqrt(ab) * images + jnp.sqrt(1.0 - ab) * eps
    pred = model.apply({"params": params}, z_noisy, t, char_mask)
    loss = jnp.mean((pred - eps) ** 2)
    return loss, {"mse": loss}


def ddim_sample(
    model: TextDiffuserUNet, params, char_mask, rng,
    cfg: TextDiffuserConfig, steps: int = 20, shape=None,
):
    """Deterministic DDIM from pure noise, conditioned on the char mask."""
    B = char_mask.shape[0]
    shape = shape or (B, cfg.img_size, cfg.img_size, cfg.in_channels)
    z = jax.random.normal(rng, shape)
    ts = jnp.linspace(cfg.timesteps - 1, 0, steps).astype(jnp.int32)

    def body(i, z):
        t = ts[i]
        t_next = jnp.where(i + 1 < steps, ts[jnp.minimum(i + 1, steps - 1)], 0)
        ab = cosine_alpha_bar(t.astype(jnp.float32) / cfg.timesteps)
        ab_next = jnp.where(
            i + 1 < steps,
            cosine_alpha_bar(t_next.astype(jnp.float32) / cfg.timesteps),
            1.0,
        )
        eps = model.apply(
            {"params": params}, z, jnp.full((B,), t), char_mask
        )
        x0 = (z - jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(ab)
        return jnp.sqrt(ab_next) * x0 + jnp.sqrt(1.0 - ab_next) * eps

    return jax.lax.fori_loop(0, steps, body, z)
