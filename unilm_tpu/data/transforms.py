"""Image preprocessing: numpy/PIL host pipeline (no torchvision).

Equivalents of:
- beit/datasets.py build_transform (eval: resize+center-crop+normalize;
  train: RandomResizedCrop + flip)
- beit/transforms.py RandomResizedCropAndInterpolationWithTwoPic (two-view
  pretraining transform: patch image + visual-token image)
- timm Mixup/CutMix (beit/engine_for_finetuning.py mixup_fn) as a jax fn
- HF Pix2StructImageProcessor patch extraction (kosmos-2.5 inference.py:187:
  variable-resolution 16x16 patches + row/col ids, max_patches budget)
"""

from __future__ import annotations

import math
import random
from typing import Optional, Tuple

import numpy as np

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)


def _pil():
    from PIL import Image

    return Image


_INTERP = {"bilinear": 2, "bicubic": 3, "lanczos": 1, "nearest": 0}


def resize(img, size: Tuple[int, int], interpolation: str = "bicubic"):
    """img: PIL.Image -> PIL.Image resized to (h, w)."""
    Image = _pil()
    return img.resize((size[1], size[0]), _INTERP[interpolation])


def center_crop(img, size: Tuple[int, int]):
    w, h = img.size
    th, tw = size
    top = max(0, (h - th) // 2)
    left = max(0, (w - tw) // 2)
    return img.crop((left, top, left + tw, top + th))


def to_numpy(img) -> np.ndarray:
    """PIL -> float32 [H, W, 3] in [0, 1]."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr


def normalize(arr: np.ndarray, mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD):
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def eval_transform(
    img,
    input_size: int = 224,
    crop_pct: Optional[float] = None,
    interpolation: str = "bicubic",
    mean=IMAGENET_DEFAULT_MEAN,
    std=IMAGENET_DEFAULT_STD,
) -> np.ndarray:
    """beit/datasets.py:76-91 eval path: resize shorter side by crop_pct then
    center crop. Returns [H, W, 3] float32 NHWC (TPU layout)."""
    if crop_pct is None:
        crop_pct = 224 / 256 if input_size <= 224 else 1.0
    scale_size = int(math.floor(input_size / crop_pct))
    w, h = img.size
    if w < h:
        ow = scale_size
        oh = int(scale_size * h / w)
    else:
        oh = scale_size
        ow = int(scale_size * w / h)
    img = resize(img, (oh, ow), interpolation)
    img = center_crop(img, (input_size, input_size))
    return normalize(to_numpy(img), mean, std)


class RandomResizedCropWithTwoPic:
    """beit/transforms.py:67 — one random crop rendered at two resolutions
    (patch image for the encoder + smaller image for the visual tokenizer)."""

    def __init__(
        self,
        size: int,
        second_size: Optional[int] = None,
        scale=(0.08, 1.0),
        ratio=(3.0 / 4.0, 4.0 / 3.0),
        interpolation: str = "bicubic",
        second_interpolation: str = "lanczos",
        rng: Optional[random.Random] = None,
    ):
        self.size = size
        self.second_size = second_size
        self.scale = scale
        self.ratio = ratio
        self.interpolation = interpolation
        self.second_interpolation = second_interpolation
        self.rng = rng or random.Random()

    def get_params(self, img):
        w, h = img.size
        area = h * w
        for _ in range(10):
            target_area = self.rng.uniform(*self.scale) * area
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(self.rng.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = self.rng.randint(0, w - cw)
                top = self.rng.randint(0, h - ch)
                return top, left, ch, cw
        # fallback: center crop
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            ch, cw = h, int(round(h * self.ratio[1]))
        else:
            cw, ch = w, h
        return (h - ch) // 2, (w - cw) // 2, ch, cw

    def __call__(self, img):
        top, left, ch, cw = self.get_params(img)
        crop = img.crop((left, top, left + cw, top + ch))
        first = resize(crop, (self.size, self.size), self.interpolation)
        if self.second_size is None:
            return to_numpy(first)
        second = resize(crop, (self.second_size, self.second_size), self.second_interpolation)
        return to_numpy(first), to_numpy(second)


def random_hflip(img, rng: random.Random, arr2=None, p: float = 0.5):
    if rng.random() < p:
        Image = _pil()
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    return img


def mixup_cutmix(
    rng_key,
    images,  # jax [B, H, W, C]
    labels,  # int [B]
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
):
    """timm-style batch Mixup/CutMix (beit engine mixup_fn) as a pure jax fn.
    Returns (mixed_images, soft_labels)."""
    import jax
    import jax.numpy as jnp

    B, H, W, C = images.shape
    k1, k2, k3, k4 = jax.random.split(rng_key, 4)
    perm = jnp.flip(jnp.arange(B))  # timm pairs i with B-1-i
    use_cutmix = jax.random.bernoulli(k1, switch_prob)
    lam_mix = jax.random.beta(k2, mixup_alpha, mixup_alpha)
    lam_cut = jax.random.beta(k3, cutmix_alpha, cutmix_alpha)

    def do_mixup(_):
        lam = lam_mix
        mixed = images * lam + images[perm] * (1 - lam)
        return mixed, lam

    def do_cutmix(_):
        lam = lam_cut
        cut_rat = jnp.sqrt(1.0 - lam)
        ch, cw = (H * cut_rat).astype(jnp.int32), (W * cut_rat).astype(jnp.int32)
        cy = jax.random.randint(k4, (), 0, H)
        cx = jax.random.randint(k4, (), 0, W)
        y0 = jnp.clip(cy - ch // 2, 0, H)
        y1 = jnp.clip(cy + ch // 2, 0, H)
        x0 = jnp.clip(cx - cw // 2, 0, W)
        x1 = jnp.clip(cx + cw // 2, 0, W)
        yy = jnp.arange(H)[None, :, None, None]
        xx = jnp.arange(W)[None, None, :, None]
        box = (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)
        mixed = jnp.where(box, images[perm], images)
        lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (H * W)
        return mixed, lam_adj

    mixed, lam = jax.lax.cond(use_cutmix, do_cutmix, do_mixup, None)
    off = label_smoothing / num_classes
    on = 1.0 - label_smoothing + off
    y1h = jax.nn.one_hot(labels, num_classes) * (on - off) + off
    y2h = jax.nn.one_hot(labels[perm], num_classes) * (on - off) + off
    soft = y1h * lam + y2h * (1.0 - lam)
    return mixed, soft


def pix2struct_patches(
    image: np.ndarray,  # [H, W, 3] float in [0, 1]
    max_patches: int = 4096,
    patch_size: int = 16,
) -> np.ndarray:
    """HF Pix2StructImageProcessor.extract_flattened_patches equivalent
    (kosmos-2.5 inference.py:187 uses max_patches=4096):

    1. per-image standardization (mean 0, std 1)
    2. scale so rows*cols <= max_patches with aspect preserved
    3. extract 16x16 patches, prepend (row+1, col+1), zero-pad to max_patches

    Returns [max_patches, 2 + 3*patch_size**2] float32."""
    h, w = image.shape[:2]
    x = image.astype(np.float32)
    x = (x - x.mean()) / max(float(x.std()), 1e-6)

    scale = math.sqrt(max_patches * (patch_size / h) * (patch_size / w))
    nrows = max(min(int(math.floor(scale * h / patch_size)), max_patches), 1)
    ncols = max(min(int(math.floor(scale * w / patch_size)), max_patches), 1)
    while nrows * ncols > max_patches:
        if nrows >= ncols:
            nrows -= 1
        else:
            ncols -= 1
    rh, rw = nrows * patch_size, ncols * patch_size

    # bilinear resize via PIL on the standardized array (channel-wise scale-safe)
    Image = _pil()
    lo, hi = x.min(), x.max()
    denom = max(hi - lo, 1e-6)
    img8 = Image.fromarray(np.uint8(255 * (x - lo) / denom))
    img8 = img8.resize((rw, rh), 2)
    xr = np.asarray(img8, np.float32) / 255.0 * denom + lo

    patches = xr.reshape(nrows, patch_size, ncols, patch_size, 3)
    patches = patches.transpose(0, 2, 1, 3, 4).reshape(nrows * ncols, -1)
    rows = np.repeat(np.arange(nrows), ncols) + 1
    cols = np.tile(np.arange(ncols), nrows) + 1
    out = np.zeros((max_patches, 2 + patches.shape[1]), np.float32)
    out[: nrows * ncols, 0] = rows
    out[: nrows * ncols, 1] = cols
    out[: nrows * ncols, 2:] = patches
    return out
