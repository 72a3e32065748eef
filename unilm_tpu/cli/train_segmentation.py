"""Semantic segmentation fine-tune + mIoU eval (BEiT UperNet on ADE20K).

CLI-shim equivalent of beit/semantic_segmentation tools/train.sh +
mmseg eval: jitted UperNet(+FCN aux) train step, confusion-matrix mIoU.
ADE20K layout: --image-dir images/validation --ann-dir annotations/validation
(annotation pngs, reduce_zero_label). --synthetic runs on generated blob
fixtures end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unilm_tpu.models.beit import BeitConfig
from unilm_tpu.models.segmentation import (
    BeitForSemanticSegmentation,
    UperNetConfig,
    segmentation_loss,
)
from unilm_tpu.runtime.train import TrainState, make_train_step
from unilm_tpu.scoring_segmentation import evaluate_segmentation, reduce_zero_label


def synthetic_seg_dataset(n, img_size=64, num_classes=4, seed=0):
    """Blob fixtures: class = quadrant-dependent colored rectangle."""
    rng = np.random.RandomState(seed)
    images, labels = [], []
    for _ in range(n):
        img = np.full((img_size, img_size, 3), 0.1, np.float32)
        lab = np.zeros((img_size, img_size), np.int64)
        for c in range(1, num_classes):
            w = rng.randint(img_size // 4, img_size // 2)
            h = rng.randint(img_size // 4, img_size // 2)
            x0 = rng.randint(0, img_size - w)
            y0 = rng.randint(0, img_size - h)
            img[y0:y0 + h, x0:x0 + w] = c / num_classes
            lab[y0:y0 + h, x0:x0 + w] = c
        images.append(img)
        labels.append(lab)
    return images, labels


def load_ade20k(image_dir, ann_dir, img_size):
    from PIL import Image

    images, labels = [], []
    for name in sorted(os.listdir(image_dir)):
        base = os.path.splitext(name)[0]
        ann = os.path.join(ann_dir, base + ".png")
        if not os.path.exists(ann):
            continue
        img = Image.open(os.path.join(image_dir, name)).convert("RGB")
        lab = Image.open(ann)
        images.append(
            np.asarray(img.resize((img_size, img_size)), np.float32) / 255.0
        )
        raw = np.asarray(lab.resize((img_size, img_size), resample=0))
        labels.append(reduce_zero_label(raw))
    return images, labels


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image-dir")
    p.add_argument("--ann-dir")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=32)
    p.add_argument("--num-classes", type=int, default=4)
    p.add_argument("--img-size", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    kw = dict(img_size=args.img_size, use_mean_pooling=False)
    if args.tiny:
        kw.update(embed_dim=64, num_layers=4, num_heads=4, ffn_dim=128)
    beit = BeitConfig(**kw)
    cfg = UperNetConfig(
        beit=beit, num_classes=args.num_classes,
        out_indices=tuple(
            min(i, beit.num_layers - 1) for i in (
                (0, 1, 2, 3) if args.tiny else (3, 5, 7, 11))
        ),
        channels=64 if args.tiny else 512,
        aux_channels=32 if args.tiny else 256,
    )
    model = BeitForSemanticSegmentation(cfg)

    if args.synthetic:
        tr_imgs, tr_labs = synthetic_seg_dataset(
            args.synthetic_n, args.img_size, args.num_classes, args.seed
        )
        va_imgs, va_labs = synthetic_seg_dataset(
            max(8, args.synthetic_n // 4), args.img_size, args.num_classes,
            args.seed + 1,
        )
    else:
        tr_imgs, tr_labs = load_ade20k(args.image_dir, args.ann_dir, args.img_size)
        va_imgs, va_labs = tr_imgs, tr_labs

    B = args.batch_size
    sample = jnp.asarray(np.stack(tr_imgs[:B]))
    params = jax.jit(
        lambda r: model.init(r, sample, return_aux=True)["params"]
    )(jax.random.PRNGKey(args.seed))

    tx = optax.adamw(args.lr)

    def loss_fn(params, batch, rng):
        logits, aux = model.apply(
            {"params": params}, batch["images"], return_aux=True
        )
        return segmentation_loss(
            logits, batch["labels"], aux, aux_weight=cfg.aux_loss_weight
        )

    step = jax.jit(make_train_step(loss_fn, tx, clip_grad_norm=1.0))
    state = TrainState.create(params, tx)

    rng = np.random.RandomState(args.seed)
    for i in range(args.steps):
        idx = rng.randint(0, len(tr_imgs), B)
        batch = {
            "images": jnp.asarray(np.stack([tr_imgs[j] for j in idx])),
            "labels": jnp.asarray(np.stack([tr_labs[j] for j in idx])),
        }
        state, m = step(state, batch, jax.random.PRNGKey(i))
        if i % 20 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(m['loss']):.4f}")

    if args.eval:
        infer = jax.jit(lambda p, x: jnp.argmax(
            model.apply({"params": p}, x), axis=-1))
        preds = []
        for j in range(0, len(va_imgs), B):
            chunk = va_imgs[j:j + B]
            pad = B - len(chunk)
            x = jnp.asarray(np.stack(chunk + chunk[:1] * pad))
            pr = np.asarray(infer(state.params, x))
            preds.extend(pr[: len(chunk)])
        res = evaluate_segmentation(preds, va_labs, args.num_classes)
        print(json.dumps({k: round(v, 4) for k, v in res.items()}))
        return state, res
    return state, None


if __name__ == "__main__":
    main()
