"""BEiT/DiT image classification: eval + fine-tune.

CLI-shim equivalent of beit/run_class_finetuning.py (args :37, eval path
:217+560, train loop engine_for_finetuning.py:35) and
dit/classification/run_class_finetuning.py. Data: an ImageNet-style folder
(class subdirectories) or RVL-CDIP folder for DiT.

Example:
    python -m unilm_tpu.cli.run_class_finetuning \
        --model beit_base_patch16_224 --data_path /data/imagenet/val \
        --checkpoint beit_base.pt --eval --batch_size 64
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.data.transforms import eval_transform
from unilm_tpu.models import beit as beit_models
from unilm_tpu.models.beit import BeitForImageClassification
from unilm_tpu.runtime import metrics as M
from unilm_tpu.runtime.logging import JsonlLogger
from unilm_tpu.scoring import accuracy_topk

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp"}


def list_image_folder(root: str):
    """(path, class_id) pairs from class-subdir layout (beit/datasets.py:93)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    items = []
    for ci, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for fn in sorted(os.listdir(cdir)):
            if os.path.splitext(fn)[1].lower() in IMG_EXTS:
                items.append((os.path.join(cdir, fn), ci))
    return items, classes


def load_params(args, cfg, model):
    if args.checkpoint:
        import torch

        from unilm_tpu.convert.beit import convert_beit

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        for key in ("model", "module", "state_dict"):
            if isinstance(sd, dict) and key in sd:
                sd = sd[key]
        return convert_beit(sd, cfg)
    dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), cfg.dtype)
    return model.init(jax.random.PRNGKey(0), dummy)["params"]


def evaluate(args):
    cfg_fn = getattr(beit_models, args.model)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = cfg_fn(dtype=dtype)
    if args.nb_classes:
        cfg = cfg.__class__(**{**cfg.__dict__, "num_classes": args.nb_classes})
    model = BeitForImageClassification(cfg)
    params = load_params(args, cfg, model)

    items, classes = list_image_folder(args.data_path)
    if args.max_samples:
        items = items[: args.max_samples]
    print(f"eval on {len(items)} images, {len(classes)} classes")

    from PIL import Image

    apply = jax.jit(lambda p, x: model.apply(p, x))
    logger = JsonlLogger(args.log_file) if args.log_file else None
    B = args.batch_size
    all_logits, all_labels = [], []
    t0 = time.time()
    for i in range(0, len(items), B):
        chunk = items[i : i + B]
        imgs = np.stack(
            [eval_transform(Image.open(p), cfg.img_size, crop_pct=args.crop_pct)
             for p, _ in chunk]
        )
        labels = np.asarray([c for _, c in chunk])
        if len(chunk) < B:  # pad final batch for static shapes
            pad = B - len(chunk)
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        logits = np.asarray(apply({"params": params}, jnp.asarray(imgs, dtype))[: len(chunk)])
        all_logits.append(logits.astype(np.float32))
        all_labels.append(labels)
    dt = time.time() - t0
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    acc = accuracy_topk(logits, labels)
    stats = {**acc, "images_per_sec": len(items) / dt}
    print(f"* Acc@1 {acc['acc1']:.3f} Acc@5 {acc['acc5']:.3f} "
          f"({len(items) / dt:.1f} img/s)")
    if logger:
        logger.log(stats, 0, tag="eval")
    return stats


def main():
    p = argparse.ArgumentParser("BEiT/DiT classification (TPU)")
    p.add_argument("--model", default="beit_base_patch16_224")
    p.add_argument("--data_path", required=True)
    p.add_argument("--checkpoint", default="", help="torch .pt (timm or HF format)")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--nb_classes", type=int, default=0)
    p.add_argument("--crop_pct", type=float, default=None)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--max_samples", type=int, default=0)
    p.add_argument("--log_file", default="")
    args = p.parse_args()
    if not args.eval:
        raise SystemExit("training entry: use unilm_tpu.cli.train_classification")
    evaluate(args)


if __name__ == "__main__":
    main()
