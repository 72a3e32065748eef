"""BEiT/DiT fine-tuning loop: the engine_for_finetuning equivalent.

Covers beit/engine_for_finetuning.py:35-150 (mixup, grad accum, EMA) +
run_class_finetuning.py's optimizer setup (layer decay, cosine schedule,
weight-decay skip) on the pjit training engine. Data: ImageNet-style folder.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.cli.run_class_finetuning import list_image_folder, load_params
from unilm_tpu.data import iterators as it
from unilm_tpu.data.transforms import RandomResizedCropWithTwoPic, mixup_cutmix
from unilm_tpu.models import beit as beit_models
from unilm_tpu.models.beit import BeitForImageClassification
from unilm_tpu.runtime import metrics as M
from unilm_tpu.runtime.checkpoint import CheckpointManager
from unilm_tpu.runtime.logging import JsonlLogger
from unilm_tpu.runtime.optim import cosine_schedule, create_optimizer
from unilm_tpu.runtime.train import TrainState, make_train_step


def soft_cross_entropy(logits, soft_targets):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return -jnp.mean(jnp.sum(soft_targets * logp, axis=-1))


def main():
    p = argparse.ArgumentParser("BEiT/DiT fine-tuning (TPU)")
    p.add_argument("--model", default="beit_base_patch16_224")
    p.add_argument("--data_path", required=True)
    p.add_argument("--checkpoint", default="")
    p.add_argument("--output_dir", default="./out")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=4e-3)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=0.9)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--label_smoothing", type=float, default=0.1)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--drop_path", type=float, default=0.1)
    p.add_argument("--nb_classes", type=int, default=0)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", default=True)
    args = p.parse_args()

    items, classes = list_image_folder(args.data_path)
    num_classes = args.nb_classes or len(classes)
    cfg_fn = getattr(beit_models, args.model)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    cfg = cfg_fn(dtype=dtype)
    cfg = cfg.__class__(
        **{**cfg.__dict__, "num_classes": num_classes, "drop_path_rate": args.drop_path}
    )
    model = BeitForImageClassification(cfg)
    params = load_params(args, cfg, model)

    steps_per_epoch = max(len(items) // args.batch_size, 1)
    total_steps = steps_per_epoch * args.epochs
    sched = cosine_schedule(
        args.lr, total_steps, warmup_steps=steps_per_epoch * args.warmup_epochs
    )
    tx = create_optimizer(
        params, sched, weight_decay=args.weight_decay,
        layer_decay=args.layer_decay, num_layers=cfg.num_layers,
    )
    state = TrainState.create(params, tx, ema=args.ema_decay > 0)

    def loss_fn(p, batch, rng):
        imgs, soft = mixup_cutmix(
            rng, batch["x"], batch["y"], num_classes,
            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            label_smoothing=args.label_smoothing,
        ) if args.mixup > 0 else (batch["x"], jax.nn.one_hot(batch["y"], num_classes))
        logits = model.apply({"params": p}, imgs.astype(dtype), deterministic=False,
                             rngs={"dropout": rng})
        return soft_cross_entropy(logits, soft), {}

    step_fn = jax.jit(make_train_step(loss_fn, tx, ema_decay=args.ema_decay,
                                      clip_grad_norm=args.clip_grad))

    mgr = CheckpointManager(args.output_dir, keep_last=3)
    logger = JsonlLogger()
    crop = RandomResizedCropWithTwoPic(cfg.img_size)
    from PIL import Image

    stream = it.FixedBatchIterator(
        it.InfinitePermutationSourceIterator(list(range(len(items))), seed=args.seed),
        args.batch_size, drop_last=True,
    )
    # resume
    restored = mgr.restore(jax.eval_shape(lambda: state))
    if restored:
        state, data_state, _ = restored
        if data_state:
            stream.setstate(data_state)
        print(f"resumed at step {int(state.step)}")

    rng = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    while int(state.step) < total_steps:
        idxs = next(stream)
        imgs = np.stack([crop(Image.open(items[i][0]).convert("RGB")) for i in idxs])
        labels = np.asarray([items[i][1] for i in idxs])
        rng, r = jax.random.split(rng)
        state, m = step_fn(state, {"x": jnp.asarray(imgs), "y": jnp.asarray(labels)}, r)
        s = int(state.step)
        M.log_scalar("loss", float(m["loss"]))
        if s % 50 == 0:
            logger.log({"loss": float(m["loss"]),
                        "gnorm": float(m["grad_norm"]),
                        "lr": float(sched(s)),
                        "img_s": args.batch_size * 50 / (time.time() - t0)}, s)
            t0 = time.time()
        if s % args.save_every == 0:
            mgr.save(s, state, data_state=stream.getstate(),
                     metrics={"loss": float(m["loss"])})
    mgr.save(int(state.step), state, data_state=stream.getstate())


if __name__ == "__main__":
    main()
