"""Detection fine-tuning + COCO-mAP eval CLI (DiT / LayoutLMv3 detection).

Capability-equivalent of dit/object_detection/train_net.py + ditod
MyTrainer (mytrainer.py:329: AMP + grad-accum detectron2 loop, periodic
COCO eval). TPU-first: one jitted FCOS train step over static-shape
batches, eval via the jitted static-topk/NMS decode + host-side numpy
COCO AP (scoring_detection.py).

  python -m unilm_tpu.cli.train_detection --synthetic --steps 200 --eval
  python -m unilm_tpu.cli.train_detection --train-json coco.json \
      --image-root imgs/ --num-classes 5 --preset dit
  # two-stage Cascade R-CNN head (reference parity; loads published
  # detectron2 DiT checkpoints via convert/detection.py):
  python -m unilm_tpu.cli.train_detection --head rcnn --checkpoint dit_cascade.pth \
      --val-json publaynet_val.json --image-root imgs/ --num-classes 5 --eval --steps 0
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unilm_tpu.data.detection import (
    batches,
    load_coco_json,
    pad_batch,
    synthetic_detection_dataset,
)
from unilm_tpu.models.detection_head import (
    FCOSDetector,
    decode_detections,
    dit_base_detection,
    fcos_loss,
    layoutlmv3_base_detection,
)
from unilm_tpu.runtime.train import TrainState, make_train_step
from unilm_tpu.scoring_detection import evaluate_detections


def build_config(args):
    preset = dit_base_detection if args.preset == "dit" else layoutlmv3_base_detection
    kw = {}
    if args.tiny:  # test/smoke configuration
        kw = dict(embed_dim=64, num_layers=2, num_heads=4, ffn_dim=128)
    cfg = preset(img_size=args.img_size, num_classes=args.num_classes, **kw)
    if args.tiny:
        cfg = type(cfg)(**{**cfg.__dict__, "tower_convs": 1, "tower_channels": 32})
    return cfg


def build_rcnn(args):
    from unilm_tpu.models.rcnn import CascadeRCNN, RCNNConfig, cascade_dit_base
    from unilm_tpu.models.beit import BeitConfig

    if args.tiny:
        beit = BeitConfig(
            img_size=args.img_size, patch_size=16, embed_dim=32, num_layers=4,
            num_heads=2, ffn_dim=64, use_abs_pos_emb=True,
            use_rel_pos_bias=False, use_mean_pooling=False, num_classes=0)
        cfg = RCNNConfig(
            beit=beit, out_indices=(0, 1, 2, 3), fpn_channels=16,
            num_classes=args.num_classes, rpn_pre_nms_topk=64,
            rpn_post_nms_topk=32, fc_dim=32, detections_per_image=16)
    else:
        cfg = cascade_dit_base(img_size=args.img_size,
                               num_classes=args.num_classes)
    return cfg, CascadeRCNN(cfg)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--preset", choices=["dit", "layoutlmv3"], default="dit")
    p.add_argument("--head", choices=["fcos", "rcnn"], default="fcos",
                   help="fcos = TPU-first single-stage; rcnn = reference-"
                        "parity Cascade/Mask R-CNN (models/rcnn.py)")
    p.add_argument("--checkpoint",
                   help="detectron2 .pth to convert (rcnn head only)")
    p.add_argument("--train-json")
    p.add_argument("--val-json")
    p.add_argument("--image-root", default="")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=3)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-boxes", type=int, default=64)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--eval-protocol", default="coco",
                   choices=["coco", "icdar_table", "funsd_text"],
                   help="extra protocol metrics next to COCO mAP: ICDAR-19 "
                        "cTDaR wF1 (dit table detection) or FUNSD "
                        "text-detection DetEval P/R/hmean")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.head == "rcnn":
        cfg, model = build_rcnn(args)
    else:
        cfg = build_config(args)
        model = FCOSDetector(cfg)

    if args.synthetic:
        train_data = synthetic_detection_dataset(
            args.synthetic_n, img_size=args.img_size,
            num_classes=args.num_classes, seed=args.seed,
        )
        val_data = synthetic_detection_dataset(
            max(8, args.synthetic_n // 4), img_size=args.img_size,
            num_classes=args.num_classes, seed=args.seed + 1,
        )
    else:
        train_data = load_coco_json(
            args.train_json, args.image_root, img_size=args.img_size
        )
        val_data = (
            load_coco_json(args.val_json, args.image_root, img_size=args.img_size)
            if args.val_json else train_data
        )

    sample = pad_batch(train_data[: args.batch_size], args.max_boxes)
    if args.head == "rcnn" and args.checkpoint:
        import torch

        from unilm_tpu.convert.detection import convert_rcnn

        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
        params = jax.tree.map(jnp.asarray, convert_rcnn(sd, cfg))
        print(f"loaded detectron2 checkpoint {args.checkpoint}")
    else:
        params = jax.jit(model.init)(
            jax.random.PRNGKey(args.seed), jnp.asarray(sample["images"])
        )["params"]

    tx = optax.adamw(args.lr)

    if args.head == "rcnn":
        from unilm_tpu.models.rcnn import rcnn_loss

        def loss_fn(params, batch, rng):
            return rcnn_loss(model, params, batch["images"], batch["boxes"],
                             batch["labels"], batch["valid"], rng)
    else:
        def loss_fn(params, batch, rng):
            out = model.apply({"params": params}, batch["images"])
            loss, metrics = fcos_loss(
                out, batch["boxes"], batch["labels"], batch["valid"], cfg
            )
            return loss, metrics

    step = jax.jit(make_train_step(loss_fn, tx, clip_grad_norm=1.0))
    state = TrainState.create(params, tx)

    it, epoch = None, 0
    for i in range(args.steps):
        if it is None:
            it = batches(
                train_data, args.batch_size, max_boxes=args.max_boxes,
                shuffle=True, seed=args.seed + epoch,
            )
            epoch += 1
        try:
            batch = next(it)
        except StopIteration:
            it = None
            continue
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, jbatch, jax.random.PRNGKey(i))
        if i % 20 == 0 or i == args.steps - 1:
            extra = " ".join(
                f"{k} {float(v):.4f}" for k, v in sorted(metrics.items())
                if k not in ("loss", "grad_norm"))
            print(f"step {i}: loss {float(metrics['loss']):.4f} {extra}")

    if args.eval:
        result = evaluate(model, state.params, val_data, args,
                          head=args.head)
        print(json.dumps({k: round(v, 4) for k, v in result.items()}))
    return state


def evaluate(model, params, val_data, args, head="fcos"):
    if head == "rcnn":
        @jax.jit
        def infer(params, images):
            out = model.apply({"params": params}, images)
            return out["boxes"], out["scores"], out["classes"], out["valid"]
    else:
        @jax.jit
        def infer(params, images):
            out = model.apply({"params": params}, images)
            return decode_detections(out, img_size=float(args.img_size))

    preds, gts = [], []
    for batch in batches(
        val_data, args.batch_size, max_boxes=args.max_boxes, drop_last=False
    ):
        boxes, scores, labels, valid = infer(params, jnp.asarray(batch["images"]))
        boxes, scores, labels, valid = map(np.asarray, (boxes, scores, labels, valid))
        for i in range(len(boxes)):
            m = valid[i]
            preds.append(
                {"boxes": boxes[i][m], "scores": scores[i][m], "labels": labels[i][m]}
            )
            gm = batch["valid"][i]
            gts.append(
                {"boxes": batch["boxes"][i][gm], "labels": batch["labels"][i][gm]}
            )
    metrics = evaluate_detections(preds, gts, args.num_classes)
    if getattr(args, "eval_protocol", "coco") == "icdar_table":
        # ICDAR-19 cTDaR wF1 (dit/README.md:79-99): score-desc box lists
        from unilm_tpu.scoring_detection import evaluate_icdar_table_detection

        metrics.update(evaluate_icdar_table_detection(
            [p["boxes"][np.argsort(-p["scores"], kind="stable")]
             for p in preds],
            [g["boxes"] for g in gts]))
    elif getattr(args, "eval_protocol", "coco") == "funsd_text":
        from unilm_tpu.scoring_detection import evaluate_text_detection

        metrics.update(evaluate_text_detection(preds, gts))
    return metrics


if __name__ == "__main__":
    main()
