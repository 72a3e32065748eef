"""(Multimodal) GPT pretraining loop — the kosmos-2 train.py equivalent.

CLI-shim for the fairseq training stack (fairseq_cli/train.py:44-610 +
kosmos-2/unilm/tasks/gpt_base.py): checkpointable streaming corpus
(mmap binarized or raw text) -> token-block packing -> token-bucket batches
-> jitted UniGPT train step (grad accum, clipping, schedules) -> orbax
checkpoints carrying the data-stream position, with scoped metrics + JSONL
logging. Resume is bit-exact (model + optimizer + stream).

Text-only pretraining runs out of the box; image-text pretraining plugs
image features through the same batch dict (see dryrun_multichip for the
sharded multimodal step).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.data import iterators as it
from unilm_tpu.data.dictionary import Dictionary
from unilm_tpu.data.indexed_dataset import MMapIndexedDataset, TokenBlockIterator
from unilm_tpu.models.kosmos import UniGPT, UniGPTConfig
from unilm_tpu.runtime import metrics as M
from unilm_tpu.runtime.checkpoint import CheckpointManager
from unilm_tpu.runtime.logging import JsonlLogger, find_nonfinite
from unilm_tpu.runtime.optim import polynomial_decay_schedule
from unilm_tpu.ops.fused_ce import chunked_cross_entropy
from unilm_tpu.runtime.train import (TrainState, apply_with_moe_aux,
                                     cross_entropy_loss, make_train_step)

import optax


def build_vl_stream(args):
    """Grounded image-text pretraining stream (laion2b_obj_loader.py:70,314
    equivalent): jsonl shards -> grounding markup -> tiktoken ids ->
    fixed-shape multimodal rows -> checkpointable batches."""
    import glob

    from unilm_tpu.data.vl_loaders import (
        VLSampleSpec,
        VLTokenizer,
        interleaved_stream,
        laion_obj_stream,
        vl_batch_stream,
    )

    shards = sorted(glob.glob(args.vl_data))
    if not shards:
        raise FileNotFoundError(f"no shards match {args.vl_data}")
    tok = VLTokenizer(quantized_size=args.quantized_size)
    spec = VLSampleSpec(
        tokens_per_sample=args.tokens_per_sample,
        image_tokens=args.image_tokens,
        image_size=args.image_size,
        max_images=1,
    )
    maker = interleaved_stream if args.interleaved else laion_obj_stream
    samples = maker(
        shards, tok, spec, image_root=args.image_root, seed=args.seed
    )
    return vl_batch_stream(samples, args.batch_size), tok


def build_stream(args, dictionary):
    if os.path.exists(args.data + ".idx"):
        ds = MMapIndexedDataset(args.data)
        docs = list(range(len(ds)))
        src = it.InfinitePermutationSourceIterator(docs, seed=args.seed)
        doc_iter = it.MapIterator(src, lambda i: ds[i])
    else:  # raw text file: one doc per line
        with open(args.data, encoding="utf-8") as f:
            lines = [l.strip() for l in f if l.strip()]
        src = it.InfinitePermutationSourceIterator(lines, seed=args.seed)
        doc_iter = it.MapIterator(src, lambda l: dictionary.encode_line(
            l, add_if_not_exist=False))
    blocks = TokenBlockIterator(doc_iter, args.tokens_per_sample,
                                eod=dictionary.eos())
    return it.FixedBatchIterator(blocks, args.batch_size, drop_last=True)


def main(argv=None):
    p = argparse.ArgumentParser("GPT pretraining (TPU)")
    p.add_argument("--data", default="", help="mmap prefix or text file")
    p.add_argument("--dict", default="", help="fairseq dict.txt (text input)")
    # multimodal (image-text) pretraining
    p.add_argument("--vl_data", "--vl-data", dest="vl_data", default="",
                   help="glob of grounded image-text jsonl shards")
    p.add_argument("--interleaved", action="store_true",
                   help="shards are interleaved text-image documents")
    p.add_argument("--image_root", default="")
    p.add_argument("--image_tokens", type=int, default=64,
                   help="latent query count spliced per image")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--quantized_size", type=int, default=32)
    p.add_argument("--clip_dim", type=int, default=0,
                   help="override CLIP tower width (0 = ViT-L defaults)")
    p.add_argument("--save_dir", default="./gpt_ckpt")
    p.add_argument("--tokens_per_sample", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--update_freq", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup", type=int, default=375)
    p.add_argument("--clip_norm", type=float, default=2.0)
    p.add_argument("--fused_ce", action="store_true",
                   help="chunked-vocab CE (ops/fused_ce.py): no [B,T,V] "
                        "logits tensor; recommended for vocab >= 32k")
    p.add_argument("--ce_chunk", type=int, default=8192)
    p.add_argument("--save_every", type=int, default=200)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--seed", type=int, default=1)
    # arch
    p.add_argument("--dim", type=int, default=1536)
    p.add_argument("--layers", type=int, default=24)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--ffn", type=int, default=6144)
    p.add_argument("--vocab", type=int, default=0, help="override vocab size")
    p.add_argument("--moe_freq", type=int, default=0)
    p.add_argument("--moe_experts", type=int, default=0)
    p.add_argument("--moe_gate_loss_wt", type=float, default=0.01,
                   help="weight on the GShard load-balance loss "
                        "(fairseq --moe-gate-loss-wt)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--bf16", action="store_true", default=True)
    # pipeline parallelism over the flagship decoder (the reference's
    # --pipeline-model-parallel, fairseq/distributed/utils.py:153-243):
    # layers split into S stages on a 'stage' mesh axis; leftover devices
    # form an 'fsdp' axis (ZeRO-style last-dim param sharding, GSPMD-auto
    # inside each stage). Text-only, dense layers (parallel/pipeline.py
    # PipelineGPT scope notes).
    p.add_argument("--pp_stages", type=int, default=0,
                   help="pipeline stages (0 = off)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches (default: 2*stages)")
    args = p.parse_args(argv)

    multimodal = bool(args.vl_data)
    if not multimodal and not args.data:
        p.error("one of --data / --vl_data is required")

    dictionary = Dictionary.load(args.dict) if args.dict else Dictionary()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    if multimodal:
        stream, tok = build_vl_stream(args)
        vocab = args.vocab or tok.vocab_size
        from unilm_tpu.models.kosmos import ClipVisionConfig

        clip = ClipVisionConfig(img_size=args.image_size, dtype=dtype)
        if args.clip_dim:
            clip = ClipVisionConfig(
                img_size=args.image_size, embed_dim=args.clip_dim,
                num_layers=2, num_heads=max(2, args.clip_dim // 32),
                ffn_dim=args.clip_dim * 4, dtype=dtype,
            )
        cfg = UniGPTConfig(
            vocab_size=vocab, embed_dim=args.dim, num_layers=args.layers,
            num_heads=args.heads, ffn_dim=args.ffn,
            max_positions=args.tokens_per_sample + 2,
            subln=True, xpos_rel_pos=True, moe_freq=args.moe_freq,
            moe_experts=args.moe_experts, remat=args.remat, dtype=dtype,
            image_tower="clip", latent_query_num=args.image_tokens,
            clip=clip, segment_emb=True,
        )
        model = UniGPT(cfg)
        sample = next(stream)
        stream.setstate(None)  # rewind: the peeked batch came off the stream
        dummy = tuple(
            jnp.asarray(sample[k])
            for k in ("tokens", "images", "img_mask", "segs")
        )
        dummy = (dummy[0], dummy[1][:, 0], dummy[2], dummy[3])
        params = jax.jit(lambda r: model.init(r, *dummy)["params"])(
            jax.random.PRNGKey(args.seed)
        )
    else:
        vocab = args.vocab or max(len(dictionary), 260)
        cfg = UniGPTConfig(
            vocab_size=vocab, embed_dim=args.dim, num_layers=args.layers,
            num_heads=args.heads, ffn_dim=args.ffn,
            max_positions=args.tokens_per_sample + 2,
            subln=True, xpos_rel_pos=True, moe_freq=args.moe_freq,
            moe_experts=args.moe_experts, remat=args.remat, dtype=dtype,
        )
        model = UniGPT(cfg)
        stream = build_stream(args, dictionary)
        dummy = jnp.zeros((args.batch_size, args.tokens_per_sample), jnp.int32)
        params = jax.jit(lambda r: model.init(r, dummy)["params"])(
            jax.random.PRNGKey(args.seed)
        )

    pp = None
    if args.pp_stages > 1:
        assert not multimodal, "--pp_stages: text-only pretraining path"
        assert args.moe_freq == 0, "--pp_stages: dense layers only (PP scope)"
        from unilm_tpu.parallel import make_mesh
        from unilm_tpu.parallel.pipeline import PipelineGPT

        S = args.pp_stages
        n_dev = jax.device_count()
        assert n_dev % S == 0, f"{n_dev} devices not divisible by {S} stages"
        fsdp = n_dev // S
        mesh = make_mesh({"stage": S, "fsdp": fsdp} if fsdp > 1
                         else {"stage": S})
        M_pp = args.pp_microbatches or 2 * S
        pp = PipelineGPT(cfg, num_stages=S, mesh=mesh,
                         num_microbatches=M_pp, remat=args.remat,
                         fsdp_axis="fsdp" if fsdp > 1 else None)
        params = pp.from_unigpt(params)
        params = jax.device_put(params, pp.shardings(params))
        print(f"pipeline: {S} stages x {fsdp} fsdp, {M_pp} microbatches")
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"model: {n_params/1e6:.1f}M params, vocab {vocab}")

    sched = polynomial_decay_schedule(args.lr, args.max_steps, args.warmup)
    tx = optax.adamw(sched, b1=0.9, b2=0.98, weight_decay=0.01)
    state = TrainState.create(params, tx)

    def _ce(p, feats_or_logits, targets, mask):
        """Dense CE, or chunked-vocab CE from features when --fused_ce
        (ops/fused_ce.py — avoids the [B,T,V] fp32 logits tensor)."""
        if args.fused_ce:
            return chunked_cross_entropy(
                feats_or_logits, p["embed_tokens"]["embedding"],
                targets, mask=mask, chunk=args.ce_chunk)
        return cross_entropy_loss(feats_or_logits, targets, mask=mask)

    moe = args.moe_freq > 0 and args.moe_experts > 0

    def _apply(p, *a, **kw):
        """MoE models also collect the sowed gate loss (criterion adds
        moe_gate_loss * wt, fairseq moe_cross_entropy equivalent)."""
        if moe:
            return apply_with_moe_aux(model, {"params": p}, *a, **kw)
        return (model.apply({"params": p}, *a, **kw),
                jnp.zeros((), jnp.float32), {})

    if multimodal:
        def loss_fn(p, batch, rng):
            out, aux, mstats = _apply(
                p, batch["tokens"], batch["images"][:, 0],
                batch["img_mask"], batch["segs"],
                return_features=args.fused_ce,
            )
            # UniGPTLoss: CE over text positions only (unigpt.py:24-70)
            s, n = _ce(p, out[:, :-1], batch["tokens"][:, 1:],
                       batch["loss_mask"][:, 1:])
            return s / n + args.moe_gate_loss_wt * aux, {"ntok": n, **mstats}
    elif pp is not None:
        def loss_fn(p, batch, rng):
            out = (pp.features(p, batch) if args.fused_ce
                   else pp.logits(p, batch))
            s, n = _ce(p, out[:, :-1], batch[:, 1:], None)
            return s / n, {"ntok": n}
    else:
        def loss_fn(p, batch, rng):
            out, aux, mstats = _apply(p, batch, return_features=args.fused_ce)
            s, n = _ce(p, out[:, :-1], batch[:, 1:], None)
            return s / n + args.moe_gate_loss_wt * aux, {"ntok": n, **mstats}

    step_fn = jax.jit(make_train_step(
        loss_fn, tx, clip_grad_norm=args.clip_norm,
        microbatches=args.update_freq if args.update_freq > 1 else 1,
    ))

    mgr = CheckpointManager(args.save_dir, keep_last=3)
    restored = mgr.restore(jax.eval_shape(lambda: state))
    if restored:
        state, data_state, _ = restored
        if data_state:
            stream.setstate(data_state)
        print(f"resumed at step {int(state.step)}")

    logger = JsonlLogger()
    t0 = time.time()
    while int(state.step) < args.max_steps:
        blocks = next(stream)
        if multimodal:
            batch = {k: jnp.asarray(v) for k, v in blocks.items()}
            if args.update_freq > 1:
                batch = jax.tree.map(
                    lambda x: x.reshape(args.update_freq, -1, *x.shape[1:]), batch
                )
        else:
            batch = jnp.asarray(np.stack(blocks), jnp.int32)
            if args.update_freq > 1:
                batch = batch.reshape(args.update_freq, -1, batch.shape[-1])
        state, m = step_fn(state, batch, jax.random.PRNGKey(int(state.step)))
        s = int(state.step)
        loss = float(m["loss"])
        if not np.isfinite(loss):
            bad = find_nonfinite(state.params)
            raise FloatingPointError(f"non-finite loss at step {s}; params: {bad}")
        M.log_scalar("loss", loss)
        if s % args.log_every == 0:
            tok_s = (args.batch_size * args.tokens_per_sample * args.log_every
                     / (time.time() - t0))
            logger.log({"loss": loss, "ppl": float(np.exp(min(loss, 20))),
                        "gnorm": float(m["grad_norm"]), "lr": float(sched(s)),
                        "tok_s": tok_s}, s)
            t0 = time.time()
        if s % args.save_every == 0 or s >= args.max_steps:
            mgr.save(s, state, data_state=stream.getstate(),
                     metrics={"loss": loss})
    # barrier the in-flight async save BEFORE main returns: the atexit wait
    # can race interpreter shutdown (orbax schedules futures from its
    # commit thread)
    mgr.wait()
    print("done")


if __name__ == "__main__":
    main()
