"""Training-step MFU benchmark on the real chip (VERDICT round-2 item #1).

Measures the framework's OTHER half — the pretraining hot path the reference
runs through fairseq Trainer.train_step (kosmos-2/fairseq/fairseq/trainer.py:782,
flagship workload kosmos-2/train.sh:1-52): full fwd + bwd + optimizer update,
on-chip, with activation remat and the Pallas flash backward on the hot path.

Workloads:
  gpt1p3b  — the 1.3B UniGPT decoder (kosmos-2 text path: E=2048, L=24, H=32,
             ffn=8192, V=65037) at T=2048 bf16, remat, xPos, tied embeddings.
             Microbatch grad accumulation (update_freq, trainer.py:803) keeps
             the 65k-vocab fp32 logits off the peak-memory path.
  beit_b   — BEiT-B fine-tune step at 224^2 (engine_for_finetuning.py:35):
             mixup-style soft targets, AdamW, bf16 compute / fp32 params.

MFU convention (PaLM appendix B): model FLOPs = 6*N_mm*tokens
+ 12*L*E*T*tokens, where N_mm counts matmul parameters only (embedding
lookups excluded, tied output projection counted once). Remat recompute is
NOT counted as useful FLOPs — it shows up as lower MFU, as it should.

The axon tunnel adds ~30 ms per synced host call; steps are timed
back-to-back with one trailing block_until_ready and the per-step dispatch
overhead is amortized over --steps.
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# v5e (TPU v5 lite): 197 TFLOP/s bf16 peak per chip
PEAK_BF16 = {"v5e": 197e12, "v5litepod": 197e12, "v5 lite": 197e12,
             "v4": 275e12, "v5p": 459e12, "v6e": 918e12}


def detect_peak() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_BF16.items():
        if k in kind:
            return v
    return 197e12


def count_matmul_params(params) -> int:
    """Matmul parameters: every >=2D kernel (embedding tables excluded by
    name; the tied output projection is added back by the caller)."""
    n = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = "/".join(getattr(p, "key", str(p)) for p in path)
        if leaf.ndim >= 2 and "embed" not in keys and "embedding" not in keys:
            n += leaf.size
    return n


def transformer_train_flops(n_mm: int, tokens: int, L: int, E: int, T: int) -> float:
    return 6.0 * n_mm * tokens + 12.0 * L * E * T * tokens


TUNNEL_S = 0.030  # axon host<->chip round-trip constant (see kosmos_ttft.py)


def make_multi_step(step_fn, inner, donate=True):
    """lax.scan `inner` train steps inside ONE jitted program: amortizes the
    tunnel round-trip AND defeats async-dispatch timing artifacts — the
    scalar fetch of the last loss can't complete before every step ran."""
    from functools import partial

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def multi(state, batch, rng):
        def body(carry, r):
            st, _ = carry
            st, m = step_fn(st, batch, r)
            return (st, m["loss"]), None
        (state, last_loss), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), jax.random.split(rng, inner))
        return state, last_loss

    return multi


def time_multi(multi, state, batch, rng, inner, reps):
    state, loss = multi(state, batch, rng)  # compile + warmup
    f = float(loss)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, loss = multi(state, batch, rng)
        f = float(loss)  # scalar D2H fetch = hard sync
        times.append((time.perf_counter() - t0 - TUNNEL_S) / inner)
    return statistics.median(times), times, f


def fwd_bwd_breakdown(loss_fn, state, batch, rng, args, extra=()):
    """Time fwd-only and fwd+bwd (plus any `extra` named phases) with the
    same scan harness as the full step, so the fwd/bwd/optimizer split of
    a workload is measurable on-chip.

    loss_fn(params, batch, rng) -> (scalar, aux). `extra` entries are
    (name, fn) with the step_fn signature fn(state, batch, rng) ->
    (state, {"loss": scalar}).
    """

    def fwd_only(st, b, r):
        l, _ = loss_fn(st.params, b, r)
        return st, {"loss": l}

    def fwd_bwd(st, b, r):
        (l, _), g = jax.value_and_grad(
            lambda p: loss_fn(p, b, r), has_aux=True)(st.params)
        # fold the grads into the loss so XLA cannot DCE the backward
        leaves = jax.tree.leaves(g)
        probe = sum(jnp.sum(x[..., :1, :1].astype(jnp.float32))
                    for x in leaves if x.ndim >= 2)
        return st, {"loss": l + 0.0 * probe}

    parts = {}
    for name, fn in list(extra) + [("fwd", fwd_only), ("fwd+bwd", fwd_bwd)]:
        m = make_multi_step(fn, args.inner, donate=False)
        med_p, _, _ = time_multi(m, state, batch, rng, args.inner, args.steps)
        parts[name] = round(med_p * 1e3, 1)
        print(f"  {name}: {parts[name]} ms", flush=True)
    return parts


def bench_gpt(args):
    from unilm_tpu.models.kosmos import UniGPT, UniGPTConfig
    from unilm_tpu.runtime.train import TrainState, cross_entropy_loss, make_train_step
    import optax

    T, mb, acc = args.seq, args.micro_batch, args.accum
    kw = dict(dtype=jnp.bfloat16, use_flash=not args.no_flash,
              remat=not args.no_remat, remat_policy=args.remat_policy,
              param_dtype=(jnp.bfloat16 if args.param_dtype == "bf16"
                           else jnp.float32),
              scan_layers=getattr(args, "scan", False),
              image_tower=None, max_positions=max(T + 2, 2050))
    if args.tiny:  # CPU smoke config (harness check, not a measurement)
        kw.update(embed_dim=64, num_layers=2, num_heads=4, ffn_dim=128,
                  vocab_size=512)
    cfg = UniGPTConfig(**kw)
    model = UniGPT(cfg)
    tokens = jnp.ones((mb, T), jnp.int32)

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)["params"]
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    n_mm = count_matmul_params(params) + cfg.vocab_size * cfg.embed_dim
    print(f"init: {time.time()-t0:.1f}s  params={n_params/1e9:.2f}B "
          f"(matmul {n_mm/1e9:.2f}B)", flush=True)

    # Adafactor: the 1.3B Adam fp32 state (21 GB) exceeds one v5e's HBM —
    # multi-chip training shards it (fsdp axis, parallel/sharding.py); the
    # single-chip measurement uses fairseq's other first-class optimizer
    # (fairseq/optim/adafactor.py) whose factored state fits.
    tx = optax.adafactor(1e-4) if args.optimizer == "adafactor" else \
        optax.adamw(1e-4, b1=0.9, b2=0.98, weight_decay=0.01)

    if args.fused_ce:
        from unilm_tpu.ops.fused_ce import chunked_cross_entropy

        def loss_fn(p, batch, rng):
            feats = model.apply({"params": p}, batch["tokens"],
                                deterministic=True, return_features=True)
            loss, denom = chunked_cross_entropy(
                feats[:, :-1], p["embed_tokens"]["embedding"],
                batch["tokens"][:, 1:],
                mask=jnp.ones_like(batch["tokens"][:, 1:], jnp.float32),
                chunk=args.ce_chunk)
            return loss / denom, {"ntok": denom}
    else:
        def loss_fn(p, batch, rng):
            logits = model.apply({"params": p}, batch["tokens"], deterministic=True)
            loss, denom = cross_entropy_loss(
                logits[:, :-1], batch["tokens"][:, 1:],
                mask=jnp.ones_like(batch["tokens"][:, 1:], jnp.float32))
            return loss / denom, {"ntok": denom}

    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0, microbatches=acc)
    rng = jax.random.PRNGKey(1)
    state = jax.jit(lambda p: TrainState.create(p, tx), donate_argnums=(0,))(params)
    jax.block_until_ready(state.opt_state)

    data = np.random.RandomState(0).randint(3, cfg.vocab_size - 1, size=(acc, mb, T))
    batch = {"tokens": jnp.asarray(data if acc > 1 else data[0], jnp.int32)}

    if args.breakdown:
        # fwd/bwd split per micro-batch (the full step adds accumulation
        # + optimizer on top).
        mb_batch = {"tokens": batch["tokens"][0] if acc > 1 else batch["tokens"]}
        parts = fwd_bwd_breakdown(loss_fn, state, mb_batch, rng, args)

    multi = make_multi_step(step_fn, args.inner)
    t0 = time.time()
    med, times, loss = time_multi(multi, state, batch, rng, args.inner, args.steps)
    print(f"compile+measure: {time.time()-t0:.1f}s", flush=True)
    tokens_step = mb * acc * (T - 1)
    flops = transformer_train_flops(n_mm, mb * acc * T, cfg.num_layers,
                                    cfg.embed_dim, T)
    peak = detect_peak()
    mfu = flops / med / peak
    return {
        "workload": "gpt1p3b_train", "batch": mb * acc, "seq": T,
        "microbatches": acc, "optimizer": args.optimizer,
        "flash": not args.no_flash, "fused_ce": args.fused_ce,
        **({"breakdown_ms_per_microbatch": parts} if args.breakdown else {}),
        "step_ms": round(med * 1e3, 1),
        "tokens_per_s": round(tokens_step / med),
        "model_tflops_per_s": round(flops / med / 1e12, 1),
        "mfu": round(mfu, 3), "loss": round(loss, 3),
        "times_ms": [round(t * 1e3, 1) for t in sorted(times)],
    }


def bench_kosmos(args):
    """Kosmos-2 grounded image-text pretrain step (the flagship workload,
    kosmos-2/train.sh:1-52 + laion obj task): CLIP ViT-L/14 tower -> latent
    -query resampler -> 64-feature splice into the 1.3B decoder, CE over the
    text positions only (UniGPTLoss loss_mask, unigpt.py:24-70)."""
    import optax

    from unilm_tpu.models.kosmos import UniGPT, kosmos2
    from unilm_tpu.ops.fused_ce import chunked_cross_entropy
    from unilm_tpu.runtime.train import TrainState, make_train_step

    T, mb, acc = args.seq, args.micro_batch, args.accum
    pdt = jnp.bfloat16 if args.param_dtype == "bf16" else jnp.float32
    kw = dict(dtype=jnp.bfloat16, param_dtype=pdt,
              use_flash=not args.no_flash,
              remat=not args.no_remat, remat_policy=args.remat_policy,
              max_positions=max(T + 2, 2050))
    if args.tiny:  # CPU smoke config
        from unilm_tpu.models.kosmos import ClipVisionConfig
        kw.update(embed_dim=64, num_layers=2, num_heads=4, ffn_dim=128,
                  vocab_size=512, latent_query_num=8,
                  clip=ClipVisionConfig(img_size=28, patch_size=14,
                                        embed_dim=32, num_layers=2,
                                        num_heads=2, ffn_dim=64,
                                        dtype=jnp.bfloat16))
    cfg = kosmos2(**kw)
    model = UniGPT(cfg)
    Q = cfg.latent_query_num
    P = (cfg.clip.img_size // cfg.clip.patch_size) ** 2 + 1  # 257 (ViT-L/14)

    tokens = jnp.ones((mb, T), jnp.int32)
    images = jnp.ones((mb, cfg.clip.img_size, cfg.clip.img_size, 3), jnp.bfloat16)
    # <s> <image> [64 placeholders] </image> caption... (train.sh:43-44 grid vocab)
    img_mask = (jnp.arange(T)[None, :] >= 2) & (jnp.arange(T)[None, :] < 2 + Q)
    img_mask = jnp.broadcast_to(img_mask, (mb, T))

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens, images,
                                 img_mask)["params"]
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    # component-wise model FLOPs: decoder over T, tower over P, resampler
    # over Q queries x P kv
    n_mm_dec = (count_matmul_params(params["decoder"])
                + cfg.vocab_size * cfg.embed_dim)  # tied output projection
    n_mm_img = count_matmul_params(params["img_model"])
    n_mm_conn = count_matmul_params(params["img_connector"])
    print(f"init: {time.time()-t0:.1f}s  params={n_params/1e9:.2f}B "
          f"(decoder mm {n_mm_dec/1e9:.2f}B, tower mm {n_mm_img/1e6:.0f}M)",
          flush=True)

    tx = optax.adafactor(1e-4) if args.optimizer == "adafactor" else \
        optax.adamw(1e-4, b1=0.9, b2=0.98, weight_decay=0.01)

    def loss_fn(p, batch, rng):
        feats = model.apply({"params": p}, batch["tokens"], batch["images"],
                            batch["img_mask"], deterministic=True,
                            return_features=True)
        loss, denom = chunked_cross_entropy(
            feats[:, :-1], p["embed_tokens"]["embedding"],
            batch["tokens"][:, 1:],
            mask=batch["loss_mask"][:, 1:], chunk=args.ce_chunk)
        return loss / jnp.maximum(denom, 1.0), {"ntok": denom}

    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0, microbatches=acc)
    state = jax.jit(lambda p: TrainState.create(p, tx), donate_argnums=(0,))(params)
    jax.block_until_ready(state.opt_state)

    r = np.random.RandomState(0)
    tok = np.asarray(r.randint(3, cfg.vocab_size - 1, size=(acc, mb, T)), np.int32)
    lm = np.broadcast_to(~np.asarray(img_mask), (acc, mb, T)).astype(np.float32)
    imgs = np.asarray(r.rand(acc, mb, cfg.clip.img_size, cfg.clip.img_size, 3))

    def lead(x):
        return jnp.asarray(x if acc > 1 else x[0])

    batch = {"tokens": lead(tok),
             "images": lead(imgs).astype(jnp.bfloat16),
             "img_mask": lead(np.broadcast_to(np.asarray(img_mask),
                                              (acc, mb, T))),
             "loss_mask": lead(lm)}

    multi = make_multi_step(step_fn, args.inner)
    t0 = time.time()
    rng = jax.random.PRNGKey(3)
    med, times, loss = time_multi(multi, state, batch, rng, args.inner, args.steps)
    print(f"compile+measure: {time.time()-t0:.1f}s", flush=True)

    n_seq = mb * acc
    flops = (
        transformer_train_flops(n_mm_dec, n_seq * T, cfg.num_layers,
                                cfg.embed_dim, T)
        + transformer_train_flops(n_mm_img, n_seq * P, cfg.clip.num_layers,
                                  cfg.clip.embed_dim, P)
        # resampler: Q queries attending to P kv (approximate the attention
        # term with the kv length)
        + transformer_train_flops(n_mm_conn, n_seq * Q, 1, cfg.embed_dim, P)
    )
    peak = detect_peak()
    return {
        "workload": "kosmos2_pretrain", "batch": n_seq, "seq": T,
        "image_tokens": Q, "tower_patches": P,
        "microbatches": acc, "optimizer": args.optimizer,
        "step_ms": round(med * 1e3, 1),
        "tokens_per_s": round(n_seq * (T - 1) / med),
        "images_per_s": round(n_seq / med),
        "model_tflops_per_s": round(flops / med / 1e12, 1),
        "mfu": round(flops / med / peak, 3), "loss": round(loss, 3),
        "times_ms": [round(t * 1e3, 1) for t in sorted(times)],
    }


def bench_beit(args):
    import optax

    from unilm_tpu.models.beit import BeitForImageClassification, beit_base_patch16_224
    from unilm_tpu.runtime.train import TrainState, make_train_step

    cfg = beit_base_patch16_224(num_classes=1000, dtype=jnp.bfloat16,
                                drop_path_rate=0.1,
                                remat=not args.no_remat and args.batch > 512,
                                remat_policy=args.remat_policy)
    model = BeitForImageClassification(cfg)
    B = args.batch
    imgs = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
    t0 = time.time()
    params = jax.jit(lambda r: model.init(r, imgs, True))(
        jax.random.PRNGKey(0))["params"]
    jax.block_until_ready(params)
    n_mm = count_matmul_params(params)
    print(f"init: {time.time()-t0:.1f}s  params="
          f"{sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M", flush=True)

    tx = optax.adamw(1e-3, weight_decay=0.05)

    def loss_fn(p, batch, rng):
        logits = model.apply({"params": p}, batch["x"], False,
                             rngs={"dropout": rng})
        # mixup produces soft targets (engine_for_finetuning.py:54)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        loss = -jnp.mean(jnp.sum(batch["y"] * logp, axis=-1))
        return loss, {}

    step_fn = make_train_step(loss_fn, tx, ema_decay=0.9999,
                              clip_grad_norm=3.0)
    state = jax.jit(lambda p: TrainState.create(p, tx, ema=True),
                    donate_argnums=(0,))(params)
    rng0 = np.random.RandomState(0)
    x = jnp.asarray(rng0.rand(B, 224, 224, 3), jnp.bfloat16)
    y = jax.nn.one_hot(jnp.asarray(rng0.randint(0, 1000, B)), 1000)
    batch = {"x": x, "y": y}
    rng = jax.random.PRNGKey(2)

    multi = make_multi_step(step_fn, args.inner)
    t0 = time.time()
    med, times, loss = time_multi(multi, state, batch, rng, args.inner, args.steps)
    print(f"compile+measure: {time.time()-t0:.1f}s", flush=True)
    T = (224 // 16) ** 2 + 1
    tokens = B * T
    flops = transformer_train_flops(n_mm, tokens, cfg.num_layers,
                                    cfg.embed_dim, T)
    peak = detect_peak()
    return {
        "workload": "beit_b_finetune", "batch": B, "seq": T,
        "step_ms": round(med * 1e3, 1),
        "images_per_s": round(B / med),
        "model_tflops_per_s": round(flops / med / 1e12, 1),
        "mfu": round(flops / med / peak, 3), "loss": round(loss, 3),
        "times_ms": [round(t * 1e3, 1) for t in sorted(times)],
    }


def bench_beit_pretrain(args):
    """BEiT-B masked-image-modeling pretrain step (beit/run_beit_pretraining.py +
    engine_for_pretraining.py:22): mask-token substitution at ~40% blockwise-
    masked patches, CE over the 8192-entry visual codebook at masked positions."""
    import optax

    from unilm_tpu.data.masking import MaskingGenerator
    from unilm_tpu.models.beit import BeitForMaskedImageModeling, beit_base_patch16_224
    from unilm_tpu.runtime.train import TrainState, cross_entropy_loss, make_train_step

    B = args.batch
    cfg = beit_base_patch16_224(dtype=jnp.bfloat16, drop_path_rate=0.1,
                                use_shared_rel_pos_bias=True,
                                use_rel_pos_bias=False,
                                remat=not args.no_remat and B > 512,
                                remat_policy=args.remat_policy)
    model = BeitForMaskedImageModeling(cfg)
    n_patch = (cfg.img_size // cfg.patch_size) ** 2
    gen = MaskingGenerator((14, 14), num_masking_patches=75,
                           rng=np.random.default_rng(0))
    rng0 = np.random.RandomState(0)
    masks = np.stack([gen().reshape(-1) for _ in range(B)]).astype(bool)
    imgs = jnp.asarray(rng0.rand(B, 224, 224, 3), jnp.bfloat16)
    bool_masked = jnp.asarray(masks)
    targets = jnp.asarray(rng0.randint(0, cfg.vocab_size, (B, n_patch)), jnp.int32)

    t0 = time.time()
    params = jax.jit(lambda r: model.init(r, imgs, bool_masked, True))(
        jax.random.PRNGKey(0))["params"]
    jax.block_until_ready(params)
    n_mm = count_matmul_params(params)
    print(f"init: {time.time()-t0:.1f}s  params="
          f"{sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M", flush=True)

    tx = optax.adamw(1.5e-3, b1=0.9, b2=0.98, weight_decay=0.05)

    def loss_fn(p, batch, rng):
        logits = model.apply({"params": p}, batch["x"], batch["mask"], False,
                             rngs={"dropout": rng})
        loss, denom = cross_entropy_loss(
            logits, batch["y"], mask=batch["mask"].astype(jnp.float32))
        return loss / denom, {}

    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=3.0)
    state = jax.jit(lambda p: TrainState.create(p, tx), donate_argnums=(0,))(params)
    batch = {"x": imgs, "mask": bool_masked, "y": targets}
    rng = jax.random.PRNGKey(2)
    multi = make_multi_step(step_fn, args.inner)
    t0 = time.time()
    med, times, loss = time_multi(multi, state, batch, rng, args.inner, args.steps)
    print(f"compile+measure: {time.time()-t0:.1f}s", flush=True)
    T = n_patch + 1
    flops = transformer_train_flops(n_mm, B * T, cfg.num_layers, cfg.embed_dim, T)
    peak = detect_peak()
    return {
        "workload": "beit_b_pretrain", "batch": B, "seq": T,
        "masked_patches": 75,
        "step_ms": round(med * 1e3, 1),
        "images_per_s": round(B / med),
        "model_tflops_per_s": round(flops / med / 1e12, 1),
        "mfu": round(flops / med / peak, 3), "loss": round(loss, 3),
        "times_ms": [round(t * 1e3, 1) for t in sorted(times)],
    }


def bench_layoutlmv3(args):
    """LayoutLMv3-B FUNSD token-classification fine-tune step
    (layoutlmv3/examples/run_funsd_cord.py:455 via HF Trainer): text T=512 +
    2D bbox embeddings + 197 visual patches through the fused encoder with
    1D/2D bucketed relative bias, CE over BIO labels."""
    import optax

    from unilm_tpu.models.layoutlmv3 import (LayoutLMv3ForTokenClassification,
                                             layoutlmv3_base)
    from unilm_tpu.runtime.train import TrainState, cross_entropy_loss, make_train_step

    B, T = args.batch, 512
    bias_mode = getattr(args, "bias_mode", "fused")
    cfg = layoutlmv3_base(dtype=jnp.bfloat16, num_labels=7,
                          remat=not args.no_remat and B > 32,
                          remat_policy=args.remat_policy,
                          fused_bias=bias_mode == "fused",
                          has_relative_attention_bias=bias_mode != "none",
                          has_spatial_attention_bias=bias_mode != "none")
    model = LayoutLMv3ForTokenClassification(cfg)
    rng0 = np.random.RandomState(0)
    ids = jnp.asarray(rng0.randint(3, cfg.vocab_size - 1, (B, T)), jnp.int32)
    xy = rng0.randint(0, 900, (B, T, 2, 2))
    xy.sort(axis=2)
    bbox = jnp.asarray(xy.transpose(0, 1, 3, 2).reshape(B, T, 4), jnp.int32)
    imgs = jnp.asarray(rng0.rand(B, 224, 224, 3), jnp.bfloat16)
    labels = jnp.asarray(rng0.randint(0, 7, (B, T)), jnp.int32)

    t0 = time.time()
    params = jax.jit(lambda r: model.init(r, ids, bbox, None, imgs))(
        jax.random.PRNGKey(0))["params"]
    jax.block_until_ready(params)
    n_mm = count_matmul_params(params)
    print(f"init: {time.time()-t0:.1f}s  params="
          f"{sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M", flush=True)

    tx = optax.adamw(1e-5, weight_decay=0.01)

    def loss_fn(p, batch, rng):
        logits = model.apply({"params": p}, batch["ids"], batch["bbox"], None,
                             batch["imgs"], deterministic=False,
                             rngs={"dropout": rng})
        loss, denom = cross_entropy_loss(logits, batch["y"])
        return loss / denom, {}

    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0)
    state = jax.jit(lambda p: TrainState.create(p, tx), donate_argnums=(0,))(params)
    batch = {"ids": ids, "bbox": bbox, "imgs": imgs, "y": labels}
    rng = jax.random.PRNGKey(2)
    parts = None
    if args.breakdown and bias_mode == "none":
        parts = fwd_bwd_breakdown(loss_fn, state, batch, rng, args)
    elif args.breakdown:
        # "bias" phase: the [B, H, 709, 709] 1D+2D bucketed relative bias
        # alone (models/layoutlmv3.relative_attention_bias), so its share of
        # the step is measurable against the fwd/bwd phases it feeds.
        from unilm_tpu.models.layoutlmv3 import (relative_attention_bias,
                                                 visual_bbox_grid)

        def bias_only(st, b, r):
            mp = st.params["layoutlmv3"]
            Bb, Tt = b["ids"].shape
            pos1d = jnp.broadcast_to(jnp.arange(Tt)[None], (Bb, Tt))
            vpos = jnp.broadcast_to(jnp.arange(cfg.visual_len)[None],
                                    (Bb, cfg.visual_len))
            vb = jnp.asarray(visual_bbox_grid(cfg.visual_grid))
            full_bbox = jnp.concatenate(
                [b["bbox"], jnp.broadcast_to(vb[None], (Bb,) + vb.shape)], 1)
            bias = relative_attention_bias(
                cfg, mp["rel_pos_bias"], mp["rel_pos_x_bias"],
                mp["rel_pos_y_bias"],
                jnp.concatenate([pos1d, vpos], axis=1), full_bbox,
                visual_len=cfg.visual_len)
            probe = jnp.sum(bias[..., :1, :1].astype(jnp.float32))
            return st, {"loss": 0.0 * probe}

        parts = fwd_bwd_breakdown(loss_fn, state, batch, rng, args,
                                  extra=[("bias", bias_only)])
    multi = make_multi_step(step_fn, args.inner)
    t0 = time.time()
    med, times, loss = time_multi(multi, state, batch, rng, args.inner, args.steps)
    print(f"compile+measure: {time.time()-t0:.1f}s", flush=True)
    S = T + cfg.visual_len  # full fused sequence (text + cls + patches)
    flops = transformer_train_flops(n_mm, B * S, cfg.num_layers, cfg.hidden_size, S)
    peak = detect_peak()
    return {
        "workload": "layoutlmv3_funsd", "batch": B, "seq": S,
        **({"breakdown_ms": parts} if parts else {}),
        "step_ms": round(med * 1e3, 1),
        "docs_per_s": round(B / med),
        "model_tflops_per_s": round(flops / med / 1e12, 1),
        "mfu": round(flops / med / peak, 3), "loss": round(loss, 3),
        "times_ms": [round(t * 1e3, 1) for t in sorted(times)],
    }


def bench_trocr(args):
    """TrOCR-base OCR train step (fairseq-train text_recognition, trocr/task.py):
    DeiT-base 384^2 encoder + RoBERTa-large-dim decoder, teacher-forced CE over
    a 50k vocab at T=128 target tokens."""
    import optax

    from unilm_tpu.models.trocr import TrOCRModel, trocr_base
    from unilm_tpu.runtime.train import TrainState, cross_entropy_loss, make_train_step

    B, T = args.batch, 128
    cfg = trocr_base(dtype=jnp.bfloat16)
    model = TrOCRModel(cfg)
    rng0 = np.random.RandomState(0)
    imgs = jnp.asarray(rng0.rand(B, cfg.img_size, cfg.img_size, 3), jnp.bfloat16)
    tok = jnp.asarray(rng0.randint(3, cfg.vocab_size - 1, (B, T + 1)), jnp.int32)

    t0 = time.time()
    params = jax.jit(lambda r: model.init(r, imgs, tok[:, :-1]))(
        jax.random.PRNGKey(0))["params"]
    jax.block_until_ready(params)
    n_mm = count_matmul_params(params)
    n_mm_enc = count_matmul_params(params["vit"])
    n_mm_dec = n_mm - n_mm_enc
    print(f"init: {time.time()-t0:.1f}s  params="
          f"{sum(x.size for x in jax.tree.leaves(params))/1e6:.1f}M", flush=True)

    tx = optax.adamw(2e-5, weight_decay=0.01)

    if args.fused_ce:
        # Chunked-vocab CE from pre-logit features: the [B, T, 50k] logits
        # tensor (and its gradient) never materializes; the vocab matmul is
        # fused into the loss chunk-by-chunk (ops/fused_ce.py). trocr-base
        # does not tie embeddings, so the output_projection kernel [E, V]
        # is the (transposed) "embedding" the chunked kernel contracts with.
        from unilm_tpu.ops.fused_ce import chunked_cross_entropy

        def loss_fn(p, batch, rng):
            feats = model.apply({"params": p}, batch["imgs"],
                                batch["tok"][:, :-1], deterministic=True,
                                return_features=True)
            dec = p["text_decoder"]
            if "output_projection" in dec:
                w = dec["output_projection"]["kernel"].T  # [V, E]
            else:  # share_input_output_embed: tied decoder, no projection
                w = dec["embed_tokens"]["embedding"]
            loss, denom = chunked_cross_entropy(
                feats, w, batch["tok"][:, 1:],
                chunk=args.ce_chunk, label_smoothing=0.1)
            return loss / denom, {}
    else:
        def loss_fn(p, batch, rng):
            logits = model.apply({"params": p}, batch["imgs"],
                                 batch["tok"][:, :-1], deterministic=True)
            loss, denom = cross_entropy_loss(logits, batch["tok"][:, 1:],
                                             label_smoothing=0.1)
            return loss / denom, {}

    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0)
    state = jax.jit(lambda p: TrainState.create(p, tx), donate_argnums=(0,))(params)
    batch = {"imgs": imgs, "tok": tok}
    rng = jax.random.PRNGKey(2)
    parts = None
    if args.breakdown:
        parts = fwd_bwd_breakdown(loss_fn, state, batch, rng, args)
    multi = make_multi_step(step_fn, args.inner)
    t0 = time.time()
    med, times, loss = time_multi(multi, state, batch, rng, args.inner, args.steps)
    print(f"compile+measure: {time.time()-t0:.1f}s", flush=True)
    P = (cfg.img_size // cfg.patch_size) ** 2 + cfg.num_prefix_tokens  # 578
    # encoder self-attn over P; decoder self-attn over T + cross-attn to P
    flops = (
        transformer_train_flops(n_mm_enc, B * P, cfg.enc_layers, cfg.enc_dim, P)
        + transformer_train_flops(n_mm_dec, B * T, cfg.dec_layers, cfg.dec_dim, T)
        + 12.0 * cfg.dec_layers * cfg.dec_dim * P * (B * T)  # cross-attention
    )
    peak = detect_peak()
    return {
        "workload": "trocr_base_train", "batch": B,
        "enc_patches": P, "dec_seq": T, "fused_ce": args.fused_ce,
        **({"breakdown_ms": parts} if parts else {}),
        "step_ms": round(med * 1e3, 1),
        "lines_per_s": round(B / med),
        "model_tflops_per_s": round(flops / med / 1e12, 1),
        "mfu": round(flops / med / peak, 3), "loss": round(loss, 3),
        "times_ms": [round(t * 1e3, 1) for t in sorted(times)],
    }


def bench_moe(args):
    """X-MoE decoder pretrain step (kosmos xmoe arches: torchscale
    moe_layer.py + routing.py, fairseq --moe-gate-loss-wt): GPT trunk with
    every 2nd layer an 8-expert top-2 X-MoE (capacity 2.0, xMoE low-dim
    cosine routing), chunked-vocab CE + weighted gate loss.

    MFU convention for MoE: expert FLOPs count the capacity slots each
    expert actually processes (6 * expert_params * C per group); the GShard
    dispatch/combine einsums are overhead — they depress MFU, as they
    should (the reference times its all_to_all the same way,
    moe_layer.py:332-360). Pass --moe_breakdown for the on-chip
    gating/dispatch/expert/combine split of one MoE layer."""
    import optax

    from unilm_tpu.models.kosmos import UniGPT, UniGPTConfig
    from unilm_tpu.ops.fused_ce import chunked_cross_entropy
    from unilm_tpu.runtime.train import (TrainState, apply_with_moe_aux,
                                         make_train_step)

    T, mb, acc = args.seq, args.micro_batch, args.accum
    kw = dict(dtype=jnp.bfloat16, use_flash=not args.no_flash,
              remat=not args.no_remat, remat_policy=args.remat_policy,
              param_dtype=(jnp.bfloat16 if args.param_dtype == "bf16"
                           else jnp.float32),
              num_layers=12,  # 2.2B total; 24 dense-eq layers OOM one v5e
              moe_freq=2, moe_experts=args.moe_experts, moe_top=2,
              moe_capacity_factor=2.0, moe_gate_dim=128,
              moe_second_expert_policy="all",
              image_tower=None, max_positions=max(T + 2, 2050))
    if args.tiny:
        kw.update(embed_dim=64, num_layers=2, num_heads=4, ffn_dim=128,
                  vocab_size=512, moe_experts=2, moe_gate_dim=16)
    cfg = UniGPTConfig(**kw)
    model = UniGPT(cfg)
    tokens = jnp.ones((mb, T), jnp.int32)

    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)["params"]
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    n_mm_exp = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = "/".join(getattr(p, "key", str(p)) for p in path)
        if leaf.ndim >= 2 and "experts" in keys:
            n_mm_exp += leaf.size
    n_mm_dense = (count_matmul_params(params) - n_mm_exp
                  + cfg.vocab_size * cfg.embed_dim)
    E_exp = cfg.moe_experts
    # MoELayer: C = ceil(S*cf/E) rounded up to 8 (core/moe.py)
    import math as _math
    cap = max(int(_math.ceil(T * 2.0 / E_exp)), 4)
    cap = min(-(-cap // 8) * 8, T)
    print(f"init: {time.time()-t0:.1f}s  params={n_params/1e9:.2f}B "
          f"(expert mm {n_mm_exp/1e9:.2f}B, dense mm {n_mm_dense/1e9:.2f}B, "
          f"capacity {cap})", flush=True)

    tx = optax.adafactor(1e-4) if args.optimizer == "adafactor" else \
        optax.adamw(1e-4, b1=0.9, b2=0.98, weight_decay=0.01)

    def loss_fn(p, batch, rng):
        feats, aux, mstats = apply_with_moe_aux(
            model, {"params": p}, batch["tokens"],
            deterministic=False, rngs={"dropout": rng},
            return_features=True)
        loss, denom = chunked_cross_entropy(
            feats[:, :-1], p["embed_tokens"]["embedding"],
            batch["tokens"][:, 1:],
            mask=jnp.ones_like(batch["tokens"][:, 1:], jnp.float32),
            chunk=args.ce_chunk)
        return loss / denom + 0.01 * aux, {"ntok": denom, **mstats}

    step_fn = make_train_step(loss_fn, tx, clip_grad_norm=1.0, microbatches=acc)
    state = jax.jit(lambda p: TrainState.create(p, tx), donate_argnums=(0,))(params)
    jax.block_until_ready(state.opt_state)
    data = np.random.RandomState(0).randint(3, cfg.vocab_size - 1, size=(acc, mb, T))
    batch = {"tokens": jnp.asarray(data if acc > 1 else data[0], jnp.int32)}
    rng = jax.random.PRNGKey(1)

    parts = {}
    if args.moe_breakdown:
        parts = moe_layer_breakdown(cfg.decoder_cfg(), mb, T, args)

    multi = make_multi_step(step_fn, args.inner)
    t0 = time.time()
    med, times, loss = time_multi(multi, state, batch, rng, args.inner, args.steps)
    print(f"compile+measure: {time.time()-t0:.1f}s", flush=True)
    tokens_step = mb * acc * (T - 1)
    n_moe_layers = cfg.num_layers // cfg.moe_freq
    # expert FLOPs: every expert processes `cap` slots per group and there
    # are mb*acc groups, so sum over moe layers of
    # 6 * (2*M*F per expert) * (E*cap*groups) = 6 * n_mm_exp * cap * groups.
    flops = (
        transformer_train_flops(n_mm_dense, mb * acc * T, cfg.num_layers,
                                cfg.embed_dim, T)
        + 6.0 * n_mm_exp * cap * mb * acc
    )
    peak = detect_peak()
    return {
        "workload": "xmoe_train", "batch": mb * acc, "seq": T,
        "experts": E_exp, "capacity": cap, "moe_layers": n_moe_layers,
        "microbatches": acc, "optimizer": args.optimizer,
        "step_ms": round(med * 1e3, 1),
        "tokens_per_s": round(tokens_step / med),
        "model_tflops_per_s": round(flops / med / 1e12, 1),
        "mfu": round(flops / med / peak, 3), "loss": round(loss, 3),
        **({"layer_breakdown_ms": parts} if parts else {}),
        "times_ms": [round(t * 1e3, 1) for t in sorted(times)],
    }


def moe_layer_breakdown(tcfg, mb, T, args):
    """On-chip fwd+bwd timing of ONE MoE layer's components at the bench
    shape: full layer, gating-only, dispatch einsum, expert FFN, combine
    einsum. The reference's equivalent is the all_to_all timing stats in
    moe_layer.py:332-360."""
    import dataclasses as _dc
    from functools import partial

    from unilm_tpu.core.layers import FeedForward
    from unilm_tpu.core.moe import MoELayer, _top2_gating

    M = tcfg.embed_dim
    E = tcfg.moe_experts
    cap = max(int(np.ceil(T * tcfg.moe_capacity_factor / E)), 4)
    cap = min(-(-cap // 8) * 8, T)
    x = jnp.asarray(np.random.RandomState(0).randn(mb, T, M), jnp.bfloat16)

    layer = MoELayer(tcfg)
    lp = layer.init(jax.random.PRNGKey(0), x)["params"]

    def t_loss(fn, *operands):
        """median ms of one fwd+bwd of fn, `inner` reps scanned in one jit
        (the scan carry feeds the grad-norm back into the next rep's input
        scale so XLA cannot hoist the body out of the loop). Params must be
        passed as operands, not closed over — closure arrays embed as HLO
        constants and blow past the axon remote-compile request limit."""
        g = jax.grad(lambda ops, s: jnp.sum(fn(*jax.tree.map(
            lambda o: o * (1.0 + 1e-20 * s).astype(o.dtype), ops)) ** 2))

        @jax.jit
        def many(ops):
            def body(c, _):
                gr = g(ops, c)
                s = sum(jnp.sum(l.astype(jnp.float32) ** 2)
                        for l in jax.tree.leaves(gr))
                return c + 1e-20 * s, None
            out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=args.inner)
            return out

        float(many(operands))  # compile+warm
        ts = []
        for _ in range(max(args.steps, 4)):
            t0 = time.perf_counter()
            float(many(operands))
            ts.append((time.perf_counter() - t0 - TUNNEL_S) / args.inner)
        return statistics.median(ts) * 1e3

    full = t_loss(lambda lp_, xx: layer.apply({"params": lp_}, xx)[0], lp, x)

    # gating only: fp32 logits -> combine/dispatch tensors
    def gate_only(xx):
        logits = jnp.einsum("gsm,me->gse", xx.astype(jnp.float32),
                            jnp.ones((M, E), jnp.float32) * 1e-3)
        c, d, aux = _top2_gating(logits, cap, True, None, "all")
        return c.sum() + d.astype(jnp.float32).sum() + aux

    gating = t_loss(gate_only, x)

    # dispatch einsum only (fixed mask)
    disp_mask = jnp.zeros((mb, T, E, cap), jnp.bfloat16).at[:, :, 0, 0].set(1)
    dispatch = t_loss(
        lambda m_, xx: jnp.einsum("gsec,gsm->egcm", m_, xx), disp_mask, x)

    # expert FFN only on pre-dispatched input
    ecfg = _dc.replace(tcfg, quant_weights=False)
    import flax.linen as nn
    expert_ffn = nn.vmap(FeedForward, in_axes=(0, None), out_axes=0,
                         variable_axes={"params": 0},
                         split_rngs={"params": True, "dropout": True},
                         )(ecfg)
    ein = jnp.asarray(np.random.RandomState(1).randn(E, mb * cap, M),
                      jnp.bfloat16)
    ep = expert_ffn.init(jax.random.PRNGKey(1), ein, True)["params"]
    experts = t_loss(
        lambda ep_, xx: expert_ffn.apply({"params": ep_}, xx, True), ep, ein)

    # combine einsum only
    comb = jnp.zeros((mb, T, E, cap), jnp.bfloat16).at[:, :, 0, 0].set(0.7)
    eout = jnp.asarray(np.random.RandomState(2).randn(E, mb, cap, M),
                       jnp.bfloat16)
    combine = t_loss(
        lambda c_, eo: jnp.einsum("gsec,egcm->gsm", c_, eo), comb, eout)

    parts = {"full_layer": round(full, 2), "gating": round(gating, 2),
             "dispatch_einsum": round(dispatch, 2),
             "expert_ffn": round(experts, 2),
             "combine_einsum": round(combine, 2)}
    print(f"moe layer breakdown (ms, fwd+bwd, mb={mb} T={T}): {parts}",
          flush=True)
    return parts


WORKLOADS = {
    "gpt1p3b": "bench_gpt", "beit_b": "bench_beit", "kosmos": "bench_kosmos",
    "beit_pretrain": "bench_beit_pretrain", "layoutlmv3": "bench_layoutlmv3",
    "trocr": "bench_trocr", "moe": "bench_moe",
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workload", choices=list(WORKLOADS) + ["all"],
                   default="all")
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--micro_batch", type=int, default=2)
    p.add_argument("--accum", type=int, default=4)
    p.add_argument("--batch", type=int, default=256)  # beit
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--inner", type=int, default=4)  # steps per jitted scan
    p.add_argument("--optimizer", default="adafactor",
                   choices=["adafactor", "adamw"])
    p.add_argument("--fused_ce", action="store_true",
                   help="chunked-vocab CE from features (ops/fused_ce.py) "
                        "instead of materializing [B,T,V] logits")
    p.add_argument("--ce_chunk", type=int, default=8192)
    p.add_argument("--tiny", action="store_true",
                   help="tiny kosmos config (CPU smoke test of the harness)")
    p.add_argument("--no_flash", action="store_true",
                   help="ablation: XLA dot-product attention instead of the "
                        "Pallas flash fwd+bwd kernels")
    p.add_argument("--breakdown", action="store_true",
                   help="also time fwd-only and fwd+bwd per microbatch "
                        "(gpt workload)")
    p.add_argument("--scan", action="store_true",
                   help="scan_layers train path (one lax.scan over stacked "
                        "params; grad-parity tested in tests/test_scan_stack)")
    p.add_argument("--no_remat", action="store_true",
                   help="store activations instead of rematerializing")
    p.add_argument("--remat_policy", default="full", choices=["full", "dots"],
                   help="dots = keep matmul outputs, recompute elementwise")
    p.add_argument("--param_dtype", default="fp32", choices=["fp32", "bf16"],
                   help="bf16 = fairseq --memory-efficient-fp16 equivalent "
                        "(params+grads half precision, no fp32 master)")
    p.add_argument("--bias_mode", default="fused",
                   choices=["fused", "materialized", "none"],
                   help="layoutlmv3: fused bucket-bias kernel / materialized "
                        "[B,H,T,S] bias / relative bias disabled (floor)")
    p.add_argument("--moe_experts", type=int, default=8)
    p.add_argument("--moe_breakdown", action="store_true",
                   help="also time one MoE layer's gating/dispatch/expert/"
                        "combine components fwd+bwd (moe workload)")
    args = p.parse_args()
    print(f"device: {jax.devices()[0].device_kind}  "
          f"peak bf16 = {detect_peak()/1e12:.0f} TF/s", flush=True)
    if args.workload == "all":
        names = ["gpt1p3b", "beit_b"]
    else:
        names = [args.workload]
    for name in names:
        result = globals()[WORKLOADS[name]](args)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
