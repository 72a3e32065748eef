"""Training engine: jitted step functions over a sharded mesh.

Replaces fairseq Trainer.train_step (fairseq/trainer.py:782-1050): micro-batch
gradient accumulation (update_freq) becomes a lax.scan over leading microbatch
dim; DDP's backward-hook all-reduce becomes GSPMD sharding of the batch axis;
fp16 loss-scaling is unnecessary in bf16 (grads accumulate in fp32 params).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, ema: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        )


def cross_entropy_loss(
    logits: jax.Array,  # [..., V]
    targets: jax.Array,  # [...] int
    mask: Optional[jax.Array] = None,  # [...] float/bool (loss_mask, cf. unigpt.py:24-70)
    label_smoothing: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (sum_loss, num_tokens); caller divides (fairseq sample_size)."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if mask is not None:
        mask = mask.astype(jnp.float32)
        return jnp.sum(nll * mask), jnp.sum(mask)
    return jnp.sum(nll), jnp.asarray(nll.size, jnp.float32)


def apply_with_moe_aux(model, variables, *args, **kwargs):
    """model.apply that also returns the summed MoE load-balance loss and
    the gate-health stats.

    MoE layers sow their GShard aux loss into the 'losses' collection
    (core/transformer.py sow('losses', 'moe_aux')); a plain apply silently
    drops it (flax sow is a no-op when the collection isn't mutable), which
    would train MoE without the balance term the reference applies via
    moe_gate_loss (torchscale xmoe routing.py l_aux + fairseq
    --moe-gate-loss-wt). MoE layers also sow their capacity-overflow
    fraction into 'moe_metrics' (core/moe.py; the reference's all-to-all
    stats, moe_layer.py:332-360). Returns (outputs, aux_loss_sum, stats)
    with stats={'moe_overflow': mean dropped-assignment fraction across
    MoE layers} — put it in the train-step metrics so an unbalanced gate
    is visible, not silent."""
    out, mut = model.apply(
        variables, *args, mutable=["losses", "moe_metrics"], **kwargs)
    leaves = jax.tree.leaves(mut.get("losses", {}))
    aux = sum((jnp.sum(l) for l in leaves), jnp.zeros((), jnp.float32))
    ov = jax.tree.leaves(mut.get("moe_metrics", {}))
    stats = {}
    if ov:
        stats["moe_overflow"] = sum(jnp.sum(o) for o in ov) / len(ov)
    return out, aux, stats


def make_train_step(
    loss_fn: Callable[..., Tuple[jax.Array, Any]],
    tx: optax.GradientTransformation,
    *,
    ema_decay: Optional[float] = None,
    clip_grad_norm: Optional[float] = None,
    microbatches: int = 1,
):
    """loss_fn(params, batch, rng) -> (loss, metrics_dict).

    Returns step(state, batch, rng) -> (state, metrics). Metrics include
    grad_norm (the reference logs gnorm, trainer.py:924) and loss.

    With microbatches > 1, `batch` must carry a leading axis of that size;
    per-microbatch fwd+bwd runs under lax.scan so activations are freed
    between microbatches (fairseq update_freq / maybe_no_sync,
    trainer.py:803 — without the DDP no_sync dance: grads stay sharded
    until the optimizer update under GSPMD).
    """

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def _grads(params, batch, rng):
        if microbatches == 1:
            (loss, metrics), grads = grad_fn(params, batch, rng)
            return loss, metrics, grads

        def body(carry, xs):
            loss_sum, metrics_sum, grads_sum = carry
            mb, r = xs
            (loss, metrics), grads = grad_fn(params, mb, r)
            return (
                loss_sum + loss,
                jax.tree.map(jnp.add, metrics_sum, metrics),
                jax.tree.map(jnp.add, grads_sum, grads),
            ), None

        mb0 = jax.tree.map(lambda x: x[0], batch)
        rngs = jax.random.split(rng, microbatches)
        (loss0, metrics0), grads0 = grad_fn(params, mb0, rngs[0])
        rest = jax.tree.map(lambda x: x[1:], batch)
        (loss, metrics, grads), _ = jax.lax.scan(
            body, (loss0, metrics0, grads0), (rest, rngs[1:])
        )
        inv = 1.0 / microbatches
        return (
            loss * inv,
            jax.tree.map(lambda m: m * inv, metrics),
            jax.tree.map(lambda g: g * inv, grads),
        )

    def step(state: TrainState, batch, rng):
        loss, metrics, grads = _grads(state.params, batch, rng)
        gnorm = optax.global_norm(grads)
        if clip_grad_norm:
            scale = jnp.minimum(1.0, clip_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay:
            ema = jax.tree.map(
                lambda e, p: e * ema_decay + (1.0 - ema_decay) * p, ema, params
            )
        metrics = dict(metrics)
        metrics.update(loss=loss, grad_norm=gnorm)
        return (
            state.replace(
                step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
            ),
            metrics,
        )

    return step
