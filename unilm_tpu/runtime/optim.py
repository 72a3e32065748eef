"""Optimizer factory: layer-wise LR decay, WD masks, LR schedules.

Equivalents of:
- beit/optim_factory.py:47-100 (LayerDecayValueAssigner + param grouping
  with weight-decay skip list) — here as optax transforms with per-leaf
  masks/scales derived from the param path
- beit/utils.py:383 cosine_scheduler (warmup + cosine)
- fairseq/optim/lr_scheduler/{polynomial_decay,inverse_square_root}
- fairseq optim zoo -> optax (adamw/adafactor/lamb/sgd; XLA fuses adam, no
  CUDA FusedAdam needed, SURVEY.md §2.8)
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import optax


# --------------------------------------------------------------------------- #
# layer-id assignment (beit/optim_factory.py get_num_layer_for_vit)
# --------------------------------------------------------------------------- #


def beit_layer_id(path: tuple, num_layers: int) -> int:
    """embeddings/cls/pos -> 0; block i -> i+1; head/fc_norm -> num_layers+1."""
    joined = "/".join(path)
    if any(k in joined for k in ("cls_token", "mask_token", "patch_embed", "pos_embed",
                                 "embeddings", "word_embeddings", "position_embeddings",
                                 "spatial", "token_type")):
        return 0
    m = re.search(r"layers_(\d+)", joined)
    if m:
        return int(m.group(1)) + 1
    if "rel_pos_bias" in joined:
        return num_layers  # shared bias treated as last block (optim_factory)
    return num_layers + 1


def layer_decay_scales(params: Any, decay: float, num_layers: int,
                       layer_id_fn: Callable = beit_layer_id) -> Any:
    """Per-leaf multiplier decay^(num_layers+1 - layer_id)
    (LayerDecayValueAssigner.get_scale, optim_factory.py:47-56)."""

    def f(path, leaf):
        keys = tuple(k.key if hasattr(k, "key") else str(getattr(k, "idx", k)) for k in path)
        lid = layer_id_fn(keys, num_layers)
        return decay ** (num_layers + 1 - lid)

    return jax.tree_util.tree_map_with_path(f, params)


def scale_by_layer_decay(scales: Any) -> optax.GradientTransformation:
    """Multiply updates leaf-wise by precomputed scales."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def weight_decay_mask(params: Any) -> Any:
    """True where WD applies: skip 1-D params (bias/LN/gamma) and tokens
    (optim_factory.py:58-78 skip list: bias, gamma, cls_token, pos_embed...)."""

    def f(path, leaf):
        keys = "/".join(
            k.key if hasattr(k, "key") else str(getattr(k, "idx", k)) for k in path
        )
        if leaf.ndim <= 1:
            return False
        if any(s in keys for s in ("cls_token", "mask_token", "pos_embed", "gamma",
                                   "relative_position_bias_table", "latent_query")):
            return False
        return True

    return jax.tree_util.tree_map_with_path(f, params)


# --------------------------------------------------------------------------- #
# schedules
# --------------------------------------------------------------------------- #


def cosine_schedule(base_lr: float, total_steps: int, warmup_steps: int = 0,
                    min_lr: float = 0.0, warmup_init_lr: float = 0.0):
    """beit/utils.py:383 cosine_scheduler."""
    return optax.warmup_cosine_decay_schedule(
        init_value=warmup_init_lr, peak_value=base_lr, warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1), end_value=min_lr,
    )


def polynomial_decay_schedule(base_lr: float, total_steps: int, warmup_steps: int = 0,
                              end_lr: float = 0.0, power: float = 1.0,
                              warmup_init_lr: float = 0.0):
    """fairseq polynomial_decay (kosmos-2 train.sh uses this)."""
    schedules = [
        optax.linear_schedule(warmup_init_lr, base_lr, max(warmup_steps, 1)),
        optax.polynomial_schedule(base_lr, end_lr, power, total_steps - warmup_steps),
    ]
    return optax.join_schedules(schedules, [warmup_steps])


def inverse_sqrt_schedule(base_lr: float, warmup_steps: int = 4000,
                          warmup_init_lr: float = 0.0):
    """fairseq inverse_sqrt."""

    def sched(step):
        import jax.numpy as jnp

        step = jnp.maximum(step, 1)
        warm = warmup_init_lr + (base_lr - warmup_init_lr) * step / max(warmup_steps, 1)
        decay = base_lr * (warmup_steps**0.5) * jax.lax.rsqrt(step.astype(jnp.float32))
        return jnp.where(step < warmup_steps, warm, decay)

    return sched


# --------------------------------------------------------------------------- #
# factory
# --------------------------------------------------------------------------- #


def create_optimizer(
    params: Any,
    learning_rate,  # float or schedule
    *,
    optimizer: str = "adamw",
    weight_decay: float = 0.05,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    layer_decay: Optional[float] = None,
    num_layers: int = 12,
    layer_id_fn: Callable = beit_layer_id,
    clip_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """beit create_optimizer equivalent (optim_factory.py:100-182)."""
    wd_mask = weight_decay_mask(params)
    chain = []
    if clip_grad_norm:
        chain.append(optax.clip_by_global_norm(clip_grad_norm))
    if optimizer == "adamw":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    elif optimizer == "adafactor":
        return optax.adafactor(learning_rate)
    elif optimizer == "lamb":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        chain.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
        chain.append(optax.scale_by_trust_ratio())
        if layer_decay:
            chain.append(
                scale_by_layer_decay(layer_decay_scales(params, layer_decay, num_layers, layer_id_fn))
            )
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)
    elif optimizer == "sgd":
        chain.append(optax.trace(decay=betas[0]))
    else:
        raise ValueError(f"unknown optimizer {optimizer}")
    if weight_decay and optimizer == "adamw":
        chain.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
    if layer_decay:
        chain.append(
            scale_by_layer_decay(layer_decay_scales(params, layer_decay, num_layers, layer_id_fn))
        )
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
