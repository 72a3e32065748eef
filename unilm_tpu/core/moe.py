"""Mixture-of-Experts layer — X-MoE equivalent, GSPMD-idiomatic.

Replaces torchscale's expert-parallel MoE
(kosmos-2/torchscale/torchscale/component/xmoe/{moe_layer,routing}.py):
the reference dispatches tokens with an explicit `dist.all_to_all_single`
over NCCL (moe_layer.py:46-60) under capacity-based Top1/Top2 gating
(routing.py). Here dispatch/combine are einsums against one-hot
capacity masks (GShard style); when expert weights are sharded over the
mesh 'expert' axis under pjit, XLA lowers the einsums to the same
all_to_all over ICI — no hand-written collective needed, and the whole
layer stays differentiable and static-shaped.

Gating follows xMoE: optional low-dim routing projection
(cfg.moe_gate_dim, routing.py xMoE variant) and fp32 gate math.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.layers import FeedForward


def _top2_gating(
    logits: jax.Array,  # [G, S, E] fp32
    capacity: int,
    top2: bool,
    rng: Optional[jax.Array],
    second_policy: str,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (combine_weights [G,S,E,C], dispatch_mask bool, aux_loss)."""
    G, S, E = logits.shape
    gates = jax.nn.softmax(logits, axis=-1)

    # --- top-1 ---------------------------------------------------------------
    idx1 = jnp.argmax(gates, axis=-1)  # [G, S]
    mask1 = jax.nn.one_hot(idx1, E, dtype=jnp.float32)
    gate1 = jnp.sum(gates * mask1, axis=-1)

    # aux load-balance loss (GShard eq.; routing.py l_aux)
    density = jnp.mean(mask1, axis=1)  # fraction routed per expert [G, E]
    density_proxy = jnp.mean(gates, axis=1)
    aux_loss = jnp.mean(density * density_proxy) * (E * E)

    # position in expert queue (cumsum over tokens)
    pos1 = jnp.cumsum(mask1, axis=1) * mask1 - mask1  # [G, S, E] 0-based
    pos1_scalar = jnp.sum(pos1, axis=-1).astype(jnp.int32)
    keep1 = pos1_scalar < capacity
    mask1 = mask1 * keep1[..., None]
    gate1 = gate1 * keep1

    combine1 = (
        gate1[..., None, None]
        * mask1[..., None]
        * jax.nn.one_hot(pos1_scalar, capacity, dtype=jnp.float32)[..., None, :]
    )
    combine = combine1

    if top2:
        gates2 = gates * (1.0 - jax.nn.one_hot(idx1, E, dtype=jnp.float32))
        idx2 = jnp.argmax(gates2, axis=-1)
        mask2 = jax.nn.one_hot(idx2, E, dtype=jnp.float32)
        gate2 = jnp.sum(gates * mask2, axis=-1)
        if second_policy == "random" and rng is not None:
            # route to 2nd expert with prob proportional to 2*gate2 (GShard)
            keep_rand = jax.random.uniform(rng, gate2.shape) < (2.0 * gate2)
            mask2 = mask2 * keep_rand[..., None]
        mask2_attempted = mask2  # before the capacity clip (overflow metric)
        # queue positions continue after expert's top-1 load
        used1 = jnp.sum(mask1, axis=1, keepdims=True)  # [G, 1, E]
        pos2 = (jnp.cumsum(mask2, axis=1) - mask2) + used1
        pos2 = pos2 * mask2
        pos2_scalar = jnp.sum(pos2, axis=-1).astype(jnp.int32)
        keep2 = (pos2_scalar < capacity) & (jnp.sum(mask2, axis=-1) > 0)
        mask2 = mask2 * keep2[..., None]
        gate2 = gate2 * keep2
        # renormalize (top2 gate renorm, routing.py Top2Gate)
        denom = gate1 + gate2
        denom = jnp.where(denom > 1e-9, denom, 1.0)
        g1, g2 = gate1 / denom, gate2 / denom
        combine1 = (
            g1[..., None, None]
            * mask1[..., None]
            * jax.nn.one_hot(pos1_scalar, capacity, dtype=jnp.float32)[..., None, :]
        )
        combine2 = (
            g2[..., None, None]
            * mask2[..., None]
            * jax.nn.one_hot(pos2_scalar, capacity, dtype=jnp.float32)[..., None, :]
        )
        combine = combine1 + combine2

    dispatch = combine > 0.0

    # Operational gate-health metric: fraction of routing assignments
    # dropped by the capacity clip (the reference exposes this through its
    # all-to-all stats, torchscale xmoe/moe_layer.py:332-360). A silently
    # unbalanced gate drops tokens with no trace in the loss — this is the
    # number an operator watches. Random-policy skips of the 2nd expert are
    # intentional, so only capacity-clipped attempts count.
    dropped = jnp.sum(1.0 - keep1.astype(jnp.float32))
    attempts = jnp.asarray(G * S, jnp.float32)
    if top2:
        attempted2 = jnp.sum(mask2_attempted)
        dropped = dropped + (attempted2 - jnp.sum(mask2))
        attempts = attempts + attempted2
    overflow = dropped / jnp.maximum(attempts, 1.0)
    return combine, dispatch, aux_loss, overflow


class MoELayer(nn.Module):
    """Capacity-based MoE FFN with einsum dispatch.

    Call: (x [B, T, E_dim]) -> (out [B, T, E_dim], aux_loss scalar)."""

    cfg: TransformerConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        cfg = self.cfg
        E = cfg.moe_experts
        assert E > 0
        G, S, M = x.shape
        cap_factor = cfg.moe_eval_capacity_factor if deterministic else cfg.moe_capacity_factor
        capacity = max(int(math.ceil(S * cap_factor / E)), 4)
        # round capacity to a lane-friendly multiple of 8
        capacity = -(-capacity // 8) * 8
        capacity = min(capacity, S)

        # --- gate (fp32; routing.py computes gating in fp32) -----------------
        xf = x.astype(jnp.float32)
        if cfg.moe_gate_dim > 0:
            # xMoE: low-dim routing with cosine similarity + learned temp
            red = nn.Dense(cfg.moe_gate_dim, use_bias=False, name="gate_reduction")(xf)
            expert_emb = self.param(
                "gate_expert_embeddings",
                nn.initializers.normal(0.02),
                (E, cfg.moe_gate_dim),
                jnp.float32,
            )
            red = red / (jnp.linalg.norm(red, axis=-1, keepdims=True) + 1e-6)
            ee = expert_emb / (jnp.linalg.norm(expert_emb, axis=-1, keepdims=True) + 1e-6)
            temp = self.param("gate_temperature", nn.initializers.constant(0.07), ())
            logits = jnp.einsum("gsd,ed->gse", red, ee) / jnp.maximum(temp, 0.01)
        else:
            logits = nn.Dense(E, use_bias=False, name="gate")(xf)

        rng = None
        if not deterministic and cfg.moe_second_expert_policy == "random":
            rng = self.make_rng("dropout")
        combine, dispatch, aux, overflow = _top2_gating(
            logits, capacity, cfg.moe_top == 2, rng, cfg.moe_second_expert_policy
        )
        # gate health: capacity-overflow fraction, one scalar per MoE layer
        # (reads back via mutable=['moe_metrics']; runtime.train surfaces it)
        self.sow("moe_metrics", "overflow", jax.lax.stop_gradient(overflow))

        # --- dispatch -> experts -> combine -------------------------------------
        expert_in = jnp.einsum(
            "gsec,gsm->egcm", dispatch.astype(x.dtype), x
        )  # [E, G, C, M]

        # Expert kernels are vmapped to 3D [E, K, N]; the int8 weight-only
        # path (ops/quant.py) is 2D-kernel-only, so experts stay full
        # precision under cfg.quant_weights (only routed tokens stream each
        # expert, so the HBM win is smaller there anyway).
        ecfg = dataclasses.replace(cfg, quant_weights=False)
        expert_ffn = nn.vmap(
            FeedForward,
            in_axes=(0, None),
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )(ecfg, name="experts")
        expert_out = expert_ffn(
            expert_in.reshape(E, G * capacity, M), deterministic
        ).reshape(E, G, capacity, M)

        out = jnp.einsum("gsec,egcm->gsm", combine.astype(x.dtype), expert_out)
        return out, aux.astype(jnp.float32)
