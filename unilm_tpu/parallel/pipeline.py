"""Pipeline parallelism: GPipe schedule over a mesh 'stage' axis.

Equivalent of fairseq's torch Pipe integration
(fairseq/distributed/utils.py:153-243 _pipeline_parallel_pre/post_init,
--pipeline-model-parallel balance/devices): layers are partitioned into S
stages stacked on a mesh axis; microbatches flow through the ring with
ppermute, S + M - 1 ticks total. TPU-first: one SPMD program, activations
hop over ICI, every stage computes every tick (bubble ticks are masked) —
no per-rank process logic or RPC like torch Pipe.

Use under shard_map:

    out = shard_map(
        lambda p, x: pipeline_apply(stage_fn, p, x, axis_name="stage"),
        mesh=mesh,
        in_specs=(P("stage"), P(None)),   # stacked stage params; replicated in
        out_specs=P(None),                 # replicated output
    )(stacked_params, microbatches)
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp


def _pvary(x, axis_name):
    """pvary with fallback across jax versions (pcast is the new name)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)



def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,  # this device's stage parameters (leading stage dim of 1 squeezed by shard_map)
    microbatches: jax.Array,  # [M, mb, ...] (replicated input)
    *,
    axis_name: str,
) -> jax.Array:
    """Runs stage_fn at every pipeline stage; returns [M, mb, ...] outputs
    (replicated — the last stage's results are psum-broadcast)."""
    S = jax.lax.psum(1, axis_name)
    s = jax.lax.axis_index(axis_name)
    M = microbatches.shape[0]
    mb_shape = microbatches.shape[1:]

    perm = None  # built lazily inside body (needs python ints)

    def tick(carry, t):
        buf, outputs = carry
        # stage 0 consumes microbatch t; later stages consume the hop buffer
        mb_idx = jnp.clip(t, 0, M - 1)
        inject = jax.lax.dynamic_index_in_dim(microbatches, mb_idx, 0, keepdims=False)
        h_in = jnp.where(s == 0, inject, buf)
        h_out = stage_fn(stage_params, h_in)
        # last stage finalizes microbatch t - (S - 1)
        out_idx = t - (S - 1)
        valid = jnp.logical_and(s == S - 1, out_idx >= 0)
        write = jnp.where(valid, h_out, jax.lax.dynamic_index_in_dim(
            outputs, jnp.clip(out_idx, 0, M - 1), 0, keepdims=False))
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, write, jnp.clip(out_idx, 0, M - 1), 0
        )
        # rotate activations to the next stage over the ICI ring
        nxt = [(i, (i + 1) % S) for i in range(S)]
        buf = jax.lax.ppermute(h_out, axis_name, nxt)
        return (buf, outputs), None

    buf0 = _pvary(jnp.zeros(mb_shape, microbatches.dtype), axis_name)
    outs0 = _pvary(jnp.zeros((M,) + mb_shape, microbatches.dtype), axis_name)
    (buf, outputs), _ = jax.lax.scan(tick, (buf0, outs0), jnp.arange(M + S - 1))

    # broadcast the last stage's outputs to everyone
    mask = (s == S - 1).astype(outputs.dtype)
    return jax.lax.psum(outputs * mask, axis_name)


def stack_stage_params(params_per_layer: list, num_stages: int) -> Any:
    """[L] per-layer param pytrees -> stacked pytree with leading
    [num_stages, L/num_stages] dims (ready for P('stage', ...) sharding)."""
    L = len(params_per_layer)
    assert L % num_stages == 0, f"{L} layers not divisible into {num_stages} stages"
    per = L // num_stages

    def stack(*leaves):
        x = jnp.stack(leaves)  # [L, ...]
        return x.reshape((num_stages, per) + x.shape[1:])

    return jax.tree.map(stack, *params_per_layer)
