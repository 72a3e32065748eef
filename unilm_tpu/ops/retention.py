"""Gated retention: chunked-scan and recurrent forms (YOCO / RetNet family).

Capability-equivalent of YOCO's Triton kernels
(YOCO/yoco/models/decoder/kernel/gate_recurrent.py:10-230:
chunk_gate_retention / recurrent_gate_retention) re-designed for XLA/TPU:
the chunk form is a lax.scan whose body is pure MXU matmuls (within-chunk
decay-masked attention + cross-chunk state update), which XLA pipelines
without a hand-written kernel; the recurrent form is the O(1)-state decode
step.

Math (per head; log-gates g_t = logsigmoid(gate)/normalizer <= 0):
    S_t = exp(g_t) S_{t-1} + k_t^T v_t
    o_t = q_t S_t
with k pre-scaled by head_dim**-0.5.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def recurrent_gate_retention(
    q: jax.Array,  # [B, 1, H, D]
    k: jax.Array,  # [B, 1, H, D]
    v: jax.Array,  # [B, 1, H, D]
    g: jax.Array,  # [B, 1, H] log-gate
    state: jax.Array,  # [B, H, D, D]
) -> Tuple[jax.Array, jax.Array]:
    """One decode step. Returns (o [B,1,H,D], new_state)."""
    D = q.shape[-1]
    k = k * (D**-0.5)
    decay = jnp.exp(g.astype(jnp.float32))[:, 0, :, None, None]  # [B,H,1,1]
    kv = jnp.einsum("bshd,bshe->bhde", k, v, preferred_element_type=jnp.float32)
    new_state = state * decay + kv
    o = jnp.einsum("bshd,bhde->bshe", q, new_state.astype(q.dtype),
                   preferred_element_type=jnp.float32).astype(q.dtype)
    return o, new_state


def chunk_gate_retention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,  # [B, T, H] log-gate (<= 0)
    chunk_size: int = 256,
    initial_state: Optional[jax.Array] = None,  # [B, H, D, D]
) -> Tuple[jax.Array, jax.Array]:
    """Chunk-parallel gated retention. Returns (o [B,T,H,Dv], final_state).

    Supports Dv != Dk (RetNet's value dim is 2x the key dim); the state is
    [B, H, Dk, Dv].
    """
    B, T, H, D = q.shape
    Dv = v.shape[-1]
    C = min(chunk_size, T)
    pad = (-T) % C
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))  # pad gates 0 => decay 1
    n_chunks = (T + pad) // C

    k = k * (D**-0.5)
    # [N, B, H, C, D] chunked, head-major for clean scan body
    def chunked(x):
        return x.reshape(B, n_chunks, C, H, -1).transpose(1, 0, 3, 2, 4)

    qc, kc, vc = chunked(q), chunked(k), chunked(v)
    gc = g.reshape(B, n_chunks, C, H).transpose(1, 0, 3, 2).astype(jnp.float32)  # [N,B,H,C]

    if initial_state is None:
        initial_state = jnp.zeros((B, H, D, Dv), jnp.float32)

    def body(state, xs):
        qi, ki, vi, gi = xs  # [B,H,C,D], gi [B,H,C]
        c = jnp.cumsum(gi, axis=-1)  # [B,H,C] inclusive cumsum
        total = c[..., -1:]  # [B,H,1]
        # within-chunk decay-masked attention
        rel = c[..., :, None] - c[..., None, :]  # c_i - c_j
        mask = jnp.arange(C)[:, None] >= jnp.arange(C)[None, :]
        decay_ij = jnp.where(mask[None, None], jnp.exp(rel), 0.0)
        scores = jnp.einsum("bhid,bhjd->bhij", qi, ki,
                            preferred_element_type=jnp.float32)
        inner = jnp.einsum("bhij,bhjd->bhid", scores * decay_ij,
                           vi.astype(jnp.float32))
        # cross-chunk: q_i exp(c_i) S_in
        cross = jnp.einsum("bhid,bhde->bhie", qi.astype(jnp.float32), state)
        o = inner + cross * jnp.exp(c)[..., None]
        # state update: S_out = exp(total) S_in + sum_j exp(total - c_j) k_j^T v_j
        w = jnp.exp(total - c)  # [B,H,C]
        kv = jnp.einsum("bhjd,bhje->bhde", ki.astype(jnp.float32) * w[..., None],
                        vi.astype(jnp.float32))
        state = state * jnp.exp(total)[..., None] + kv
        return state, o

    final_state, outs = jax.lax.scan(body, initial_state, (qc, kc, vc, gc))
    # [N, B, H, C, Dv] -> [B, T, H, Dv]
    o = outs.transpose(1, 0, 3, 2, 4).reshape(B, n_chunks * C, H, Dv)[:, :T]
    return o.astype(q.dtype), final_state


def naive_gate_retention(q, k, v, g):
    """O(T) recurrent reference for testing."""
    B, T, H, D = q.shape
    state = jnp.zeros((B, H, D, v.shape[-1]), jnp.float32)
    outs = []
    for t in range(T):
        o, state = recurrent_gate_retention(
            q[:, t : t + 1], k[:, t : t + 1], v[:, t : t + 1], g[:, t : t + 1], state
        )
        outs.append(o)
    return jnp.concatenate(outs, axis=1), state
