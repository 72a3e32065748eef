"""MiniLM deep self-attention distillation (v1 + v2 relation distillation).

Capability-equivalent of the reference's MiniLM project (minilm/README.md;
papers arXiv:2002.10957, arXiv:2012.15828). The reference ships only
pretrained checkpoints + an XNLI eval script; the distillation objectives are:

- **v1**: KL between teacher and student last-layer self-attention
  distributions, plus KL between their value-relation matrices
  softmax(V V^T / sqrt(d_v)).
- **v2**: generalized "self-attention relation" distillation — concatenate
  heads, re-split Q/K/V into `num_relation_heads` relation heads, and match
  softmax(X X^T / sqrt(d_r)) for X in {Q, K, V}. This removes the
  teacher/student head-count restriction.

Q/K/V tensors come from the core attention's sown intermediates: apply any
encoder with `mutable=["intermediates"]` and pass the tree to
`collect_qkv`. Everything here is jit-friendly (static shapes, no Python
control flow on data).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

QKV = Tuple[jax.Array, jax.Array, jax.Array]  # each [B, T, H, D]


def collect_qkv(intermediates: Dict) -> List[QKV]:
    """Pull per-layer (q, k, v) out of a flax intermediates tree, in layer
    order (sorted by the integer suffixes in the module path)."""
    found: Dict[str, Dict[str, jax.Array]] = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for name, sub in tree.items():
                if name in ("attn_q", "attn_k", "attn_v"):
                    found.setdefault(path, {})[name] = sub[0]  # sow stores a tuple
                else:
                    walk(sub, f"{path}/{name}")

    walk(intermediates, "")

    def layer_key(path: str):
        return [int(t) if t.isdigit() else -1
                for t in path.replace("_", "/").split("/") if t]

    out = []
    for path in sorted(found, key=layer_key):
        grp = found[path]
        if len(grp) == 3:
            out.append((grp["attn_q"], grp["attn_k"], grp["attn_v"]))
    return out


def _merge_heads(x: jax.Array) -> jax.Array:
    B, T, H, D = x.shape
    return x.reshape(B, T, H * D)


def relation_log_probs(
    x: jax.Array,  # [B, T, H, D]
    num_relation_heads: int,
    key_padding_mask: Optional[jax.Array] = None,  # bool [B, T] True=valid
) -> jax.Array:
    """log softmax(X X^T / sqrt(d_r)) over relation heads: [B, Hr, T, T]."""
    B, T = x.shape[:2]
    flat = _merge_heads(x).astype(jnp.float32)
    E = flat.shape[-1]
    assert E % num_relation_heads == 0, (E, num_relation_heads)
    dr = E // num_relation_heads
    r = flat.reshape(B, T, num_relation_heads, dr).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhtd,bhsd->bhts", r, r) * (dr**-0.5)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], logits, -1e30)
    return jax.nn.log_softmax(logits, axis=-1)


def masked_mean_kl(t_logp, s_logp, key_padding_mask):
    """Mean KL(t||s) over valid (batch, head, query-row) entries."""
    kl = jnp.sum(jnp.exp(t_logp) * (t_logp - s_logp), axis=-1)  # [B, H, T]
    if key_padding_mask is None:
        return jnp.mean(kl)
    w = jnp.broadcast_to(key_padding_mask[:, None, :], kl.shape).astype(kl.dtype)
    return jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1.0)


def minilm_v2_loss(
    teacher_qkv: QKV,
    student_qkv: QKV,
    num_relation_heads: int = 48,
    key_padding_mask: Optional[jax.Array] = None,
    weights: Sequence[float] = (1.0, 1.0, 1.0),
) -> jax.Array:
    """Sum of Q-Q / K-K / V-V relation KLs (teacher || student)."""
    total = 0.0
    for w, t_x, s_x in zip(weights, teacher_qkv, student_qkv):
        t = relation_log_probs(t_x, num_relation_heads, key_padding_mask)
        s = relation_log_probs(s_x, num_relation_heads, key_padding_mask)
        total = total + w * masked_mean_kl(jax.lax.stop_gradient(t), s, key_padding_mask)
    return total


def minilm_v1_loss(
    teacher_qkv: QKV,
    student_qkv: QKV,
    key_padding_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention-distribution KL + value-relation KL (teacher/student must
    share the head count; per-head dims may differ)."""
    tq, tk, tv = (x.astype(jnp.float32) for x in teacher_qkv)
    sq, sk, sv = (x.astype(jnp.float32) for x in student_qkv)
    assert tq.shape[2] == sq.shape[2], "MiniLM v1 needs equal head counts (use v2)"

    def attn_logp(q, k):
        logits = jnp.einsum("bthd,bshd->bhts", q, k) * (q.shape[-1] ** -0.5)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], logits, -1e30)
        return jax.nn.log_softmax(logits, axis=-1)

    def value_rel_logp(v):
        logits = jnp.einsum("bthd,bshd->bhts", v, v) * (v.shape[-1] ** -0.5)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], logits, -1e30)
        return jax.nn.log_softmax(logits, axis=-1)

    at = jax.lax.stop_gradient(attn_logp(tq, tk))
    vt = jax.lax.stop_gradient(value_rel_logp(tv))
    return masked_mean_kl(at, attn_logp(sq, sk), key_padding_mask) + masked_mean_kl(
        vt, value_rel_logp(sv), key_padding_mask
    )
