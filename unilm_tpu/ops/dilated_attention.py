"""LongNet dilated attention (capability-equivalent long-context op).

The reference's longnet/ is a README pointer (longnet/README.md:1-4) to
external torchscale; SURVEY.md §5 marks this "new-design territory". This
is the TPU-native design of the LongNet mechanism (Ding et al., 2023):

- the sequence splits into segments of length w;
- within a segment, attention runs on the r-dilated subsequence (every
  r-th token), with heads distributed over the r possible offsets so all
  tokens are covered;
- several (w, r) configurations run in parallel (short-dense to
  long-sparse) and their outputs are mixed per-token with weights
  proportional to each configuration's softmax denominator (the paper's
  dynamic mixture), so a token that attends to more mass in one
  configuration trusts it more.

Everything is static-shape: segmenting/dilating are reshapes and strided
gathers, each configuration is one batched dense attention over
[B*(T/w), w/r] tokens, and the mixture is an elementwise weighted sum —
all of it fuses under XLA; the O(T^2) dense plane never materializes for
the long configurations (cost is sum_i T * w_i / r_i per head).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _segment_dilated_attention(
    q: jax.Array,  # [B, T, Hg, D] (one head group, pre-scaled)
    k: jax.Array,
    v: jax.Array,
    w: int,
    r: int,
    offset: int,
    causal: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Attention within w-segments over the r-dilated subsequence at
    `offset`. Returns (out [B, T, Hg, D], lse [B, T, Hg]) with zeros /
    NEG_INF at positions not selected by this dilation offset."""
    B, T, Hg, D = q.shape
    ns, m = T // w, w // r
    sel = offset + r * jnp.arange(m)          # positions within a segment

    def pick(x):
        xs = x.reshape(B, ns, w, Hg, D)
        return xs[:, :, sel]                   # [B, ns, m, Hg, D]

    qs, ks, vs = pick(q), pick(k), pick(v)
    s = jnp.einsum("bsmhd,bsnhd->bshmn", qs, ks,
                   preferred_element_type=jnp.float32)
    if causal:
        cm = jnp.tril(jnp.ones((m, m), bool))
        s = jnp.where(cm[None, None, None], s, NEG_INF)
    lse = jax.nn.logsumexp(s, axis=-1)          # [B, ns, Hg, m]
    p = jnp.exp(s - lse[..., None])
    o = jnp.einsum("bshmn,bsnhd->bsmhd", p.astype(vs.dtype), vs,
                   preferred_element_type=jnp.float32)

    # scatter back to the full sequence
    out = jnp.zeros((B, ns, w, Hg, D), o.dtype)
    out = out.at[:, :, sel].set(o)
    lse_full = jnp.full((B, ns, w, Hg), NEG_INF, jnp.float32)
    lse_full = lse_full.at[:, :, sel].set(jnp.moveaxis(lse, -1, -2))
    return out.reshape(B, T, Hg, D), lse_full.reshape(B, T, Hg)


def dilated_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    *,
    segment_lengths: Sequence[int] = (2048, 4096, 8192),
    dilation_rates: Sequence[int] = (1, 2, 4),
    scale: Optional[float] = None,
    causal: bool = True,
) -> jax.Array:
    """LongNet dilated attention. Heads are split evenly across the r
    offsets of each configuration; configurations are mixed per-token by
    softmax-denominator weights. T must divide by every segment length
    (pad outside); w must divide by its r."""
    B, T, H, D = q.shape
    if scale is None:
        scale = D**-0.5
    assert len(segment_lengths) == len(dilation_rates)
    qs = (q * scale).astype(q.dtype)

    outs, lses = [], []
    for w, r in zip(segment_lengths, dilation_rates):
        w = min(w, T)
        assert T % w == 0, f"T={T} must divide by segment length {w}"
        assert w % r == 0
        if r == 1:
            o, l = _segment_dilated_attention(qs, k, v, w, 1, 0, causal)
        else:
            # distribute heads across the r dilation offsets
            assert H % r == 0, f"heads {H} must divide by dilation {r}"
            hg = H // r
            o_parts, l_parts = [], []
            for off in range(r):
                sl = slice(off * hg, (off + 1) * hg)
                oo, ll = _segment_dilated_attention(
                    qs[:, :, sl], k[:, :, sl], v[:, :, sl], w, r, off, causal
                )
                o_parts.append(oo)
                l_parts.append(ll)
            o = jnp.concatenate(o_parts, axis=2)
            l = jnp.concatenate(l_parts, axis=2)
        outs.append(o)
        lses.append(l)

    if len(outs) == 1:
        return outs[0].astype(q.dtype)
    # dynamic mixture: weight each configuration by its softmax denominator
    lse = jnp.stack(lses)                         # [C, B, T, H]
    wgt = jax.nn.softmax(lse, axis=0)             # exp(lse_i)/sum exp(lse_j)
    out = jnp.sum(jnp.stack(outs) * wgt[..., None], axis=0)
    return out.astype(q.dtype)
