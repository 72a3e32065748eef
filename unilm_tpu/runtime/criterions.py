"""Criterion zoo: masked-LM, masked-image-modeling, label-smoothed CE.

Equivalents of the reference's criterion registries:
- BERT/InfoXLM MLM + TLM masking (infoxlm src: 80/10/10 corruption; TLM is
  the same masking over concatenated translation pairs)
- BEiT MIM loss (CE over visual-token ids at masked patches,
  engine_for_pretraining.py:22)
- fairseq label_smoothed_cross_entropy
- UniGPT loss-masked CE lives in runtime/train.cross_entropy_loss;
  contrastive InfoNCE in models/retrieval.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

IGNORE = -100


def apply_mlm_mask(
    rng: jax.Array,
    tokens: jax.Array,  # [B, T] int
    mask_token_id: int,
    vocab_size: int,
    mask_prob: float = 0.15,
    special_ids: Sequence[int] = (0, 1, 2, 3),
    leave_unmasked_prob: float = 0.1,
    random_token_prob: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """BERT corruption: select mask_prob positions (excluding specials);
    of those 80% -> [MASK], 10% -> random token, 10% unchanged.
    Returns (corrupted_tokens, labels) with labels = IGNORE off-target."""
    r1, r2, r3 = jax.random.split(rng, 3)
    special = jnp.zeros_like(tokens, bool)
    for s in special_ids:
        special = special | (tokens == s)
    selected = (jax.random.uniform(r1, tokens.shape) < mask_prob) & ~special

    u = jax.random.uniform(r2, tokens.shape)
    use_mask = selected & (u < 1.0 - leave_unmasked_prob - random_token_prob)
    use_rand = selected & (u >= 1.0 - random_token_prob)
    rand_toks = jax.random.randint(r3, tokens.shape, 0, vocab_size)

    corrupted = jnp.where(use_mask, mask_token_id, tokens)
    corrupted = jnp.where(use_rand, rand_toks, corrupted)
    labels = jnp.where(selected, tokens, IGNORE)
    return corrupted, labels


def masked_lm_loss(logits: jax.Array, labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Mean CE over positions with labels != IGNORE. Returns (loss, count)."""
    valid = labels != IGNORE
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.sum(valid)
    return jnp.sum(nll * valid) / jnp.maximum(n, 1), n


def mim_loss(
    logits: jax.Array,  # [B, N, codebook]
    target_ids: jax.Array,  # [B, N] visual-token ids from the tokenizer
    bool_masked_pos: jax.Array,  # [B, N]
) -> Tuple[jax.Array, jax.Array]:
    """BEiT masked-image-modeling loss: CE only at masked patches."""
    labels = jnp.where(bool_masked_pos, target_ids, IGNORE)
    return masked_lm_loss(logits, labels)


def label_smoothed_nll_loss(
    logits: jax.Array,  # [..., V]
    targets: jax.Array,
    epsilon: float = 0.1,
    ignore_index: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """fairseq label_smoothed_cross_entropy: (1-eps)NLL + eps*uniform.
    Returns (sum_loss, sample_size)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = (
        jnp.ones(targets.shape, bool) if ignore_index is None
        else targets != ignore_index
    )
    safe = jnp.where(valid, targets, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1.0 - epsilon) * nll + epsilon * smooth
    return jnp.sum(loss * valid), jnp.sum(valid)
