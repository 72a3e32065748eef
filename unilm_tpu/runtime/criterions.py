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


# --------------------------------------------------------------------------- #
# InfoXLM XLCo: cross-lingual contrastive pretraining
# (infoxlm/src-infoxlm/infoxlm/criterions/xlco.py + models/infoxlm.py)
# --------------------------------------------------------------------------- #


def xlco_loss(
    query: jax.Array,   # [N, C] fast-encoder features of source sentences
    key: jax.Array,     # [N, C] slow (momentum) features of the translations
    queue: jax.Array,   # [K, C] negative queue (momentum features)
    tau: float = 0.25,
) -> Tuple[jax.Array, jax.Array]:
    """InfoNCE with the translation pair as the positive and the momentum
    queue as negatives (xlco.py:32-44). Returns (sum loss, n_correct).
    `key`/`queue` are treated as constants (stop-gradient)."""
    key = jax.lax.stop_gradient(key)
    queue = jax.lax.stop_gradient(queue)
    pos = jnp.sum(query * key, axis=-1, keepdims=True)          # [N, 1]
    neg = query @ queue.T                                        # [N, K]
    logits = jnp.concatenate([pos, neg], axis=1) / tau
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.sum(logp[:, 0])
    ncorrect = jnp.sum(jnp.argmax(logits, axis=-1) == 0)
    return loss, ncorrect


def momentum_update(fast_params, slow_params, momentum: float = 0.9999):
    """MoCo-style slow-encoder EMA (infoxlm.py model_slow update)."""
    return jax.tree.map(
        lambda s, f: momentum * s + (1.0 - momentum) * f, slow_params, fast_params
    )


def queue_enqueue(queue: jax.Array, ptr: jax.Array, keys: jax.Array):
    """Ring-buffer enqueue of [N, C] keys into the [K, C] negative queue.
    Returns (queue, ptr). K must be a multiple of N (MoCo convention)."""
    K = queue.shape[0]
    N = keys.shape[0]
    queue = jax.lax.dynamic_update_slice(
        queue, jax.lax.stop_gradient(keys), (ptr % K, jnp.zeros((), ptr.dtype))
    )
    return queue, (ptr + N) % K


# --------------------------------------------------------------------------- #
# xTune: consistency regularization for cross-lingual fine-tuning
# (xtune/src/transformers/modeling_xlm_roberta.py:196-392: KL, r1_loss, r2_loss)
# --------------------------------------------------------------------------- #


def _row_kl(p_logits: jax.Array, q_logits: jax.Array) -> jax.Array:
    """KL(softmax(q_logits) || softmax(p_logits)) per row, fp32.

    Matches the reference's KL(input, target) = kl_div(log_softmax(input),
    softmax(target)) up to reduction: we average over rows where the torch
    default 'mean' divides by numel (rows x classes); the constant factor is
    absorbed into the lambda weights.
    """
    logp = jax.nn.log_softmax(p_logits.astype(jnp.float32), axis=-1)
    q = jax.nn.softmax(q_logits.astype(jnp.float32), axis=-1)
    logq = jax.nn.log_softmax(q_logits.astype(jnp.float32), axis=-1)
    return jnp.sum(q * (logq - logp), axis=-1)


def xtune_r1_loss(
    logits: jax.Array,          # [N, C] clean-view logits
    noised_logits: jax.Array,   # [N, C] augmented/noised-view logits
    r1_mask: Optional[jax.Array] = None,  # [N] bool True=regularize
    r1_lambda: float = 5.0,
) -> jax.Array:
    """Example consistency (stage 1): symmetric KL between the two views,
    each direction treating the other as a fixed target (r1_loss_f/b,
    modeling_xlm_roberta.py:379-386)."""
    f = _row_kl(noised_logits, jax.lax.stop_gradient(logits))
    b = _row_kl(logits, jax.lax.stop_gradient(noised_logits))
    kl = f + b
    if r1_mask is not None:
        w = r1_mask.astype(kl.dtype)
        return r1_lambda * jnp.sum(kl * w) / jnp.maximum(jnp.sum(w), 1.0)
    return r1_lambda * jnp.mean(kl)


def xtune_r2_loss(
    logits: jax.Array,           # [N, C] current-model logits
    stage1_logits: jax.Array,    # [N, C] frozen stage-1 model logits
    augmented_mask: Optional[jax.Array] = None,  # [N] bool True=augmented row
    r2_lambda: float = 1.0,
    use_hard_labels: bool = False,
) -> jax.Array:
    """Model consistency (stage 2): pull the current model toward the frozen
    stage-1 model on augmented examples (modeling_xlm_roberta.py:322-331)."""
    stage1_logits = jax.lax.stop_gradient(stage1_logits)
    if use_hard_labels:
        hard = jnp.argmax(stage1_logits, axis=-1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        per_row = -jnp.take_along_axis(logp, hard[:, None], axis=-1)[:, 0]
    else:
        per_row = _row_kl(logits, stage1_logits)
    if augmented_mask is not None:
        w = augmented_mask.astype(per_row.dtype)
        return r2_lambda * jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
    return r2_lambda * jnp.mean(per_row)
