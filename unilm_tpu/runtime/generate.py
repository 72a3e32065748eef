"""Generation engine: greedy / sampling / beam search under jit.

Capability-equivalent of fairseq SequenceGenerator
(kosmos-2/fairseq/fairseq/sequence_generator.py:19-1089) re-designed for XLA:

- the decode loop is a lax.while_loop over static-shape state (fairseq grows
  tensors per step and reorders incremental state via hooks :965; here beams
  are folded into the batch axis and "reorder" is a gather on axis 0 of every
  KV-cache leaf)
- length penalty score/len^lenpen, min/max length, unk penalty, temperature,
  prefix forcing via the prefill phase, banned-ngram blocking (the CUDA
  ngram_repeat_block kernel (§2.8) becomes a one-hot matmul), top-k/top-p
  sampling (fairseq/search.py Sampling)
- early termination matches fairseq: a hypothesis set is closed when the
  best still-alive score cannot beat the worst finalized one

Model adapter: two jittable closures
    prefill(params, tokens[B,P], aux) -> (logits[B,P,V], cache)
    step(params, token[B,1], cache, aux) -> (logits[B,1,V], cache)
`aux` carries encoder outputs / padding masks; cache is the flax 'cache'
collection pytree (leaves with leading batch dim).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    beam_size: int = 5
    max_new_tokens: int = 200
    min_new_tokens: int = 1
    len_penalty: float = 1.0
    unk_penalty: float = 0.0
    temperature: float = 1.0
    no_repeat_ngram_size: int = 0
    sampling: bool = False
    sampling_topk: int = 0
    sampling_topp: float = 0.0
    pad: int = 1
    eos: int = 2
    unk: int = 3
    vocab_size: int = 0


def _gather_beams(tree: Any, idx: jax.Array, batch: int, old_k: int) -> Any:
    """Gather beam-major leaves [B*old_k, ...] by idx [B, new_k].
    Scalar leaves (decode-step counters shared across beams) pass through."""
    flat = idx + jnp.arange(batch)[:, None] * old_k  # [B, new_k]
    flat = flat.reshape(-1)
    return jax.tree.map(lambda x: x if jnp.ndim(x) == 0 else x[flat], tree)


def _ngram_ban_mask(tokens, cur_len, n, vocab):
    """[B, V] bool mask of tokens that would complete a repeated n-gram.

    Replaces fairseq's CUDA ngram_repeat_block (clib/cuda) with vector ops:
    for every historical position i, if tokens[i:i+n-1] equals the current
    suffix, ban tokens[i+n-1]."""
    B, L = tokens.shape
    if n <= 0:
        return jnp.zeros((B, vocab), bool)

    pos = jnp.arange(L)
    # windows starting at i cover tokens[i .. i+n-1]
    match = jnp.ones((B, L), bool)
    for d in range(n - 1):
        suf_tok = jnp.take_along_axis(
            tokens, jnp.maximum(cur_len - (n - 1) + d, 0)[None, None].repeat(B, 0), axis=1
        )[:, 0]
        win_tok = jnp.roll(tokens, -d, axis=1)
        match = match & (win_tok == suf_tok[:, None])
    # window must be fully in the past: i + n - 1 < cur_len
    valid = (pos[None, :] + n - 1) < cur_len
    match = match & valid
    banned_tok = jnp.roll(tokens, -(n - 1), axis=1)  # tokens[i + n - 1]
    onehot = jax.nn.one_hot(banned_tok, vocab, dtype=jnp.float32)
    banned = jnp.einsum("bl,blv->bv", match.astype(jnp.float32), onehot)
    return banned > 0


def _adjust_logprobs(logprobs, tokens, gen_len, cur_len, cfg: GenerationConfig):
    """min_len / unk penalty / ngram blocking (sequence_generator.py:303-330)."""
    V = logprobs.shape[-1]
    logprobs = logprobs.at[:, cfg.pad].set(NEG_INF)
    if cfg.unk_penalty:
        logprobs = logprobs.at[:, cfg.unk].add(-cfg.unk_penalty)
    # min_new_tokens counts the eos itself: picking eos now yields gen_len+1
    eos_off = (gen_len + 1) < cfg.min_new_tokens
    logprobs = logprobs.at[:, cfg.eos].set(
        jnp.where(eos_off, NEG_INF, logprobs[:, cfg.eos])
    )
    if cfg.no_repeat_ngram_size > 0:
        banned = _ngram_ban_mask(tokens, cur_len, cfg.no_repeat_ngram_size, V)
        logprobs = jnp.where(banned, NEG_INF, logprobs)
    return logprobs


# --------------------------------------------------------------------------- #
# Greedy / sampling
# --------------------------------------------------------------------------- #


def greedy_generate(
    cfg: GenerationConfig,
    prefill: Callable,
    step: Callable,
    params: Any,
    prompt: jax.Array,  # [B, P]
    aux: Any = None,
    rng: Optional[jax.Array] = None,
):
    """Greedy or sampled decode. Returns (tokens [B, P+max_new], lengths [B])."""
    B, P = prompt.shape
    total = P + cfg.max_new_tokens
    logits, cache = prefill(params, prompt, aux)
    tokens = jnp.full((B, total), cfg.pad, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt.astype(jnp.int32), (0, 0))
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def pick(logits_row, tokens, cur_len, r):
        lp = jax.nn.log_softmax(logits_row.astype(jnp.float32) / cfg.temperature)
        lp = _adjust_logprobs(lp, tokens, cur_len - P, cur_len, cfg)
        if not cfg.sampling:
            return jnp.argmax(lp, axis=-1).astype(jnp.int32)
        if cfg.sampling_topk > 0:
            vals, idx = jax.lax.top_k(lp, cfg.sampling_topk)
            choice = jax.random.categorical(r, vals)
            return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0].astype(jnp.int32)
        if cfg.sampling_topp > 0.0:
            sorted_lp, sort_idx = jax.lax.top_k(lp, lp.shape[-1])
            probs = jnp.exp(sorted_lp)
            cum = jnp.cumsum(probs, axis=-1)
            keep = cum - probs < cfg.sampling_topp
            masked = jnp.where(keep, sorted_lp, NEG_INF)
            choice = jax.random.categorical(r, masked)
            return jnp.take_along_axis(sort_idx, choice[:, None], axis=1)[:, 0].astype(jnp.int32)
        return jax.random.categorical(r, lp).astype(jnp.int32)

    r0, rng = jax.random.split(rng)
    next_tok = pick(logits[:, -1], tokens, jnp.asarray(P), r0)
    tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, P))
    finished = next_tok == cfg.eos

    def cond(state):
        i, tokens, cache, finished, rng = state
        return (i < total) & ~jnp.all(finished)

    def body(state):
        i, tokens, cache, finished, rng = state
        last = jax.lax.dynamic_slice(tokens, (0, i - 1), (B, 1))
        logits, cache = step(params, last, cache, aux)
        rng, r = jax.random.split(rng)
        nxt = pick(logits[:, -1], tokens, i, r)
        nxt = jnp.where(finished, cfg.pad, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
        finished = finished | (nxt == cfg.eos)
        return (i + 1, tokens, cache, finished, rng)

    _, tokens, _, finished, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(P + 1), tokens, cache, finished, rng)
    )
    lengths = jnp.sum(tokens != cfg.pad, axis=1)
    return tokens, lengths


# --------------------------------------------------------------------------- #
# Beam search
# --------------------------------------------------------------------------- #


def beam_generate(
    cfg: GenerationConfig,
    prefill: Callable,
    step: Callable,
    params: Any,
    prompt: jax.Array,  # [B, P]
    aux: Any = None,
):
    """Beam search. Returns (tokens [B, K, total], scores [B, K]) sorted
    best-first; scores are length-penalized like fairseq (cum/len^lenpen)."""
    B, P = prompt.shape
    K = cfg.beam_size
    total = P + cfg.max_new_tokens
    V = cfg.vocab_size
    assert V > 0, "GenerationConfig.vocab_size required for beam search"

    # ---- prefill on the un-tiled batch, then tile to beams -------------------
    logits, cache = prefill(params, prompt, aux)
    lp0 = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32) / cfg.temperature)
    tokens_flat = jnp.full((B, total), cfg.pad, jnp.int32)
    tokens_flat = jax.lax.dynamic_update_slice(tokens_flat, prompt.astype(jnp.int32), (0, 0))
    lp0 = _adjust_logprobs(lp0, tokens_flat, jnp.asarray(0), jnp.asarray(P), cfg)

    k0 = min(K, V)
    first_scores, first_tokens = jax.lax.top_k(lp0, k0)  # [B, k0]
    if k0 < K:  # beam wider than vocab: pad with dead beams
        first_scores = jnp.concatenate(
            [first_scores, jnp.full((B, K - k0), NEG_INF)], axis=1
        )
        first_tokens = jnp.concatenate(
            [first_tokens, jnp.full((B, K - k0), cfg.pad, first_tokens.dtype)], axis=1
        )

    def tile(x):
        return x if jnp.ndim(x) == 0 else jnp.repeat(x, K, axis=0)

    cache = jax.tree.map(tile, cache)
    aux_t = jax.tree.map(tile, aux) if aux is not None else None

    alive_tokens = jnp.repeat(tokens_flat, K, axis=0).reshape(B, K, total)
    alive_tokens = alive_tokens.at[:, :, P].set(first_tokens)
    alive_scores = first_scores  # cumulative logprob [B, K]

    fin_tokens = jnp.full((B, K, total), cfg.pad, jnp.int32)
    fin_scores = jnp.full((B, K), NEG_INF)
    fin_exists = jnp.zeros((B, K), bool)

    # handle eos at first position
    is_eos0 = first_tokens == cfg.eos
    fin_scores = jnp.where(is_eos0, first_scores / (1.0**cfg.len_penalty), fin_scores)
    fin_tokens = jnp.where(is_eos0[..., None], alive_tokens, fin_tokens)
    fin_exists = is_eos0
    alive_scores = jnp.where(is_eos0, NEG_INF, alive_scores)

    def lp_den(gen_len):
        return jnp.maximum(gen_len, 1.0) ** cfg.len_penalty

    def cond(state):
        i, alive_tokens, alive_scores, fin_tokens, fin_scores, fin_exists, cache = state
        max_gen = total - P
        # best possible future score for any alive beam
        best_alive = jnp.max(alive_scores, axis=1) / lp_den(jnp.asarray(max_gen, jnp.float32))
        worst_fin = jnp.min(jnp.where(fin_exists, fin_scores, NEG_INF), axis=1)
        all_done = jnp.all(fin_exists, axis=1) & (worst_fin >= best_alive)
        return (i < total) & ~jnp.all(all_done)

    def body(state):
        i, alive_tokens, alive_scores, fin_tokens, fin_scores, fin_exists, cache = state
        flat_tokens = alive_tokens.reshape(B * K, total)
        last = jax.lax.dynamic_slice(flat_tokens, (0, i - 1), (B * K, 1))
        logits, new_cache = step(params, last, cache, aux_t)
        lp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32) / cfg.temperature)
        lp = _adjust_logprobs(lp, flat_tokens, i - P, i, cfg)
        lp = lp.reshape(B, K, V)

        cand = alive_scores[:, :, None] + lp  # [B, K, V]
        cand_flat = cand.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(cand_flat, 2 * K)  # [B, 2K]
        beam_idx = top_idx // V
        tok_idx = top_idx % V

        # candidate token rows
        cand_tokens = jnp.take_along_axis(
            alive_tokens, beam_idx[..., None], axis=1
        )  # [B, 2K, total]
        cand_tokens = jax.lax.dynamic_update_slice(
            cand_tokens, tok_idx[..., None].astype(jnp.int32), (0, 0, i)
        )

        is_eos = tok_idx == cfg.eos
        gen_len = (i + 1 - P).astype(jnp.float32)

        # ---- finalize eos candidates -------------------------------------
        eos_scores = jnp.where(is_eos, top_scores / lp_den(gen_len), NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, eos_scores], axis=1)  # [B, 3K]
        all_fin_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)
        all_fin_exists = jnp.concatenate([fin_exists, is_eos], axis=1)
        keep_scores, keep_idx = jax.lax.top_k(
            jnp.where(all_fin_exists, all_fin_scores, NEG_INF), K
        )
        fin_tokens = jnp.take_along_axis(all_fin_tokens, keep_idx[..., None], axis=1)
        fin_scores = keep_scores
        fin_exists = jnp.take_along_axis(all_fin_exists, keep_idx, axis=1)

        # ---- select top-K non-eos as new alive ------------------------------
        alive_cand_scores = jnp.where(is_eos, NEG_INF, top_scores)
        new_scores, sel = jax.lax.top_k(alive_cand_scores, K)  # sel in [0, 2K)
        new_tokens = jnp.take_along_axis(cand_tokens, sel[..., None], axis=1)
        src_beam = jnp.take_along_axis(beam_idx, sel, axis=1)  # [B, K]

        new_cache = _gather_beams(new_cache, src_beam, B, K)
        return (i + 1, new_tokens, new_scores, fin_tokens, fin_scores, fin_exists, new_cache)

    state = (
        jnp.asarray(P + 1),
        alive_tokens,
        alive_scores,
        fin_tokens,
        fin_scores,
        fin_exists,
        cache,
    )
    (i, alive_tokens, alive_scores, fin_tokens, fin_scores, fin_exists, _) = (
        jax.lax.while_loop(cond, body, state)
    )

    # beams that never emitted eos: finalize alive at max length
    gen_len = jnp.asarray(total - P, jnp.float32)
    alive_fin = alive_scores / lp_den(gen_len)
    all_scores = jnp.concatenate(
        [jnp.where(fin_exists, fin_scores, NEG_INF), alive_fin], axis=1
    )
    all_tokens = jnp.concatenate([fin_tokens, alive_tokens], axis=1)
    out_scores, idx = jax.lax.top_k(all_scores, K)
    out_tokens = jnp.take_along_axis(all_tokens, idx[..., None], axis=1)
    return out_tokens, out_scores


def generate(
    cfg: GenerationConfig,
    prefill: Callable,
    step: Callable,
    params: Any,
    prompt: jax.Array,
    aux: Any = None,
    rng: Optional[jax.Array] = None,
):
    """Dispatch: beam_size>1 -> beam; else greedy/sampling."""
    if cfg.beam_size > 1 and not cfg.sampling:
        return beam_generate(cfg, prefill, step, params, prompt, aux)
    return greedy_generate(cfg, prefill, step, params, prompt, aux, rng)


# --------------------------------------------------------------------------- #
# (Generalized) Aggressive Decoding — draft-verify parallel decoding
# --------------------------------------------------------------------------- #


def _rewind_cache(cache: Any, new_len: jax.Array) -> Any:
    """Set every scalar int32 counter leaf (cache_index / pos / step) to
    new_len. Stale KV entries beyond new_len are masked by kv_len and
    overwritten by subsequent writes."""

    def f(x):
        if jnp.ndim(x) == 0 and jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer):
            return jnp.asarray(new_len, jnp.int32)
        return x

    return jax.tree.map(f, cache)


def aggressive_generate(
    cfg: GenerationConfig,
    prefill: Callable,
    step: Callable,
    params: Any,
    prompt: jax.Array,  # [1, P] (batch 1, like the reference CLI)
    draft_fn: Callable[[jax.Array, int], jax.Array],  # (accepted, need) -> [1, D]
    aux: Any = None,
    block_size: int = 16,
):
    """(Generalized) Aggressive Decoding (reference decoding/GAD): verify a
    drafted block in ONE decoder forward, accept the longest prefix that
    matches greedy, take the model's correction token, rewind the cache and
    repeat. Exact greedy output in ~O(len/avg_accept) sequential steps.

    draft_fn receives the accepted sequence so far (host np array) and the
    number of tokens to draft; GAD-for-translation drafts the remaining
    source tokens (Aggressive Decoding); a small model gives speculative
    decoding. Returns (tokens [1, P+max_new], num_model_calls)."""
    import numpy as np

    B, P = prompt.shape
    assert B == 1, "aggressive decoding: batch 1 (per-sample accept lengths)"
    total = P + cfg.max_new_tokens

    logits, cache = prefill(params, prompt, aux)
    first = int(jnp.argmax(logits[0, -1]))
    accepted = list(np.asarray(prompt[0])) + [first]
    calls = 1
    if first == cfg.eos:
        out = np.full((1, total), cfg.pad, np.int32)
        out[0, : len(accepted)] = accepted
        return jnp.asarray(out), calls

    @jax.jit
    def verify(params, cache, tokens, aux):
        logits, cache = step(params, tokens, cache, aux)
        return jnp.argmax(logits, axis=-1), cache

    while len(accepted) < total:
        need = min(block_size, total - len(accepted))
        draft = np.asarray(draft_fn(np.asarray(accepted), need)).reshape(1, -1)
        draft = draft[:, :need]
        D = draft.shape[1]
        # feed [last_accepted, draft]; output j predicts position len(acc)+j
        x = jnp.asarray(
            np.concatenate([[accepted[-1]], draft[0]]).reshape(1, -1), jnp.int32
        )
        greedy, cache = verify(params, cache, x, aux)
        calls += 1
        g = np.asarray(greedy[0])  # [D+1]
        k = 0
        while k < D and g[k] == draft[0, k] and draft[0, k] != cfg.eos:
            k += 1
        new_tokens = list(draft[0, :k]) + [int(g[k])]
        accepted.extend(int(t) for t in new_tokens)
        # cache holds KV for [last, draft...]: valid prefix = accepted tokens
        cache = _rewind_cache(cache, jnp.asarray(len(accepted) - 1, jnp.int32))
        if cfg.eos in new_tokens:
            break

    out = np.full((1, total), cfg.pad, np.int32)
    out[0, : min(len(accepted), total)] = accepted[:total]
    return jnp.asarray(out), calls
