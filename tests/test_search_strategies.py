"""Diverse beam + lexically constrained beam, oracle-verified with scripted
probability tables (the reference's fixture pattern, edgelm/tests/utils.py:60;
strategies: fairseq/search.py DiverseBeamSearch / LexicallyConstrainedBeamSearch,
switchboard trocr/task.py:191-250)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.runtime.generate import (
    GenerationConfig, beam_generate, constrained_beam_generate,
    diverse_beam_generate, pack_constraints,
)

V = 6  # 0=bos, 1=pad, 2=eos, 3..5 real tokens
PAD, EOS = 1, 2


def scripted_model(table):
    table = jnp.asarray(table, jnp.float32)

    def prefill(params, tokens, aux):
        B, P = tokens.shape
        logits = table[tokens[:, -1], P - 1][:, None, :]
        return logits, {"step": jnp.asarray(P, jnp.int32)}

    def step(params, tokens, cache, aux):
        s = cache["step"]
        B, T = tokens.shape
        steps = s + jnp.arange(T)
        logits = table[tokens, jnp.broadcast_to(steps[None], (B, T))]
        return logits, {"step": s + T}

    return prefill, step


def np_logprobs(table, prev, step):
    x = np.asarray(table, np.float32)[prev, step]
    e = np.exp(x - x.max())
    return np.log(e / e.sum())


def automaton_progress(seq, flat, starts, count):
    """Run the ordered-constraint automaton over seq; return final progress."""
    p = 0
    for t in seq:
        if t == EOS:
            break
        if p < count and t == flat[p]:
            p += 1
        elif p < count:
            s = starts[p]
            p = s + 1 if t == flat[s] else s
    return p


def oracle_constrained(table, phrases, max_new, len_penalty):
    """Best finalized sequence whose automaton reaches the final state.
    Finalization: eos at any step (scored with its logprob) or max length."""
    flat = [t for ph in phrases for t in ph]
    starts, j = [], 0
    for ph in phrases:
        starts += [j] * len(ph)
        j += len(ph)
    count = len(flat)
    best = (-1e30, None)
    real = [t for t in range(V) if t not in (PAD, EOS)]

    def fin(seq, score, glen):
        nonlocal best
        if automaton_progress(seq, flat, starts, count) >= count:
            s = score / max(glen, 1.0) ** len_penalty
            if s > best[0]:
                best = (s, seq)

    def rec(prev, step, score, seq):
        if len(seq) == max_new:
            fin(seq, score, len(seq))
            return
        lp = np_logprobs(table, prev, step)
        fin(seq + [EOS], score + lp[EOS], len(seq) + 1)
        for tok in real:
            rec(tok, step + 1, score + lp[tok], seq + [tok])

    rec(0, 0, 0.0, [])
    return best


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_constrained_beam_matches_exhaustive(seed):
    rng = np.random.RandomState(seed)
    table = rng.randn(V, 12, V) * 1.5
    table[:, :, PAD] = -100
    phrases = [[4], [5, 3]] if seed % 2 == 0 else [[3, 3]]
    max_new = 5
    cfg = GenerationConfig(beam_size=8, max_new_tokens=max_new, vocab_size=V,
                           pad=PAD, eos=EOS, len_penalty=1.0, min_new_tokens=0)
    prefill, step = scripted_model(table)
    cons, starts, counts = pack_constraints([phrases], pad=PAD)
    toks, scores, met = constrained_beam_generate(
        cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32),
        cons, starts, counts)
    got = [int(t) for t in np.asarray(toks)[0, 0, 1:] if t != PAD]
    oracle_score, oracle_seq = oracle_constrained(table, phrases, max_new, 1.0)
    assert bool(np.asarray(met)[0, 0])
    np.testing.assert_allclose(float(np.asarray(scores)[0, 0]), oracle_score,
                               rtol=1e-5, err_msg=f"{got} vs {oracle_seq}")
    assert got == oracle_seq


def test_constrained_every_hypothesis_satisfies():
    rng = np.random.RandomState(7)
    table = rng.randn(V, 12, V) * 2.0
    table[:, :, PAD] = -100
    # make the constraint tokens UNLIKELY so unconstrained beam would skip them
    table[:, :, 4] -= 4.0
    phrases = [[4, 5]]
    cfg = GenerationConfig(beam_size=4, max_new_tokens=6, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0)
    prefill, step = scripted_model(table)
    cons, starts, counts = pack_constraints([phrases], pad=PAD)
    toks, scores, met = constrained_beam_generate(
        cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32),
        cons, starts, counts)
    flat, sts, cnt = [4, 5], [0, 0], 2
    for k in range(4):
        if float(np.asarray(scores)[0, k]) < -1e6:
            continue
        seq = [int(t) for t in np.asarray(toks)[0, k, 1:] if t != PAD]
        assert automaton_progress(seq, flat, sts, cnt) == cnt, (k, seq)
        assert bool(np.asarray(met)[0, k])
    # sanity: unconstrained beam's best does NOT contain the phrase
    ub, _ = beam_generate(cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32))
    useq = [int(t) for t in np.asarray(ub)[0, 0, 1:] if t != PAD]
    assert automaton_progress(useq, flat, sts, cnt) < cnt


def test_constrained_no_constraints_matches_beam():
    rng = np.random.RandomState(3)
    table = rng.randn(V, 12, V)
    table[:, :, PAD] = -100
    cfg = GenerationConfig(beam_size=4, max_new_tokens=4, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0)
    prefill, step = scripted_model(table)
    cons, starts, counts = pack_constraints([[]], pad=PAD)
    ctoks, cscores, met = constrained_beam_generate(
        cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32),
        cons, starts, counts)
    btoks, bscores = beam_generate(cfg, prefill, step, None,
                                   jnp.zeros((1, 1), jnp.int32))
    np.testing.assert_allclose(np.asarray(cscores)[0, 0],
                               np.asarray(bscores)[0, 0], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ctoks)[0, 0], np.asarray(btoks)[0, 0])


def test_constrained_batch_independent_constraints():
    rng = np.random.RandomState(9)
    table = rng.randn(V, 12, V) * 1.5
    table[:, :, PAD] = -100
    cfg = GenerationConfig(beam_size=6, max_new_tokens=5, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0)
    prefill, step = scripted_model(table)
    batch_phrases = [[[4]], [[5, 3]]]
    cons, starts, counts = pack_constraints(batch_phrases, pad=PAD)
    toks, scores, met = constrained_beam_generate(
        cfg, prefill, step, None, jnp.zeros((2, 1), jnp.int32),
        cons, starts, counts)
    for b, phrases in enumerate(batch_phrases):
        flat = [t for ph in phrases for t in ph]
        sts, j = [], 0
        for ph in phrases:
            sts += [j] * len(ph)
            j += len(ph)
        seq = [int(t) for t in np.asarray(toks)[b, 0, 1:] if t != PAD]
        assert automaton_progress(seq, flat, sts, len(flat)) == len(flat), (b, seq)
        # matches a single-sentence run (no cross-batch leakage)
        c1, s1, n1 = pack_constraints([phrases], pad=PAD)
        t1, s1_, _ = constrained_beam_generate(
            cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32), c1, s1, n1)
        np.testing.assert_allclose(np.asarray(scores)[b, 0],
                                   np.asarray(s1_)[0, 0], rtol=1e-5)


def test_diverse_beam_groups_disagree():
    """With as many groups as beams and strong diversity, the K first tokens
    are K DISTINCT tokens; standard beam on the same table keeps duplicates
    of the same prefix."""
    rng = np.random.RandomState(0)
    table = rng.randn(V, 12, V)
    table[:, :, PAD] = -100
    # one token vastly better: standard beam's K first-steps all expand it
    table[0, 0, 4] += 8.0
    K = 3
    cfg = GenerationConfig(beam_size=K, max_new_tokens=3, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0,
                           num_groups=K, diversity_strength=1000.0)
    prefill, step = scripted_model(table)
    toks, scores = diverse_beam_generate(
        cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32))
    firsts = {int(t) for t in np.asarray(toks)[0, :, 1]}
    assert len(firsts) == K  # every group opens with a different token


def test_diverse_beam_single_group_matches_beam():
    rng = np.random.RandomState(4)
    table = rng.randn(V, 12, V)
    table[:, :, PAD] = -100
    cfg = GenerationConfig(beam_size=4, max_new_tokens=4, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0,
                           num_groups=1, diversity_strength=0.7)
    prefill, step = scripted_model(table)
    dtoks, dscores = diverse_beam_generate(
        cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32))
    btoks, bscores = beam_generate(cfg, prefill, step, None,
                                   jnp.zeros((1, 1), jnp.int32))
    np.testing.assert_allclose(np.asarray(dscores)[0, 0],
                               np.asarray(bscores)[0, 0], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(dtoks)[0, 0], np.asarray(btoks)[0, 0])


def test_diverse_beam_zero_strength_groupwise_beam():
    """strength=0, G groups: group g behaves as an INDEPENDENT beam of size
    K/G; the overall best hypothesis equals the best of a K/G-sized beam."""
    rng = np.random.RandomState(5)
    table = rng.randn(V, 12, V)
    table[:, :, PAD] = -100
    cfg = GenerationConfig(beam_size=4, max_new_tokens=4, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0,
                           num_groups=2, diversity_strength=0.0)
    prefill, step = scripted_model(table)
    dtoks, dscores = diverse_beam_generate(
        cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32))
    small = GenerationConfig(beam_size=2, max_new_tokens=4, vocab_size=V,
                             pad=PAD, eos=EOS, min_new_tokens=0)
    btoks, bscores = beam_generate(small, prefill, step, None,
                                   jnp.zeros((1, 1), jnp.int32))
    np.testing.assert_allclose(np.asarray(dscores)[0, 0],
                               np.asarray(bscores)[0, 0], rtol=1e-5)


def test_generate_dispatch_diverse():
    from unilm_tpu.runtime.generate import generate

    rng = np.random.RandomState(6)
    table = rng.randn(V, 12, V)
    table[:, :, PAD] = -100
    cfg = GenerationConfig(beam_size=4, max_new_tokens=3, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0, num_groups=2)
    prefill, step = scripted_model(table)
    toks, scores = generate(cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32))
    assert toks.shape == (1, 4, 4)
