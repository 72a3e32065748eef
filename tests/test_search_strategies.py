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


# --------------------------------------------------------------------------- #
# Diverse siblings (fairseq search.DiverseSiblingsSearch:745-814)
# --------------------------------------------------------------------------- #


def np_siblings_beam(table, K, max_new, rate, len_penalty=1.0):
    """Numpy re-statement of the siblings algorithm (Li & Jurafsky 2016,
    as pinned by fairseq search.py:765-814): per-beam top-k2 penalized by
    rate*rank, cross-beam top-2K on penalized scores, penalty persisting in
    the cumulative score."""
    lp0 = np_logprobs(table, 0, 0)
    order = np.argsort(-lp0)[:K]
    alive = [([int(t)], float(lp0[t])) for t in order if t != EOS]
    fin = [(float(lp0[t]) / 1.0 ** len_penalty, [int(t)])
           for t in order if t == EOS]
    k2 = min(2 * K, V - 1)
    for g in range(1, max_new):
        cands = []
        for seq, cum in alive:
            lp = np_logprobs(table, seq[-1], g)
            top = np.argsort(-lp)[:k2]
            for r, tok in enumerate(top, start=1):
                cands.append((cum + float(lp[tok]) - rate * r, seq + [int(tok)]))
        cands.sort(key=lambda x: -x[0])
        cands = cands[: 2 * K]
        new_alive = []
        for sc, seq in cands:
            if seq[-1] == EOS:
                fin.append((sc / max(g + 1, 1.0) ** len_penalty, seq))
            elif len(new_alive) < K:
                new_alive.append((seq, sc))
        alive = new_alive
    for seq, cum in alive:
        fin.append((cum / max(max_new, 1.0) ** len_penalty, seq))
    fin.sort(key=lambda x: -x[0])
    return fin[:K]


@pytest.mark.parametrize("seed,rate", [(0, 0.8), (1, 0.3), (2, 1.5)])
def test_siblings_matches_numpy_simulation(seed, rate):
    rng = np.random.RandomState(seed)
    table = rng.randn(V, 12, V) * 1.5
    table[:, :, PAD] = -100
    K, max_new = 3, 4
    cfg = GenerationConfig(beam_size=K, max_new_tokens=max_new, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0,
                           diversity_rate=rate)
    prefill, step = scripted_model(table)
    toks, scores = beam_generate(cfg, prefill, step, None,
                                 jnp.zeros((1, 1), jnp.int32))
    want = np_siblings_beam(table, K, max_new, rate)
    got_seq = [int(t) for t in np.asarray(toks)[0, 0, 1:] if t != PAD]
    np.testing.assert_allclose(float(np.asarray(scores)[0, 0]), want[0][0],
                               rtol=1e-5, err_msg=f"{got_seq} vs {want[0][1]}")
    assert got_seq == want[0][1]


def test_siblings_zero_rate_is_plain_beam():
    rng = np.random.RandomState(3)
    table = rng.randn(V, 12, V)
    table[:, :, PAD] = -100
    base = dict(beam_size=4, max_new_tokens=4, vocab_size=V, pad=PAD,
                eos=EOS, min_new_tokens=0)
    prefill, step = scripted_model(table)
    z = jnp.zeros((1, 1), jnp.int32)
    stoks, sscores = beam_generate(
        GenerationConfig(diversity_rate=0.0, **base), prefill, step, None, z)
    btoks, bscores = beam_generate(
        GenerationConfig(**base), prefill, step, None, z)
    np.testing.assert_allclose(np.asarray(sscores), np.asarray(bscores), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(stoks), np.asarray(btoks))


def test_siblings_huge_rate_per_beam_greedy():
    """rate >> any logprob gap: each beam keeps only its own rank-1 child, so
    the K hypotheses are K independent greedy continuations of the top-K
    first tokens."""
    rng = np.random.RandomState(9)
    table = rng.randn(V, 12, V)
    table[:, :, PAD] = -100
    table[:, :, EOS] = -50  # keep everything alive to max length
    K, max_new = 3, 4
    cfg = GenerationConfig(beam_size=K, max_new_tokens=max_new, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0,
                           diversity_rate=1e4)
    prefill, step = scripted_model(table)
    toks, _ = beam_generate(cfg, prefill, step, None,
                            jnp.zeros((1, 1), jnp.int32))
    toks = np.asarray(toks)[0]
    lp0 = np_logprobs(table, 0, 0)
    seeds = [t for t in np.argsort(-lp0) if t != EOS][:K]
    want = set()
    for s in seeds:
        seq, prev = [int(s)], int(s)
        for g in range(1, max_new):
            lp = np_logprobs(table, prev, g)
            prev = int(np.argmax(np.where(np.arange(V) == EOS, -1e9, lp)))
            seq.append(prev)
        want.add(tuple(seq))
    got = {tuple(int(t) for t in row[1:] if t != PAD) for row in toks}
    assert got == want


# --------------------------------------------------------------------------- #
# Per-sentence length-constrained beam (fairseq search.py:526-548)
# --------------------------------------------------------------------------- #


def oracle_length_constrained(table, min_len, max_len, len_penalty=1.0):
    """Best sequence under fairseq LengthConstrainedBeamSearch semantics:
    eos banned while gen < min_len; at gen >= max_len eos contributes
    logprob 0 (forced). Exhaustive over real-token paths."""
    real = [t for t in range(V) if t not in (PAD, EOS)]
    best = (-1e30, None)

    def rec(prev, g, score, seq):
        nonlocal best
        lp = np_logprobs(table, prev, g)
        if g >= min_len:  # ending here means eos is generated token g+1... no:
            pass
        # ending at this step: seq has g real tokens, eos is token g+1 overall
        glen = g + 1
        if g >= min_len:
            eos_lp = 0.0 if g >= max_len else float(lp[EOS])
            s = (score + eos_lp) / max(glen, 1.0) ** len_penalty
            if s > best[0]:
                best = (s, seq + [EOS])
        if g < max_len:
            for tok in real:
                rec(tok, g + 1, score + float(lp[tok]), seq + [tok])

    rec(0, 0, 0.0, [])
    return best


def test_length_constrained_matches_oracle():
    rng = np.random.RandomState(11)
    table = rng.randn(2, V, 12, V) * 1.5
    table[:, :, :, PAD] = -100
    bounds = [(2, 3), (1, 4)]
    cfg = GenerationConfig(beam_size=16, max_new_tokens=6, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0)
    # batch of 2 sentences with different tables folded into one: run per-b
    for b, (mn, mx) in enumerate(bounds):
        prefill, step = scripted_model(table[b])
        toks, scores = beam_generate(
            cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32),
            min_lens=jnp.asarray([mn]), max_lens=jnp.asarray([mx]))
        want_score, want_seq = oracle_length_constrained(table[b], mn, mx)
        got = [int(t) for t in np.asarray(toks)[0, 0, 1:] if t != PAD]
        np.testing.assert_allclose(float(np.asarray(scores)[0, 0]),
                                   want_score, rtol=1e-5,
                                   err_msg=f"b={b} {got} vs {want_seq}")
        assert got == want_seq
        # every finalized hypothesis respects the bounds
        for k in range(cfg.beam_size):
            row = [int(t) for t in np.asarray(toks)[0, k, 1:] if t != PAD]
            if row and EOS in row:
                gen = row.index(EOS)  # real tokens before eos
                assert mn <= gen <= mx


def test_length_constraints_per_sentence_differ():
    """Two sentences in one batch with different bounds get different
    forced lengths."""
    rng = np.random.RandomState(12)
    table = rng.randn(V, 12, V)
    table[:, :, PAD] = -100
    table[:, :, EOS] = -40  # never ends voluntarily -> length forced by max
    cfg = GenerationConfig(beam_size=3, max_new_tokens=8, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0)
    prefill, step = scripted_model(table)
    toks, _ = beam_generate(
        cfg, prefill, step, None, jnp.zeros((2, 1), jnp.int32),
        min_lens=jnp.asarray([2, 5]), max_lens=jnp.asarray([2, 5]))
    toks = np.asarray(toks)
    for b, want_gen in [(0, 2), (1, 5)]:
        row = [int(t) for t in toks[b, 0, 1:] if t != PAD]
        assert EOS in row and row.index(EOS) == want_gen, (b, row)


def test_length_constraints_helper():
    from unilm_tpu.runtime.generate import length_constraints

    mn, mx = length_constraints(jnp.asarray([10, 20]), 0.5, 1, 2.0, 5)
    np.testing.assert_array_equal(np.asarray(mn), [6, 11])
    np.testing.assert_array_equal(np.asarray(mx), [25, 45])


# --------------------------------------------------------------------------- #
# Ensemble scoring (fairseq EnsembleModel, sequence_generator.py:811-938)
# --------------------------------------------------------------------------- #


def test_ensemble_equals_prob_averaged_single_model():
    from unilm_tpu.runtime.generate import make_ensemble

    rng = np.random.RandomState(13)
    t1 = rng.randn(V, 12, V) * 1.5
    t2 = rng.randn(V, 12, V) * 1.5
    t1[:, :, PAD] = t2[:, :, PAD] = -100

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    combined = np.log((softmax(t1) + softmax(t2)) / 2.0)
    cfg = GenerationConfig(beam_size=4, max_new_tokens=5, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0)
    m1, m2 = scripted_model(t1), scripted_model(t2)
    epf, est = make_ensemble([m1, m2])
    etoks, escores = beam_generate(cfg, epf, est, (None, None),
                                   jnp.zeros((2, 1), jnp.int32))
    cpf, cst = scripted_model(combined)
    ctoks, cscores = beam_generate(cfg, cpf, cst, None,
                                   jnp.zeros((2, 1), jnp.int32))
    np.testing.assert_allclose(np.asarray(escores), np.asarray(cscores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(etoks), np.asarray(ctoks))


def test_ensemble_single_model_identity():
    from unilm_tpu.runtime.generate import make_ensemble

    rng = np.random.RandomState(14)
    t = rng.randn(V, 12, V)
    t[:, :, PAD] = -100
    cfg = GenerationConfig(beam_size=3, max_new_tokens=4, vocab_size=V,
                           pad=PAD, eos=EOS, min_new_tokens=0)
    m = scripted_model(t)
    epf, est = make_ensemble([m])
    etoks, escores = beam_generate(cfg, epf, est, (None,),
                                   jnp.zeros((1, 1), jnp.int32))
    btoks, bscores = beam_generate(cfg, *m, None, jnp.zeros((1, 1), jnp.int32))
    np.testing.assert_allclose(np.asarray(escores), np.asarray(bscores),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(etoks), np.asarray(btoks))
