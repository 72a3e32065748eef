"""Generation engine tests with scripted fake models.

Mirrors the reference's fixture pattern (edgelm/tests/utils.py:60
sequence_generator_setup: hand-built probability tables so beam results are
exactly checkable) — including an exhaustive-search oracle."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.runtime.generate import GenerationConfig, beam_generate, greedy_generate

V = 6  # vocab: 0=bos, 1=pad, 2=eos, 3..5 real tokens
PAD, EOS = 1, 2


def scripted_model(table):
    """table [V, MAXSTEP, V]: logits for next token given (prev_token, step).
    Cache = {'step': scalar}; deliberately shape-compatible with gather."""
    table = jnp.asarray(table, jnp.float32)

    def prefill(params, tokens, aux):
        B, P = tokens.shape
        logits = table[tokens[:, -1], P - 1][:, None, :]
        return logits, {"step": jnp.asarray(P, jnp.int32)}  # scalar: shared

    def step(params, tokens, cache, aux):
        s = cache["step"]
        B, T = tokens.shape
        steps = s + jnp.arange(T)
        logits = table[tokens, jnp.broadcast_to(steps[None], (B, T))]  # [B,T,V]
        return logits, {"step": s + T}

    return prefill, step


def oracle_best(table, max_new, len_penalty, min_new=1):
    """Exhaustive search over all length<=max_new continuations of [bos]."""
    table = np.asarray(table, np.float32)

    def logprobs(prev, step):
        x = table[prev, step]
        e = np.exp(x - x.max())
        return np.log(e / e.sum())

    best_score, best_seq = -1e30, None
    # sequences that end with EOS at some step, or run to max_new
    def rec(prev, step, score, seq):
        nonlocal best_score, best_seq
        if step - 1 == max_new:  # generated max_new tokens
            s = score / (max_new**len_penalty)
            if s > best_score:
                best_score, best_seq = s, list(seq)
            return
        lp = logprobs(prev, step - 1)
        for tok in range(V):
            if tok == PAD:
                continue
            gen_len = step  # tokens generated after this pick (incl. eos)
            if tok == EOS:
                if gen_len < min_new:
                    continue
                s = (score + lp[tok]) / (gen_len**len_penalty)
                if s > best_score:
                    best_score, best_seq = s, seq + [EOS]
            else:
                rec(tok, step + 1, score + lp[tok], seq + [tok])

    rec(0, 1, 0.0, [])
    return best_score, best_seq


@pytest.mark.parametrize("len_penalty", [1.0, 0.0, 2.0])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_matches_exhaustive(seed, len_penalty):
    rng = np.random.RandomState(seed)
    max_new = 3
    table = rng.randn(V, 8, V) * 2.0
    # restrict alive branching to tokens {3, 4} so 2^3 = 8 beams track the
    # full prefix tree and beam search is provably exact
    table[:, :, PAD] = -100.0
    table[:, :, 0] = -100.0
    table[:, :, 5] = -100.0

    cfg = GenerationConfig(
        beam_size=8,
        max_new_tokens=max_new,
        min_new_tokens=1,
        len_penalty=len_penalty,
        pad=PAD,
        eos=EOS,
        vocab_size=V,
    )
    prefill, step = scripted_model(table)
    prompt = jnp.zeros((1, 1), jnp.int32)  # [bos]
    tokens, scores = beam_generate(cfg, prefill, step, None, prompt)

    ref_score, ref_seq = oracle_best(table, max_new, len_penalty)
    got = list(np.asarray(tokens[0, 0, 1:]))
    got = got[: len(ref_seq)]
    assert np.isclose(float(scores[0, 0]), ref_score, atol=1e-4), (
        float(scores[0, 0]),
        ref_score,
        got,
        ref_seq,
    )
    assert got == ref_seq


def test_greedy_follows_argmax():
    table = np.full((V, 8, V), -10.0, np.float32)
    # scripted path: bos->3->4->5->eos
    table[0, 0, 3] = 0
    table[3, 1, 4] = 0
    table[4, 2, 5] = 0
    table[5, 3, EOS] = 0
    cfg = GenerationConfig(
        beam_size=1, max_new_tokens=6, pad=PAD, eos=EOS, vocab_size=V
    )
    prefill, step = scripted_model(table)
    tokens, lengths = greedy_generate(cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32))
    out = list(np.asarray(tokens[0]))
    assert out[1:5] == [3, 4, 5, EOS]


def test_min_len_blocks_eos():
    table = np.full((V, 8, V), -10.0, np.float32)
    table[:, :, EOS] = 5.0  # model always wants eos
    table[:, :, 3] = 0.0
    cfg = GenerationConfig(
        beam_size=1, max_new_tokens=4, min_new_tokens=3, pad=PAD, eos=EOS, vocab_size=V
    )
    prefill, step = scripted_model(table)
    tokens, _ = greedy_generate(cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32))
    out = list(np.asarray(tokens[0]))
    assert out[1] == 3 and out[2] == 3  # eos suppressed for 2 steps
    assert out[3] == EOS

def test_ngram_blocking():
    # model deterministically cycles 3,4,3,4,... ; 2-gram blocking must break it
    table = np.full((V, 8, V), -10.0, np.float32)
    table[0, :, 3] = 1.0
    table[3, :, 4] = 1.0
    table[4, :, 3] = 1.0
    table[4, :, 5] = 0.5  # second choice
    cfg = GenerationConfig(
        beam_size=1, max_new_tokens=5, no_repeat_ngram_size=2,
        pad=PAD, eos=EOS, vocab_size=V,
    )
    prefill, step = scripted_model(table)
    tokens, _ = greedy_generate(cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32))
    out = list(np.asarray(tokens[0]))
    # without blocking: 3 4 3 4 3; with blocking the second "3 4" is banned
    assert out[1:4] == [3, 4, 3]
    assert out[4] != 4


def test_batch_independence():
    rng = np.random.RandomState(0)
    table = rng.randn(V, 8, V).astype(np.float32) * 2
    table[:, :, PAD] = -100
    cfg = GenerationConfig(beam_size=3, max_new_tokens=4, pad=PAD, eos=EOS, vocab_size=V)
    prefill, step = scripted_model(table)
    t1, s1 = beam_generate(cfg, prefill, step, None, jnp.zeros((1, 1), jnp.int32))
    t2, s2 = beam_generate(cfg, prefill, step, None, jnp.zeros((3, 1), jnp.int32))
    np.testing.assert_allclose(s2[0], s1[0], atol=1e-5)
    np.testing.assert_array_equal(t2[0], t1[0])


def test_aggressive_decoding_matches_greedy():
    """GAD with a good draft must produce EXACTLY the greedy output with
    fewer model calls (reference decoding/GAD draft-then-verify)."""
    from unilm_tpu.runtime.generate import aggressive_generate

    rng = np.random.RandomState(3)
    table = rng.randn(V, 40, V).astype(np.float32) * 3
    table[:, :, PAD] = -100
    table[:, :, EOS] = -100  # run to max length for a deterministic compare
    cfg = GenerationConfig(beam_size=1, max_new_tokens=24, pad=PAD, eos=EOS,
                           vocab_size=V)
    prefill, step = scripted_model(table)
    prompt = jnp.zeros((1, 1), jnp.int32)
    ref, _ = greedy_generate(cfg, prefill, step, None, prompt)
    ref = np.asarray(ref)

    # oracle draft: the greedy continuation itself, with an error every 7th
    def draft_fn(accepted, need):
        out = []
        seq = list(accepted)
        for i in range(need):
            step_idx = len(seq) - 1
            lp = table[seq[-1], step_idx]
            tok = int(np.argmax(lp))
            if (len(seq) + i) % 7 == 0:
                tok = (tok + 1) % V  # inject draft errors
            out.append(tok)
            seq.append(tok)
        return np.asarray(out)

    got, calls = aggressive_generate(cfg, prefill, step, None, prompt, draft_fn,
                                     block_size=8)
    np.testing.assert_array_equal(np.asarray(got), ref)
    assert calls < 24  # fewer sequential model calls than tokens generated


def test_aggressive_decoding_with_real_model_cache():
    """Cache rewind must work on real attention caches."""
    import flax.linen as nn

    from unilm_tpu.core import Decoder, TransformerConfig
    from unilm_tpu.core.embedding import TextEmbedding
    from unilm_tpu.runtime.generate import aggressive_generate

    class LM(nn.Module):
        @nn.compact
        def __call__(self, tokens, mode="train", cache_size=0):
            emb = TextEmbedding(V, 32, name="embed")
            cfg = TransformerConfig(embed_dim=32, ffn_dim=64, num_layers=2,
                                    num_heads=4, use_flash=False)
            x = Decoder(cfg, name="dec")(emb(tokens), mode=mode,
                                         cache_size=cache_size)
            return emb.attend(x)

    model = LM()
    total = 20
    toks = jnp.zeros((1, 1), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)["params"]

    def prefill(p, tokens, aux):
        logits, v = model.apply({"params": p}, tokens, "prefill", total,
                                mutable=["cache"])
        return logits, v["cache"]

    def step(p, tokens, cache, aux):
        logits, v = model.apply({"params": p, "cache": cache}, tokens,
                                "decode", total, mutable=["cache"])
        return logits, v["cache"]

    cfg = GenerationConfig(beam_size=1, max_new_tokens=total - 1, pad=PAD,
                           eos=EOS, vocab_size=V)
    ref, _ = greedy_generate(cfg, prefill, step, params, toks)

    def perfect_draft(accepted, need):
        # draft = continue greedily from the reference (simulates a strong
        # drafter); every 5th token corrupted
        ref_seq = list(np.asarray(ref[0]))
        start = len(accepted)
        out = ref_seq[start : start + need]
        out = [(t + (1 if (start + i) % 5 == 0 else 0)) % V
               for i, t in enumerate(out)]
        return np.asarray(out)

    got, calls = aggressive_generate(cfg, prefill, step, params, toks,
                                     perfect_draft, block_size=6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
