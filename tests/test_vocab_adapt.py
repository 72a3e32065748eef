"""AdaLM incremental vocab extension + xTune consistency criteria."""

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.data.vocab_adapt import (
    RESERVED,
    WordPieceTokenizer,
    build_wordpiece_vocab,
    corpus_log_prob,
    corpus_word_counts,
    extend_embeddings,
    merge_vocabs,
    vocab_extend,
)
from unilm_tpu.runtime.criterions import xtune_r1_loss, xtune_r2_loss

DOMAIN_DOCS = [
    "angiogenesis inhibits tumor growth in xenograft models",
    "the angiogenesis pathway regulates tumor vasculature",
    "xenograft tumor angiogenesis assays measure vasculature growth",
    "tumor angiogenesis and vasculature remodeling in xenograft studies",
] * 4


class TestWordPiece:
    def test_greedy_roundtrip(self):
        vocab = list(RESERVED) + ["a", "b", "##a", "##b", "ab", "##ab"]
        tok = WordPieceTokenizer(vocab)
        assert tok.tokenize_word("abab") == ["ab", "##ab"]
        assert tok.tokenize_word("aba") == ["ab", "##a"]
        assert tok.tokenize_word("q") == ["[UNK]"]

    def test_build_learns_domain_words(self):
        counts = corpus_word_counts(DOMAIN_DOCS)
        vocab = build_wordpiece_vocab(counts, target_size=60)
        multi = [t for t in vocab if len(t.lstrip("#")) >= 4 and t not in RESERVED]
        assert multi, vocab
        tok = WordPieceTokenizer(vocab)
        # frequent domain words tokenize into few pieces
        assert len(tok.tokenize_word("angiogenesis")) <= 6


class TestVocabExtend:
    def base_vocab(self):
        chars = sorted({c for d in DOMAIN_DOCS for c in d if c != " "})
        return list(RESERVED) + chars + ["##" + c for c in chars] + ["the", "in", "and"]

    def test_logprob_improves_with_domain_tokens(self):
        base = self.base_vocab()
        lp_base = corpus_log_prob(DOMAIN_DOCS, base)
        merged = merge_vocabs(base, build_wordpiece_vocab(
            corpus_word_counts(DOMAIN_DOCS), 80))
        lp_merged = corpus_log_prob(DOMAIN_DOCS, merged)
        assert lp_merged > lp_base

    def test_extend_preserves_base_ids_and_stops(self):
        base = self.base_vocab()
        merged = vocab_extend(DOMAIN_DOCS, base, interval=40, threshold=0.005,
                              max_rounds=4, num_iterations=2)
        assert merged[: len(base)] == base
        assert len(merged) >= len(base)

    def test_extend_embeddings_mean_init(self):
        base = self.base_vocab()
        merged = merge_vocabs(base, ["tumor", "##growth"])
        emb = np.random.default_rng(0).normal(size=(len(base), 8)).astype(np.float32)
        out = extend_embeddings(emb, base, merged)
        assert out.shape == (len(merged), 8)
        np.testing.assert_allclose(out[: len(base)], emb)
        tok = WordPieceTokenizer(base)
        ids = [tok.index[p] for p in tok.tokenize_word("tumor")]
        np.testing.assert_allclose(out[len(base)], emb[ids].mean(0), rtol=1e-6)


class TestXTune:
    def test_r1_zero_identical_positive_otherwise(self):
        logits = jax.random.normal(jax.random.PRNGKey(0), (6, 4))
        assert float(xtune_r1_loss(logits, logits)) < 1e-6
        noised = logits + 0.5
        assert float(xtune_r1_loss(logits, noised)) > 0

    def test_r1_mask(self):
        logits = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
        noised = logits.at[0, 0].add(1.0)  # only row 0 differs
        mask_off = jnp.array([False, True, True, True])
        assert float(xtune_r1_loss(logits, noised, mask_off)) < 1e-6
        mask_on = jnp.array([True, False, False, False])
        assert float(xtune_r1_loss(logits, noised, mask_on)) > 0

    def test_r2_hard_and_soft(self):
        s1 = jnp.array([[10.0, 0.0], [0.0, 10.0]])
        cur = jnp.array([[10.0, 0.0], [0.0, 10.0]])
        assert float(xtune_r2_loss(cur, s1)) < 1e-3
        assert float(xtune_r2_loss(cur, s1, use_hard_labels=True)) < 1e-3
        wrong = -cur
        assert float(xtune_r2_loss(wrong, s1)) > 1.0

    def test_r1_pulls_views_together(self):
        """Minimizing R1 over one view's logits reduces divergence."""
        key = jax.random.PRNGKey(2)
        a = jax.random.normal(key, (8, 5))
        b = a + jax.random.normal(jax.random.PRNGKey(3), (8, 5))

        def loss(b_):
            return xtune_r1_loss(a, b_, r1_lambda=1.0)

        lr = 0.5
        l0 = float(loss(b))
        for _ in range(200):
            b = b - lr * jax.grad(loss)(b)
        assert float(loss(b)) < l0 * 0.1
