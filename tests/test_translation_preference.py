"""XLM-T multilingual NMT preset + PFPO preference optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unilm_tpu.models.translation import (
    MultilingualTranslationModel,
    TranslationConfig,
    make_generate_fns,
    make_lang_tokens,
)
from unilm_tpu.runtime.criterions import label_smoothed_nll_loss
from unilm_tpu.runtime.generate import GenerationConfig, generate
from unilm_tpu.runtime.preference import (
    SampledSolution,
    aggregate_process_rewards,
    build_preference_pairs,
    dpo_loss,
    majority_answer,
    sequence_log_probs,
)

PAD, EOS = 1, 2
BASE_V = 16


def tiny_cfg():
    return TranslationConfig(
        vocab_size=BASE_V + 2, embed_dim=32, num_layers=2, num_heads=2,
        ffn_dim=64, max_positions=32, dropout=0.0, pad_id=PAD,
    )


def lang_pair():
    return make_lang_tokens(["en", "de"], BASE_V)  # de=16, en=17


class TestTranslation:
    def test_lang_tokens(self):
        toks = make_lang_tokens(["en", "de"], 100)
        assert toks == {"de": 100, "en": 101}

    def test_train_decode_parity(self):
        cfg = tiny_cfg()
        model = MultilingualTranslationModel(cfg)
        langs = lang_pair()
        B, S, T = 2, 6, 5
        key = jax.random.PRNGKey(0)
        src = jax.random.randint(key, (B, S), 3, BASE_V).at[:, 0].set(langs["en"])
        prev = jax.random.randint(key, (B, T), 3, BASE_V).at[:, 0].set(langs["de"])
        params = model.init(jax.random.PRNGKey(1), src, prev)["params"]

        full = model.apply({"params": params}, src, prev)
        enc = model.apply({"params": params}, src, method=model.encode)
        prefill, step = make_generate_fns(model, cache_size=8)
        lg0, cache = prefill(params, prev[:, :2], enc)
        outs = [lg0]
        for t in range(2, T):
            lg, cache = step(params, prev[:, t : t + 1], cache, enc)
            outs.append(lg)
        inc = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(full, inc, atol=2e-4, rtol=1e-3)

    @pytest.mark.slow
    def test_learns_copy_task_and_beam_decodes(self):
        """en->de 'translation' = copy; the tgt-lang token selects the task."""
        cfg = tiny_cfg()
        model = MultilingualTranslationModel(cfg)
        langs = lang_pair()
        B, L = 16, 5
        rng = np.random.default_rng(0)

        def batch(key):
            body = jax.random.randint(key, (B, L), 3, BASE_V)
            src = jnp.concatenate(
                [jnp.full((B, 1), langs["en"]), body], axis=1)
            tgt = jnp.concatenate(
                [body, jnp.full((B, 1), EOS)], axis=1)
            prev = jnp.concatenate(
                [jnp.full((B, 1), langs["de"]), body], axis=1)
            return src, prev, tgt

        src, prev, tgt = batch(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(1), src, prev)["params"]
        opt = optax.adam(3e-3)
        state = opt.init(params)

        @jax.jit
        def train_step(params, state, src, prev, tgt):
            def loss_fn(p):
                logits = model.apply({"params": p}, src, prev)
                loss, _ = label_smoothed_nll_loss(
                    jax.nn.log_softmax(logits.astype(jnp.float32)),
                    tgt, epsilon=0.1)
                return loss / tgt.size
            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, state = opt.update(g, state, params)
            return optax.apply_updates(params, updates), state, loss

        losses = []
        for i in range(150):
            src_i, prev_i, tgt_i = batch(jax.random.PRNGKey(100 + i))
            params, state, loss = train_step(params, state, src_i, prev_i, tgt_i)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])

        # beam decode an eval example
        src_e, _, tgt_e = batch(jax.random.PRNGKey(999))
        enc = model.apply({"params": params}, src_e, method=model.encode)
        prefill, step = make_generate_fns(model, cache_size=16)
        gcfg = GenerationConfig(max_new_tokens=L + 1, eos=EOS, pad=PAD,
                                beam_size=2, vocab_size=cfg.vocab_size)
        out = generate(gcfg, prefill, step, params,
                       jnp.full((B, 1), langs["de"], jnp.int32), aux=enc)
        hyp = np.asarray(out[0])[:, 0, 1 : L + 1]  # best beam
        ref = np.asarray(src_e)[:, 1:]
        acc = (hyp == ref).mean()
        assert acc > 0.8, acc


class TestPreference:
    def test_sequence_log_probs_manual(self):
        B, T, V = 1, 4, 5
        logits = jax.random.normal(jax.random.PRNGKey(0), (B, T, V))
        labels = jnp.array([[0, 2, 3, 1]])
        mask = jnp.array([[True, True, False]])
        lp = sequence_log_probs(logits, labels, mask)
        ls = jax.nn.log_softmax(logits[0].astype(jnp.float32), -1)
        expect = ls[0, 2] + ls[1, 3]
        np.testing.assert_allclose(float(lp[0]), float(expect), rtol=1e-5)
        lp_avg = sequence_log_probs(logits, labels, mask, average=True)
        np.testing.assert_allclose(float(lp_avg[0]), float(expect) / 2, rtol=1e-5)

    def test_dpo_prefers_chosen(self):
        pc, pr = jnp.array([-1.0]), jnp.array([-5.0])
        rc, rr = jnp.array([-3.0]), jnp.array([-3.0])
        good, cw, rw = dpo_loss(pc, pr, rc, rr, beta=0.1)
        bad, _, _ = dpo_loss(pr, pc, rc, rr, beta=0.1)
        assert float(good) < float(bad)
        assert float(cw[0]) > float(rw[0])
        # reference-free and variants run
        for lt in ("sigmoid", "hinge", "ipo"):
            val, _, _ = dpo_loss(pc, pr, beta=0.1, loss_type=lt)
            assert np.isfinite(float(val))

    def test_dpo_gradient_direction(self):
        """Gradient pushes chosen logp up and rejected down."""
        def f(x):
            loss, _, _ = dpo_loss(x[:1], x[1:], beta=0.5)
            return loss
        g = jax.grad(f)(jnp.array([-2.0, -2.0]))
        assert float(g[0]) < 0 and float(g[1]) > 0

    def test_pair_construction_self_consistency(self):
        sols = [
            SampledSolution("s1", answer="42"),
            SampledSolution("s2", answer="42"),
            SampledSolution("s3", answer="7"),
            SampledSolution("s4", answer=None),
        ]
        assert majority_answer(sols) == "42"
        pairs = build_preference_pairs(sols)
        assert pairs and all(c in ("s1", "s2") and r == "s3" for c, r in pairs)

    def test_pair_construction_test_cases(self):
        sols = [
            SampledSolution("good", pass_frac=1.0),
            SampledSolution("mid", pass_frac=0.6),
            SampledSolution("bad", pass_frac=0.0),
        ]
        pairs = build_preference_pairs(sols, strategy="test_cases")
        assert pairs[0] == ("good", "bad")

    def test_process_reward_reductions(self):
        probs = [0.9, 0.5, 1.0]
        assert abs(aggregate_process_rewards(probs, "product") - 0.45) < 1e-9
        assert aggregate_process_rewards(probs, "min") == 0.5
        assert abs(aggregate_process_rewards(probs, "mean") - 0.8) < 1e-9
