"""E5/SimLM retrieval + UniLM seq2seq tests."""

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.models.retrieval import (
    CrossEncoderReranker,
    EmbeddingModel,
    TextEncoderConfig,
    info_nce_loss,
)
from unilm_tpu.models.unilm_s2s import UniLMConfig, UniLMForSeq2Seq, seq2seq_attn_bias


def tiny_enc(**kw):
    d = dict(vocab_size=60, hidden_size=32, num_layers=2, num_heads=4,
             ffn_dim=64, max_positions=32, use_flash=False)
    d.update(kw)
    return TextEncoderConfig(**d)


def test_embedding_model_normalized():
    cfg = tiny_enc()
    m = EmbeddingModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (3, 10), 1, 60)
    mask = jnp.ones((3, 10), jnp.int32).at[0, 6:].set(0)
    params = m.init(jax.random.PRNGKey(1), ids, mask)["params"]
    emb = m.apply({"params": params}, ids, mask)
    assert emb.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-4)
    # masked-mean: padding must not affect the embedding
    ids2 = ids.at[0, 6:].set(59)
    emb2 = m.apply({"params": params}, ids2, mask)
    np.testing.assert_allclose(np.asarray(emb[0]), np.asarray(emb2[0]), atol=1e-5)


def test_info_nce():
    q = jnp.eye(4, 8)
    p = jnp.eye(4, 8)  # positives aligned
    loss, acc = info_nce_loss(q, p, temperature=0.1)
    assert float(acc) == 1.0
    assert float(loss) < 0.1


def test_reranker():
    cfg = tiny_enc(pooling="cls")
    m = CrossEncoderReranker(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 1, 60)
    params = m.init(jax.random.PRNGKey(1), ids)["params"]
    scores = m.apply({"params": params}, ids)
    assert scores.shape == (2,)


def test_seq2seq_mask_semantics():
    bias = np.asarray(seq2seq_attn_bias(3, 3))[0, 0]
    # src rows (0..2) see all src, none of tgt
    assert (bias[:3, :3] == 0).all()
    assert (bias[:3, 3:] < -1e20).all()
    # tgt rows see all src + causal tgt
    assert (bias[3:, :3] == 0).all()
    assert bias[3, 4] < -1e20 and bias[5, 4] == 0


def test_unilm_prefix_lm_decode_matches_train():
    cfg = UniLMConfig(vocab_size=60, hidden_size=32, num_layers=2, num_heads=4,
                      ffn_dim=64, max_positions=32, use_flash=False)
    m = UniLMForSeq2Seq(cfg)
    S, T = 5, 4
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, S + T), 4, 60)
    types = jnp.concatenate([jnp.full((1, S), 4), jnp.full((1, T), 5)], 1)
    params = m.init(jax.random.PRNGKey(1), toks, types, S)["params"]
    full = m.apply({"params": params}, toks, types, S)

    # generation path: bidirectional prefill over src, causal decode of tgt
    logits_p, vars1 = m.apply(
        {"params": params}, toks[:, :S], types[:, :S], S + T,
        method=m.prefill, mutable=["cache"],
    )
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(full[:, :S]),
                               atol=3e-4, rtol=1e-3)
    cache = vars1["cache"]
    outs = []
    for t in range(T):
        lg, vars2 = m.apply(
            {"params": params, "cache": cache},
            toks[:, S + t : S + t + 1], types[:, S + t : S + t + 1],
            jnp.asarray([[S + t]]), S + T,
            method=m.decode_step, mutable=["cache"],
        )
        cache = vars2["cache"]
        outs.append(lg)
    inc = jnp.concatenate(outs, 1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full[:, S:]),
                               atol=3e-4, rtol=1e-3)
