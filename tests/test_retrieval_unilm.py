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


def test_xlco_contrastive():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unilm_tpu.runtime.criterions import (
        momentum_update,
        queue_enqueue,
        xlco_loss,
    )

    N, C, K = 4, 8, 16
    q = jax.random.normal(jax.random.PRNGKey(0), (N, C))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    queue = jax.random.normal(jax.random.PRNGKey(1), (K, C)) * 0.1

    # query == key (perfect alignment): all correct, low loss
    loss, ncorrect = xlco_loss(q * 5.0, q * 5.0, queue)
    assert int(ncorrect) == N
    # misaligned pairs: higher loss than aligned
    perm = jnp.roll(q, 1, axis=0)
    loss_bad, _ = xlco_loss(q * 5.0, perm * 5.0, queue)
    assert float(loss_bad) > float(loss)

    # gradient flows to query only (slow side stop-gradient, xlco.py:33)
    g = jax.grad(lambda a, b: xlco_loss(a, b, queue)[0], argnums=(0, 1))(q, q)
    assert float(jnp.abs(g[0]).sum()) > 0
    assert float(jnp.abs(g[1]).sum()) == 0

    # ring queue wraps
    ptr = jnp.zeros((), jnp.int32)
    qq = jnp.zeros((K, C))
    for i in range(5):
        qq, ptr = queue_enqueue(qq, ptr, jnp.full((N, C), float(i + 1)))
    assert int(ptr) == (5 * N) % K
    assert float(qq[0, 0]) == 5.0  # wrapped write

    # momentum update
    slow = {"w": jnp.zeros(3)}
    fast = {"w": jnp.ones(3)}
    upd = momentum_update(fast, slow, momentum=0.9)
    np.testing.assert_allclose(np.asarray(upd["w"]), 0.1, rtol=1e-6)


def test_speechlm_pretrain():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unilm_tpu.models.speechlm import (
        SpeechLM,
        SpeechLMConfig,
        speechlm_pretrain_loss,
    )

    cfg = SpeechLMConfig(
        hidden_size=32, num_layers=2, num_heads=2, ffn_dim=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        unit_vocab=12, text_vocab=20, use_flash=False,
    )
    model = SpeechLM(cfg)
    B, S, L = 2, 400, 6
    audio = jax.random.normal(jax.random.PRNGKey(0), (B, S))
    # frame count after convs: (400-10)/5+1=79 -> (79-3)/2+1=39
    T = 39
    mask = jnp.zeros((B, T), bool).at[:, 5:15].set(True)
    text = jnp.ones((B, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), audio, mask, text)["params"]
    unit_logits, text_logits = model.apply({"params": params}, audio, mask, text)
    assert unit_logits.shape == (B, T, 12)
    assert text_logits.shape == (B, L, 20)

    unit_tgt = jnp.zeros((B, T), jnp.int32)
    text_tgt = jnp.full((B, L), -100).at[:, 2].set(3)
    loss, m = speechlm_pretrain_loss(
        unit_logits, unit_tgt, mask, text_logits, text_tgt
    )
    assert np.isfinite(float(loss))
    assert float(m["unit_loss"]) > 0 and float(m["text_loss"]) > 0

    # the two streams share ONE encoder: text-head grads flow through
    # encoder params that the speech path also uses
    def tloss(p):
        _, tl = model.apply({"params": p}, audio, mask, text)
        ll, _ = speechlm_pretrain_loss(unit_logits * 0, unit_tgt, mask, tl, text_tgt)
        return ll
    g = jax.grad(tloss)(params)
    enc_leaf = jax.tree.leaves(g["encoder"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in enc_leaf)
