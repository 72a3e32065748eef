"""DeltaLM: interleaved-decoder encoder-decoder
(deltalm/deltalm/models/deltalm.py:87-138).

Covers the interleaved layer's decode parity, the encoder->decoder
interleave initialization mapping (upgrade_state_dict_for_deltalm
semantics), and a tiny e2e translation (copy task) with beam decode."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unilm_tpu.models.deltalm import (
    DeltaLM, DeltaLMConfig, deltalm_base, deltalm_large,
    interleave_decoder_init, make_generate_fns,
)
from unilm_tpu.runtime.criterions import label_smoothed_nll_loss
from unilm_tpu.runtime.generate import GenerationConfig, generate

V, PAD, EOS = 64, 1, 2


def tiny_cfg(**kw):
    kw.setdefault("vocab_size", V)
    kw.setdefault("embed_dim", 32)
    kw.setdefault("enc_layers", 4)
    kw.setdefault("dec_layers", 2)
    kw.setdefault("num_heads", 2)
    kw.setdefault("ffn_dim", 64)
    kw.setdefault("max_positions", 32)
    kw.setdefault("dropout", 0.0)
    return DeltaLMConfig(**kw)


def test_arch_presets():
    base, large = deltalm_base(), deltalm_large()
    assert (base.embed_dim, base.enc_layers, base.dec_layers) == (768, 12, 6)
    assert base.layernorm_embedding
    assert (large.embed_dim, large.enc_layers, large.dec_layers) == (1024, 24, 12)
    assert not large.layernorm_embedding


def test_decoder_layer_is_interleaved():
    """Each decoder layer must carry TWO FFNs (ffn_1 before cross-attn,
    ffn after — the fc3/fc4 + fc1/fc2 pairs of DeltaLMDecoderLayer)."""
    cfg = tiny_cfg()
    model = DeltaLM(cfg)
    src = jnp.ones((1, 4), jnp.int32) * 3
    params = model.init(jax.random.PRNGKey(0), src, src)["params"]
    layer = params["decoder"]["layers_0"]
    for k in ("self_attn", "ffn_1", "ffn_layer_norm", "encoder_attn",
              "encoder_attn_layer_norm", "ffn", "final_layer_norm",
              "self_attn_layer_norm"):
        assert k in layer, k
    assert "fc1" in layer["ffn_1"] and "fc2" in layer["ffn_1"]


def test_train_decode_parity():
    cfg = tiny_cfg()
    model = DeltaLM(cfg)
    B, S, T = 2, 6, 5
    key = jax.random.PRNGKey(0)
    src = jax.random.randint(key, (B, S), 3, V)
    prev = jax.random.randint(jax.random.PRNGKey(3), (B, T), 3, V)
    params = model.init(jax.random.PRNGKey(1), src, prev)["params"]

    full = model.apply({"params": params}, src, prev)
    enc = model.apply({"params": params}, src, method=model.encode)
    prefill, step = make_generate_fns(model, cache_size=8)
    lg0, cache = prefill(params, prev[:, :2], enc)
    outs = [lg0]
    for t in range(2, T):
        lg, cache = step(params, prev[:, t:t + 1], cache, enc)
        outs.append(lg)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(full, inc, atol=2e-4, rtol=1e-3)


def test_interleave_decoder_init_mapping():
    """Encoder layer 2k -> decoder k self-attn/ffn_1; 2k+1 -> cross-attn/ffn
    (upgrade_state_dict_for_deltalm, deltalm.py:38-84)."""
    cfg = tiny_cfg()
    model = DeltaLM(cfg)
    src = jnp.ones((1, 4), jnp.int32) * 3
    params = model.init(jax.random.PRNGKey(0), src, src)["params"]
    # a "pretrained" encoder stack with distinct values
    enc_params = jax.tree.map(
        lambda x: x + 1.0, params["encoder"])

    out = interleave_decoder_init(params, enc_params)
    # encoder copied wholesale
    chex_eq = lambda a, b: jax.tree.all(
        jax.tree.map(lambda x, y: bool(jnp.all(x == y)), a, b))
    assert chex_eq(out["encoder"], enc_params)
    for k in range(cfg.dec_layers):
        d = out["decoder"][f"layers_{k}"]
        lo, hi = enc_params[f"layers_{2 * k}"], enc_params[f"layers_{2 * k + 1}"]
        assert chex_eq(d["self_attn"], lo["self_attn"])
        assert chex_eq(d["self_attn_layer_norm"], lo["self_attn_layer_norm"])
        assert chex_eq(d["ffn_1"], lo["ffn"])
        assert chex_eq(d["ffn_layer_norm"], lo["final_layer_norm"])
        assert chex_eq(d["encoder_attn"], hi["self_attn"])
        assert chex_eq(d["ffn"], hi["ffn"])
        assert chex_eq(d["final_layer_norm"], hi["final_layer_norm"])
    # forward still runs on the grafted tree
    y = model.apply({"params": out}, src, src)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.slow
def test_learns_copy_task_and_beam_decodes():
    cfg = tiny_cfg()
    model = DeltaLM(cfg)
    B, L = 16, 5

    def batch(key):
        body = jax.random.randint(key, (B, L), 3, V)
        tgt = jnp.concatenate([body, jnp.full((B, 1), EOS)], axis=1)
        prev = jnp.concatenate([jnp.full((B, 1), EOS), body], axis=1)
        return body, prev, tgt

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
        s, p, t = batch(jax.random.PRNGKey(100 + i))
        params, state, loss = train_step(params, state, s, p, t)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])

    src_e, _, _ = batch(jax.random.PRNGKey(999))
    enc = model.apply({"params": params}, src_e, method=model.encode)
    prefill, step = make_generate_fns(model, cache_size=16)
    gcfg = GenerationConfig(max_new_tokens=L + 1, eos=EOS, pad=PAD,
                            beam_size=2, vocab_size=cfg.vocab_size)
    out = generate(gcfg, prefill, step, params,
                   jnp.full((B, 1), EOS, jnp.int32), aux=enc)
    hyp = np.asarray(out[0])[:, 0, 1:L + 1]
    acc = (hyp == np.asarray(src_e)).mean()
    assert acc > 0.8, acc
