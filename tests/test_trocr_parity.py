"""TrOCR parity vs HF VisionEncoderDecoder: teacher-forced logits + greedy
decode agreement (random weights, offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from unilm_tpu.convert.trocr import convert_trocr
from unilm_tpu.models.trocr import TrOCRConfig, TrOCRModel, make_generate_fns
from unilm_tpu.runtime.generate import GenerationConfig, greedy_generate


def build_pair():
    enc_cfg = transformers.DeiTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16,
    )
    dec_cfg = transformers.TrOCRConfig(
        vocab_size=100, d_model=48, decoder_layers=2, decoder_attention_heads=4,
        decoder_ffn_dim=96, max_position_embeddings=64,
        use_learned_position_embeddings=True, layernorm_embedding=True,
        scale_embedding=False, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.VisionEncoderDecoderModel(
        transformers.VisionEncoderDecoderConfig.from_encoder_decoder_configs(
            enc_cfg, dec_cfg
        )
    ).eval()
    cfg = TrOCRConfig(
        img_size=32, patch_size=16, enc_dim=32, enc_layers=2, enc_heads=4,
        enc_ffn=64, distilled=True, enc_eps=1e-12,
        vocab_size=100, dec_dim=48, dec_layers=2, dec_heads=4, dec_ffn=96,
        max_positions=64, layernorm_embedding=True, scale_embedding=False,
        normalize_before=False, enc_to_dec_proj=True, use_flash=False,
    )
    return hf, cfg


def test_teacher_forced_logits():
    hf, cfg = build_pair()
    params = convert_trocr(hf.state_dict(), cfg)
    rng = np.random.RandomState(0)
    pix = rng.randn(2, 3, 32, 32).astype(np.float32)
    dec_in = rng.randint(3, 100, (2, 7)).astype(np.int64)
    dec_in[:, 0] = 2  # decoder_start_token_id

    with torch.no_grad():
        ref = hf(
            pixel_values=torch.from_numpy(pix),
            decoder_input_ids=torch.from_numpy(dec_in),
        ).logits.numpy()

    model = TrOCRModel(cfg)
    out = model.apply(
        {"params": params},
        jnp.asarray(pix.transpose(0, 2, 3, 1)),
        jnp.asarray(dec_in),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)


def test_greedy_decode_matches_hf():
    hf, cfg = build_pair()
    params = convert_trocr(hf.state_dict(), cfg)
    rng = np.random.RandomState(1)
    pix = rng.randn(2, 3, 32, 32).astype(np.float32)
    max_new = 8

    with torch.no_grad():
        ref = hf.generate(
            torch.from_numpy(pix),
            max_new_tokens=max_new,
            min_new_tokens=1,
            num_beams=1,
            do_sample=False,
            decoder_start_token_id=2,
            bos_token_id=0,
            eos_token_id=3,  # improbable eos so sequences run long
            pad_token_id=1,
        ).numpy()

    model = TrOCRModel(cfg)
    enc = model.apply({"params": params}, jnp.asarray(pix.transpose(0, 2, 3, 1)),
                      method=model.encode)
    prefill, step = make_generate_fns(model, cache_size=1 + max_new)
    gcfg = GenerationConfig(
        beam_size=1, max_new_tokens=max_new, min_new_tokens=1,
        pad=1, eos=3, vocab_size=100,
    )
    prompt = jnp.full((2, 1), 2, jnp.int32)
    tokens, _ = greedy_generate(gcfg, prefill, step, params, prompt, aux=enc)
    ours = np.asarray(tokens)

    n = min(ref.shape[1], ours.shape[1])
    np.testing.assert_array_equal(ours[:, :n], ref[:, :n])


def test_beam_decode_with_real_cache():
    """Regression: beam tiling/gather must pass scalar cache leaves through
    (cache_index, decode pos counters)."""
    from unilm_tpu.runtime.generate import beam_generate

    hf, cfg = build_pair()
    params = convert_trocr(hf.state_dict(), cfg)
    model = TrOCRModel(cfg)
    rng = np.random.RandomState(2)
    pix = rng.randn(2, 3, 32, 32).astype(np.float32)
    enc = model.apply({"params": params}, jnp.asarray(pix.transpose(0, 2, 3, 1)),
                      method=model.encode)
    prefill, step = make_generate_fns(model, cache_size=10)
    gcfg = GenerationConfig(beam_size=4, max_new_tokens=8, pad=1, eos=2, vocab_size=100)
    tokens, scores = beam_generate(gcfg, prefill, step, params,
                                   jnp.full((2, 1), 2, jnp.int32), aux=enc)
    assert tokens.shape == (2, 4, 9)
    s = np.asarray(scores)
    assert np.isfinite(s[:, 0]).all()
    assert (np.diff(s, axis=1) <= 1e-5).all()  # sorted best-first


def test_chunked_ce_matches_dense_loss():
    """The trocr train workload's --fused_ce path (benchmarks/train_mfu.py):
    chunked-vocab CE from return_features + output_projection.T must equal
    the dense logits CE (label smoothing 0.1) — trocr-base does not tie
    embeddings, so the kernel contracts with the transposed projection."""
    from unilm_tpu.ops.fused_ce import chunked_cross_entropy
    from unilm_tpu.runtime.train import cross_entropy_loss

    hf, cfg = build_pair()
    params = convert_trocr(hf.state_dict(), cfg)
    model = TrOCRModel(cfg)
    rng = np.random.RandomState(3)
    pix = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    tok = jnp.asarray(rng.randint(3, 100, (2, 10)), jnp.int32)

    logits = model.apply({"params": params}, pix, tok[:, :-1])
    l_dense, n_dense = cross_entropy_loss(logits, tok[:, 1:],
                                          label_smoothing=0.1)

    feats = model.apply({"params": params}, pix, tok[:, :-1],
                        return_features=True)
    w = params["text_decoder"]["output_projection"]["kernel"]  # [E, V]
    l_ck, n_ck = chunked_cross_entropy(feats, w.T, tok[:, 1:], chunk=32,
                                       label_smoothing=0.1)
    assert float(n_dense) == float(n_ck)
    np.testing.assert_allclose(float(l_dense / n_dense), float(l_ck / n_ck),
                               rtol=2e-5)
