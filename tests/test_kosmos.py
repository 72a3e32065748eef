"""Kosmos/UniGPT tests: Pix2Struct tower parity vs HF, splice semantics,
prefill+decode parity on the full multimodal path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from unilm_tpu.convert.kosmos import convert_pix2struct_vision
from unilm_tpu.models.kosmos import (
    Pix2StructVisionConfig,
    Pix2StructVisionEncoder,
    UniGPT,
    UniGPTConfig,
    make_unigpt_generate_fns,
    splice_image_features,
)


def test_pix2struct_tower_parity():
    hf_cfg = transformers.Pix2StructVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        d_ff=64, d_kv=8, patch_embed_hidden_size=48, seq_len=64,
        dropout_rate=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.Pix2StructVisionModel(hf_cfg).eval()

    cfg = Pix2StructVisionConfig(
        hidden_size=32, num_layers=2, num_heads=4, d_ff=64, d_kv=8,
        patch_dim=48, max_rows=64, use_flash=False,
    )
    params = convert_pix2struct_vision(hf.state_dict(), 2)

    rng = np.random.RandomState(0)
    B, N = 2, 12
    fp = np.zeros((B, N, 2 + 48), np.float32)
    fp[:, :10, 2:] = rng.randn(B, 10, 48)
    fp[:, :10, 0] = rng.randint(1, 5, (B, 10))
    fp[:, :10, 1] = rng.randint(1, 5, (B, 10))
    # rows 10..12 stay zero = padding

    with torch.no_grad():
        ref = hf(flattened_patches=torch.from_numpy(fp)).last_hidden_state.numpy()

    model = Pix2StructVisionEncoder(cfg)
    out, mask = model.apply({"params": params}, jnp.asarray(fp))
    np.testing.assert_allclose(
        np.asarray(out)[:, :10], ref[:, :10], atol=3e-4, rtol=1e-3
    )
    assert not np.asarray(mask)[:, 10:].any()


def test_splice_matches_boolean_scatter():
    rng = np.random.RandomState(0)
    B, T, Q, E = 2, 10, 3, 4
    emb = rng.randn(B, T, E).astype(np.float32)
    img = rng.randn(B, Q, E).astype(np.float32)
    mask = np.zeros((B, T), bool)
    mask[0, [2, 3, 4]] = True
    mask[1, [5, 6, 7]] = True

    # torch-style boolean scatter (gpt.py:233-234)
    ref = emb.copy()
    ref[mask] = img.reshape(-1, E)

    out = splice_image_features(jnp.asarray(emb), jnp.asarray(img), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def tiny_cfg(**kw):
    d = dict(
        vocab_size=60, embed_dim=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_positions=64, subln=True, xpos_rel_pos=True, use_flash=False,
        image_tower=None, scale_embedding=True, share_input_output_embed=True,
    )
    d.update(kw)
    return UniGPTConfig(**d)


def test_unigpt_prefill_decode_parity():
    cfg = tiny_cfg()
    model = UniGPT(cfg)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 12), 4, 60)
    params = model.init(jax.random.PRNGKey(1), tokens)["params"]
    full = model.apply({"params": params}, tokens)

    prefill, step = make_unigpt_generate_fns(model, cache_size=12)
    logits, cache = prefill(params, tokens[:, :5], None)
    # prefill returns last-position logits only (TTFT optimization)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, 4:5]), atol=2e-4, rtol=1e-3
    )
    outs = []
    for t in range(5, 12):
        lg, cache = step(params, tokens[:, t : t + 1], cache, None)
        outs.append(lg)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc), np.asarray(full[:, 5:]), atol=2e-4, rtol=1e-3
    )


def test_unigpt_multimodal_forward_and_decode():
    cfg = tiny_cfg(
        image_tower="pix2struct", latent_query_num=4,
        pix2struct=Pix2StructVisionConfig(
            hidden_size=16, num_layers=1, num_heads=2, d_ff=32, d_kv=8,
            patch_dim=12, max_rows=16, use_flash=False,
        ),
        segment_emb=True,
    )
    model = UniGPT(cfg)
    B, T, Q = 2, 14, 4
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, T), 4, 60)
    img_mask = jnp.zeros((B, T), bool).at[:, 2:6].set(True)
    segs = jnp.zeros((B, T), jnp.int32).at[:, 2:6].set(1)
    patches = jax.random.normal(jax.random.PRNGKey(2), (B, 6, 2 + 12))

    variables = model.init(
        jax.random.PRNGKey(1), tokens, patches, img_mask, segs
    )
    params = variables["params"]
    full = model.apply({"params": params}, tokens, patches, img_mask, segs)
    assert full.shape == (B, T, 60)
    assert np.isfinite(np.asarray(full)).all()

    # generation path: image features computed once, then prefill+decode
    img_feats = model.apply({"params": params}, patches, method=model.encode_image)
    assert img_feats.shape == (B, Q, 32)
    prefill, step = make_unigpt_generate_fns(model, cache_size=T + 4)
    logits, cache = prefill(params, tokens, (img_feats, img_mask, segs))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full[:, -1:]), atol=2e-4, rtol=1e-3
    )
    lg, cache = step(params, tokens[:, -1:], cache, None)
    assert lg.shape == (B, 1, 60)


def test_kosmos2_clip_pipeline():
    """Kosmos-2 preset end-to-end: CLIP tower -> resampler -> splice ->
    decode (tiny dims)."""
    from unilm_tpu.models.kosmos import ClipVisionConfig, UniGPTConfig, UniGPT

    cfg = UniGPTConfig(
        vocab_size=60, embed_dim=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_positions=64, subln=True, xpos_rel_pos=True, use_flash=False,
        image_tower="clip", latent_query_num=4,
        clip=ClipVisionConfig(img_size=16, patch_size=8, embed_dim=24,
                              num_layers=1, num_heads=4, ffn_dim=48,
                              use_flash=False),
    )
    model = UniGPT(cfg)
    B, T = 1, 10
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, T), 4, 60)
    img_mask = jnp.zeros((B, T), bool).at[:, 2:6].set(True)
    images = jax.random.normal(jax.random.PRNGKey(2), (B, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), tokens, images, img_mask)["params"]
    logits = model.apply({"params": params}, tokens, images, img_mask)
    assert logits.shape == (B, T, 60)
    assert np.isfinite(np.asarray(logits)).all()
    feats = model.apply({"params": params}, images, method=model.encode_image)
    assert feats.shape == (B, 4, 32)


def test_unigpt_audio_tower_pipeline():
    """Audio tower (wavLM) -> resampler -> splice -> decode: the third
    pluggable tower slot (unigpt.py:170-187 aud_model/aud_connector;
    gpt.py:264-265 audio embed scatter)."""
    from unilm_tpu.models.kosmos import UniGPT, UniGPTConfig
    from unilm_tpu.models.wavlm import WavLMConfig

    wcfg = WavLMConfig(hidden_size=16, num_layers=1, num_heads=2, ffn_dim=32,
                       conv_dim=(8, 8), conv_stride=(5, 2), conv_kernel=(10, 3),
                       num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4, num_buckets=32,
                       max_bucket_distance=100)
    cfg = UniGPTConfig(
        vocab_size=60, embed_dim=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_positions=64, subln=True, xpos_rel_pos=True, use_flash=False,
        audio_tower="wavlm", audio_latent_query_num=4, wavlm=wcfg,
    )
    model = UniGPT(cfg)
    B, T = 2, 12
    tokens = jax.random.randint(jax.random.PRNGKey(0), (B, T), 4, 60)
    aud_mask = jnp.zeros((B, T), bool).at[:, 3:7].set(True)
    audio = jax.random.normal(jax.random.PRNGKey(2), (B, 400))
    params = model.init(
        jax.random.PRNGKey(1), tokens,
        aud_inputs=audio, aud_gpt_input_mask=aud_mask)["params"]
    logits = model.apply({"params": params}, tokens,
                         aud_inputs=audio, aud_gpt_input_mask=aud_mask)
    assert logits.shape == (B, T, 60)
    assert np.isfinite(np.asarray(logits)).all()
    feats = model.apply({"params": params}, audio, method=model.encode_audio)
    assert feats.shape == (B, 4, 32)

    # splice parity: the masked positions carry EXACTLY the resampled
    # audio features through the embedding (mirrors the image-splice tests)
    from unilm_tpu.models.kosmos import splice_image_features

    emb = model.apply({"params": params}, tokens, method=lambda m, t: m.embed_tokens(t))
    spliced = splice_image_features(emb, feats, aud_mask)
    np.testing.assert_allclose(
        np.asarray(spliced[0, 3:7]), np.asarray(feats[0, :4]), rtol=1e-6)
    # text positions untouched
    np.testing.assert_allclose(
        np.asarray(spliced[:, 0]), np.asarray(emb[:, 0]), rtol=1e-6)

    # towers compose: image + audio in one sequence
    from unilm_tpu.models.kosmos import ClipVisionConfig

    cfg2 = UniGPTConfig(
        vocab_size=60, embed_dim=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_positions=64, use_flash=False,
        image_tower="clip", latent_query_num=2,
        clip=ClipVisionConfig(img_size=16, patch_size=8, embed_dim=24,
                              num_layers=1, num_heads=4, ffn_dim=48,
                              use_flash=False),
        audio_tower="wavlm", audio_latent_query_num=2, wavlm=wcfg,
    )
    m2 = UniGPT(cfg2)
    img_mask = jnp.zeros((B, T), bool).at[:, 1:3].set(True)
    amask2 = jnp.zeros((B, T), bool).at[:, 5:7].set(True)
    images = jax.random.normal(jax.random.PRNGKey(3), (B, 16, 16, 3))
    p2 = m2.init(jax.random.PRNGKey(4), tokens, images, img_mask,
                 aud_inputs=audio, aud_gpt_input_mask=amask2)["params"]
    lg = m2.apply({"params": p2}, tokens, images, img_mask,
                  aud_inputs=audio, aud_gpt_input_mask=amask2)
    assert lg.shape == (B, T, 60)
    assert np.isfinite(np.asarray(lg)).all()
