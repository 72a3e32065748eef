"""WavLM parity vs HF (random weights, offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from unilm_tpu.convert.wavlm import convert_wavlm
from unilm_tpu.models.wavlm import WavLMConfig, WavLMModel


def test_wavlm_parity():
    hf_cfg = transformers.WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, num_buckets=8, max_bucket_distance=20,
        do_stable_layer_norm=False, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, activation_dropout=0.0, layerdrop=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.WavLMModel(hf_cfg).eval()

    cfg = WavLMConfig(
        hidden_size=32, num_layers=2, num_heads=4, ffn_dim=64,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=8, max_bucket_distance=20,
    )
    params = convert_wavlm(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    audio = rng.randn(2, 400).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(audio)).last_hidden_state.numpy()

    model = WavLMModel(cfg)
    out = model.apply({"params": params}, jnp.asarray(audio))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=1e-3)


def test_beats_encoder_and_tokenizer():
    import jax
    import jax.numpy as jnp

    from unilm_tpu.models.beats import (
        BEATsConfig,
        BEATsForAudioClassification,
        BEATsTokenizer,
    )

    cfg = BEATsConfig(
        embed_dim=32, num_layers=2, num_heads=4, ffn_dim=64, patch_size=8,
        mel_bins=16, num_classes=10, codebook_size=32, codebook_dim=8,
        use_flash=False,
    )
    spec = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16))
    clf = BEATsForAudioClassification(cfg)
    v = clf.init(jax.random.PRNGKey(1), spec)
    out = clf.apply(v, spec)
    assert out.shape == (2, 10)

    tok = BEATsTokenizer(cfg)
    v = tok.init(jax.random.PRNGKey(2), spec)
    ids = tok.apply(v, spec, method=tok.get_codebook_indices)
    assert ids.shape == (2, 8)  # (32/8)*(16/8)
    assert int(ids.max()) < 32


def test_vit_fpn_backbone():
    import jax
    import jax.numpy as jnp

    from unilm_tpu.models.beit import BeitConfig
    from unilm_tpu.models.detection import ViTDetBackboneConfig, ViTFPNBackbone

    bcfg = BeitConfig(img_size=32, patch_size=8, embed_dim=32, num_layers=2,
                      num_heads=4, ffn_dim=64, use_mean_pooling=False,
                      use_flash=False)
    cfg = ViTDetBackboneConfig(beit=bcfg, out_channels=16)
    m = ViTFPNBackbone(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(1), imgs)
    feats = m.apply(v, imgs)
    assert feats["p2"].shape == (1, 16, 16, 16)
    assert feats["p3"].shape == (1, 8, 8, 16)
    assert feats["p4"].shape == (1, 4, 4, 16)
    assert feats["p5"].shape == (1, 2, 2, 16)


def test_speecht5_asr_and_tts():
    import jax
    import jax.numpy as jnp

    from unilm_tpu.models.speecht5 import SpeechT5Config, SpeechT5Model

    cfg = SpeechT5Config(
        vocab_size=50, hidden_size=32, enc_layers=1, dec_layers=1, num_heads=4,
        ffn_dim=64, mel_bins=8, reduction_factor=2, speaker_dim=6,
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        max_positions=64, use_flash=False,
    )
    m = SpeechT5Model(cfg)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 400))
    prev = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0, 50)
    params = m.init(jax.random.PRNGKey(2), audio, prev)["params"]

    logits = m.apply({"params": params}, audio, prev)
    assert logits.shape == (2, 6, 50)

    toks = jax.random.randint(jax.random.PRNGKey(3), (2, 7), 0, 50)
    prev_mels = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 8 * 2))
    spk = jax.random.normal(jax.random.PRNGKey(5), (2, 6))
    # tts params include postnet; init via method
    variables = m.init(jax.random.PRNGKey(6), toks, prev_mels, spk,
                       method=m.tts_forward)
    before, after, stop = m.apply(variables, toks, prev_mels, spk,
                                  method=m.tts_forward)
    assert before.shape == (2, 10, 8)
    assert after.shape == (2, 10, 8)
    assert stop.shape == (2, 10)
