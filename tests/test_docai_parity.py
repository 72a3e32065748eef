"""LayoutLM v1 + MarkupLM parity vs HF (random weights, offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from unilm_tpu.convert.docai import convert_layoutlm, convert_markuplm
from unilm_tpu.models.layoutlm import LayoutLMConfig, LayoutLMForTokenClassification
from unilm_tpu.models.markuplm import MarkupLMConfig, MarkupLMForTokenClassification


def test_layoutlm_v1_parity():
    hf_cfg = transformers.LayoutLMConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40,
        max_2d_position_embeddings=64, num_labels=5,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.LayoutLMForTokenClassification(hf_cfg).eval()
    cfg = LayoutLMConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_positions=40, max_2d_positions=64, num_labels=5, use_flash=False,
    )
    params = convert_layoutlm(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(1, 100, (2, 10))
    x0 = rng.randint(0, 30, (2, 10, 1))
    y0 = rng.randint(0, 30, (2, 10, 1))
    bbox = np.concatenate([x0, y0, x0 + 20, y0 + 20], -1)
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids), bbox=torch.from_numpy(bbox),
            attention_mask=torch.from_numpy(mask),
        ).logits.numpy()
    model = LayoutLMForTokenClassification(cfg)
    out = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(bbox),
                      attention_mask=jnp.asarray(mask))
    # padded positions can differ; compare valid positions
    np.testing.assert_allclose(np.asarray(out)[0], ref[0], atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out)[1, :7], ref[1, :7], atol=3e-4, rtol=1e-3)


def test_markuplm_parity():
    hf_cfg = transformers.MarkupLMConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40, max_depth=4,
        max_xpath_tag_unit_embeddings=16, max_xpath_subs_unit_embeddings=20,
        xpath_unit_hidden_size=8, num_labels=5, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        pad_token_id=1,
    )
    torch.manual_seed(0)
    hf = transformers.MarkupLMForTokenClassification(hf_cfg).eval()
    cfg = MarkupLMConfig(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_positions=40, max_depth=4, max_xpath_tag_units=16,
        max_xpath_subs_units=20, xpath_unit_hidden=8, num_labels=5,
        pad_token_id=1, use_flash=False,
    )
    params = convert_markuplm(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(2, 100, (2, 9))
    tags = rng.randint(0, 16, (2, 9, 4))
    subs = rng.randint(0, 20, (2, 9, 4))
    mask = np.ones((2, 9), np.int64)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            xpath_tags_seq=torch.from_numpy(tags),
            xpath_subs_seq=torch.from_numpy(subs),
            attention_mask=torch.from_numpy(mask),
        ).logits.numpy()
    model = MarkupLMForTokenClassification(cfg)
    out = model.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(tags), jnp.asarray(subs),
        attention_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)


def test_layoutlmv2_forward_and_re_head():
    from unilm_tpu.models.layoutlmv2 import (
        LayoutLMv2Config,
        LayoutLMv2ForTokenClassification,
        RelationExtractionHead,
    )

    cfg = LayoutLMv2Config(
        vocab_size=100, hidden_size=32, num_layers=2, num_heads=4, ffn_dim=64,
        max_positions=80, coordinate_size=6, shape_size=4,
        image_feature_pool_shape=(2, 2), backbone_channels=(8, 16),
        num_labels=5, use_flash=False,
    )
    # concat spatial dims must sum to hidden: 4*6+2*4 = 32 ✓
    rng = np.random.RandomState(0)
    B, L = 2, 10
    ids = rng.randint(1, 100, (B, L))
    x0 = rng.randint(0, 500, (B, L, 1)); y0 = rng.randint(0, 500, (B, L, 1))
    bbox = np.concatenate([x0, y0, x0 + 100, y0 + 100], -1)
    imgs = rng.randn(B, 32, 32, 3).astype(np.float32)

    m = LayoutLMv2ForTokenClassification(cfg)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(bbox),
               images=jnp.asarray(imgs))["params"]
    out = m.apply({"params": p}, jnp.asarray(ids), jnp.asarray(bbox),
                  images=jnp.asarray(imgs))
    assert out.shape == (B, L, 5)
    assert np.isfinite(np.asarray(out)).all()
    # no-image path shares params
    out2 = m.apply({"params": p}, jnp.asarray(ids), jnp.asarray(bbox))
    assert out2.shape == (B, L, 5)

    re = RelationExtractionHead(hidden_size=32, num_relations=3)
    seq = jnp.asarray(rng.randn(B, L, 32).astype(np.float32))
    hidx = jnp.asarray(rng.randint(0, L, (B, 4)))
    tidx = jnp.asarray(rng.randint(0, L, (B, 4)))
    pr = re.init(jax.random.PRNGKey(1), seq, hidx, tidx)["params"]
    logits = re.apply({"params": pr}, seq, hidx, tidx)
    assert logits.shape == (B, 4, 3)
