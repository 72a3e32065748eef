"""LayoutLMv3 logit parity vs HF transformers (random weights, offline)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from unilm_tpu.convert.layoutlmv3 import convert_layoutlmv3
from unilm_tpu.models.layoutlmv3 import (
    LayoutLMv3Config,
    LayoutLMv3ForTokenClassification,
)


def build_pair(visual: bool):
    hf_cfg = transformers.LayoutLMv3Config(
        vocab_size=100,
        hidden_size=72,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=60,
        coordinate_size=12,
        shape_size=12,
        input_size=32,
        patch_size=16,
        num_labels=5,
        visual_embed=visual,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        type_vocab_size=2,
    )
    torch.manual_seed(0)
    hf = transformers.LayoutLMv3ForTokenClassification(hf_cfg).eval()
    cfg = LayoutLMv3Config(
        vocab_size=100,
        hidden_size=72,
        num_layers=2,
        num_heads=4,
        ffn_dim=128,
        max_positions=60,
        coordinate_size=12,
        shape_size=12,
        input_size=32,
        patch_size=16,
        num_labels=5,
        type_vocab_size=2,
        visual_embed=visual,
        use_flash=False,
    )
    return hf, cfg


@pytest.mark.parametrize("visual", [False, True])
def test_token_classification_parity(visual):
    hf, cfg = build_pair(visual)
    params = convert_layoutlmv3(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    B, L = 2, 18
    ids = rng.randint(2, 100, (B, L)).astype(np.int64)
    ids[:, 0] = 0
    ids[0, 14:] = 1  # pad (pad_token_id=1)
    mask = (ids != 1).astype(np.int64)
    x0 = rng.randint(0, 500, (B, L, 1))
    y0 = rng.randint(0, 500, (B, L, 1))
    bbox = np.concatenate(
        [x0, y0, x0 + rng.randint(1, 400, (B, L, 1)), y0 + rng.randint(1, 400, (B, L, 1))],
        axis=-1,
    ).astype(np.int64)
    kwargs = {}
    images_jax = None
    if visual:
        pix = rng.randn(B, 3, 32, 32).astype(np.float32)
        kwargs["pixel_values"] = torch.from_numpy(pix)
        images_jax = jnp.asarray(pix.transpose(0, 2, 3, 1))

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            bbox=torch.from_numpy(bbox),
            attention_mask=torch.from_numpy(mask),
            **kwargs,
        ).logits.numpy()

    model = LayoutLMv3ForTokenClassification(cfg)
    out = model.apply(
        {"params": params},
        jnp.asarray(ids),
        jnp.asarray(bbox),
        attention_mask=jnp.asarray(mask),
        images=images_jax,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=1e-3)
