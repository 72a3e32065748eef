"""BEiT logit parity vs HuggingFace transformers (random weights, no network).

The reference's golden numbers come from published checkpoints; offline we
get the same guarantee by instantiating the HF torch model with random
weights, converting, and requiring logit agreement (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from unilm_tpu.convert.beit import convert_beit
from unilm_tpu.models.beit import BeitConfig, BeitForImageClassification


def make_hf(shared_bias: bool):
    hf_cfg = transformers.BeitConfig(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        image_size=32,
        patch_size=8,
        num_labels=10,
        use_relative_position_bias=not shared_bias,
        use_shared_relative_position_bias=shared_bias,
        layer_scale_init_value=0.1,
        use_mean_pooling=True,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = transformers.BeitForImageClassification(hf_cfg)
    model.eval()
    return model


@pytest.mark.parametrize("shared_bias", [False, True])
def test_logit_parity_hf(shared_bias):
    hf = make_hf(shared_bias)
    cfg = BeitConfig(
        img_size=32,
        patch_size=8,
        num_classes=10,
        embed_dim=64,
        num_layers=3,
        num_heads=4,
        ffn_dim=128,
        use_rel_pos_bias=not shared_bias,
        use_shared_rel_pos_bias=shared_bias,
        use_mean_pooling=True,
        init_values=0.1,
        layernorm_eps=1e-12,
        use_flash=False,
    )
    params = convert_beit(hf.state_dict(), cfg)

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(img)).logits.numpy()

    model = BeitForImageClassification(cfg)
    out = model.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_rel_pos_index_matches_hf():
    from unilm_tpu.models.beit import beit_relative_position_index
    from transformers.models.beit.modeling_beit import BeitRelativePositionBias

    hf_cfg = transformers.BeitConfig(image_size=32, patch_size=8)
    m = BeitRelativePositionBias(hf_cfg, window_size=(4, 4))
    ours = beit_relative_position_index((4, 4))
    theirs = m.generate_relative_position_index((4, 4)).numpy()
    np.testing.assert_array_equal(ours, theirs)
