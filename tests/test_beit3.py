"""BEiT-3 / Multiway tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.core import Encoder, TransformerConfig
from unilm_tpu.models.beit3 import (
    BEiT3Config,
    BEiT3ForCaptioning,
    BEiT3ForImageClassification,
    BEiT3ForRetrieval,
    BEiT3Model,
    captioning_attn_bias,
)


def tiny_cfg(**kw):
    d = dict(
        vocab_size=50, embed_dim=32, num_layers=2, num_heads=4, ffn_dim=64,
        img_size=16, patch_size=8, max_text_len=16, use_flash=False,
        num_classes=7,
    )
    d.update(kw)
    return BEiT3Config(**d)


def test_multiway_equivalence_when_experts_equal():
    """With B params copied from A, multiway == single-expert encoder."""
    cfg = TransformerConfig(
        embed_dim=32, ffn_dim=64, num_layers=1, num_heads=4, multiway=True,
        subln=True, use_flash=False,
    )
    enc = Encoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    mask = jnp.array([False, False, False, True, True, True])
    params = enc.init(jax.random.PRNGKey(1), x, multiway_split_mask=mask)["params"]

    def copy_a_to_b(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                out[k] = copy_a_to_b(v)
            if "A" in out and "B" in out:
                out["B"] = jax.tree.map(lambda a: a, out["A"])
            if "ffn_A" in out and "ffn_B" in out:
                out["ffn_B"] = jax.tree.map(lambda a: a, out["ffn_A"])
            return out
        return tree

    params_eq = copy_a_to_b(params)
    y_all_a = enc.apply({"params": params_eq}, x,
                        multiway_split_mask=jnp.zeros(6, bool))
    y_split = enc.apply({"params": params_eq}, x, multiway_split_mask=mask)
    np.testing.assert_allclose(np.asarray(y_all_a), np.asarray(y_split), atol=1e-5)


def test_multiway_experts_differ():
    cfg = TransformerConfig(
        embed_dim=32, ffn_dim=64, num_layers=1, num_heads=4, multiway=True,
        use_flash=False,
    )
    enc = Encoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 32))
    mask = jnp.array([False] * 3 + [True] * 3)
    params = enc.init(jax.random.PRNGKey(1), x, multiway_split_mask=mask)["params"]
    y0 = enc.apply({"params": params}, x, multiway_split_mask=jnp.zeros(6, bool))
    y1 = enc.apply({"params": params}, x, multiway_split_mask=mask)
    # text-half outputs must differ (different expert), vision half too
    # (attention mixes), but at least something differs
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-4


def test_beit3_modalities():
    cfg = tiny_cfg()
    model = BEiT3Model(cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    txt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 4, 50)
    pad = jnp.zeros((2, 5), bool).at[1, 3:].set(True)
    params = model.init(jax.random.PRNGKey(2), txt, img, pad)["params"]

    both, split = model.apply({"params": params}, txt, img, pad)
    assert both.shape == (2, cfg.num_vision_tokens + 5, 32)
    assert split == cfg.num_vision_tokens

    vis_only, s2 = model.apply({"params": params}, None, img)
    assert vis_only.shape == (2, cfg.num_vision_tokens, 32)
    txt_only, s3 = model.apply({"params": params}, txt, None, pad)
    assert txt_only.shape == (2, 5, 32)
    assert s3 == 0  # all-text -> everything through B expert


def test_beit3_heads():
    cfg = tiny_cfg()
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    txt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 4, 50)

    clf = BEiT3ForImageClassification(cfg)
    p = clf.init(jax.random.PRNGKey(2), img)["params"]
    assert clf.apply({"params": p}, img).shape == (2, 7)

    ret = BEiT3ForRetrieval(cfg)
    p = ret.init(jax.random.PRNGKey(3), img, txt)["params"]
    sim = ret.apply({"params": p}, img, txt)
    assert sim.shape == (2, 2)
    v = ret.apply({"params": p}, img, method=ret.encode_image)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-4)

    cap = BEiT3ForCaptioning(cfg)
    p = cap.init(jax.random.PRNGKey(4), img, txt)["params"]
    logits = cap.apply({"params": p}, img, txt)
    assert logits.shape == (2, 5, 50)


def test_captioning_mask_causality():
    """Future text must not influence past text logits."""
    cfg = tiny_cfg()
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    txt = jax.random.randint(jax.random.PRNGKey(1), (1, 5), 4, 50)
    cap = BEiT3ForCaptioning(cfg)
    p = cap.init(jax.random.PRNGKey(4), img, txt)["params"]
    l1 = cap.apply({"params": p}, img, txt)
    txt2 = txt.at[0, 4].set((txt[0, 4] + 1) % 50)
    l2 = cap.apply({"params": p}, img, txt2)
    np.testing.assert_allclose(
        np.asarray(l1)[:, :4], np.asarray(l2)[:, :4], atol=1e-5
    )
    assert np.abs(np.asarray(l1)[:, 4] - np.asarray(l2)[:, 4]).max() > 1e-4


def test_vqa_and_nlvr_heads():
    from unilm_tpu.models.beit3 import (
        BEiT3ForVisualQuestionAnswering,
        BEiT3ForVisualReasoning,
    )

    cfg = tiny_cfg()
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    txt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 4, 50)

    vqa = BEiT3ForVisualQuestionAnswering(cfg, num_answers=11)
    p = vqa.init(jax.random.PRNGKey(2), img, txt)["params"]
    assert vqa.apply({"params": p}, img, txt).shape == (2, 11)

    nlvr = BEiT3ForVisualReasoning(cfg)
    p = nlvr.init(jax.random.PRNGKey(3), img, img, txt)["params"]
    assert nlvr.apply({"params": p}, img, img, txt).shape == (2, 2)


def test_segmentation_head():
    from unilm_tpu.models.beit import BeitConfig
    from unilm_tpu.models.segmentation import BeitForSemanticSegmentation, UperNetConfig

    bcfg = BeitConfig(img_size=32, patch_size=8, embed_dim=32, num_layers=4,
                      num_heads=4, ffn_dim=64, use_mean_pooling=False,
                      use_flash=False)
    cfg = UperNetConfig(beit=bcfg, out_indices=(0, 1, 2, 3), channels=32,
                        num_classes=7)
    m = BeitForSemanticSegmentation(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    p = m.init(jax.random.PRNGKey(1), imgs)["params"]
    out = m.apply({"params": p}, imgs)
    assert out.shape == (1, 32, 32, 7)


def test_vlmo_heads():
    from unilm_tpu.models.vlmo import VLMoForImageTextMatching, VLMoForMaskedLM

    cfg = tiny_cfg()
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    txt = jax.random.randint(jax.random.PRNGKey(1), (2, 5), 4, 50)
    itm = VLMoForImageTextMatching(cfg)
    p = itm.init(jax.random.PRNGKey(2), img, txt)["params"]
    assert itm.apply({"params": p}, img, txt).shape == (2, 2)
    mlm = VLMoForMaskedLM(cfg)
    p = mlm.init(jax.random.PRNGKey(3), img, txt)["params"]
    assert mlm.apply({"params": p}, img, txt).shape == (2, 5, 50)
