"""TextDiffuser-2 two-stage pipeline (models/textdiffuser2.py).

Mirrors the reference's inference contract
(textdiffuser-2/inference_textdiffuser2_t2i_full.py:484-600): M1 plans
``keyword l,t,r,b`` lines from a caption, M2 renders conditioned on the
planned layout. Synthetic e2e: overfit the planner on a tiny caption->layout
task, then run the full plan -> rasterize -> DDIM pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unilm_tpu.models.textdiffuser import TextDiffuserConfig, TextDiffuserUNet
from unilm_tpu.models.textdiffuser2 import (
    CANVAS,
    LayoutPlannerConfig,
    LayoutPlannerLM,
    LayoutVocab,
    TextDiffuser2Pipeline,
    format_layout_text,
    layout_to_pixel_boxes,
    parse_layout_text,
    planner_example,
    planner_loss,
)


def test_vocab_layout_roundtrip():
    vocab = LayoutVocab()
    layout = [("hello", (10, 20, 90, 40)), ("world", (5, 60, 120, 100))]
    ids = vocab.encode_layout(layout)
    assert vocab.decode_layout(ids) == layout
    # malformed tail (missing coords) is dropped, not crashed on
    ids_bad = ids[:-1] + vocab.encode_text("junk") + [vocab.SEP, vocab.EOS]
    assert vocab.decode_layout(ids_bad)[: len(layout)] == layout


def test_plaintext_grammar_roundtrip():
    layout = [("Summer Vibe", (20, 20, 100, 40)), ("2024", (30, 60, 70, 80))]
    text = format_layout_text(layout)
    assert parse_layout_text(text) == layout
    # reference junk filters (t2i_full.py:562): '###', '.com', empty lines
    noisy = "### header\nvisit foo.com 1,2,3,4\n\n" + text + "\nnobox\n"
    assert parse_layout_text(noisy) == layout
    # coordinates clamped to the canvas
    assert parse_layout_text("big 0,0,500,500") == [("big", (0, 0, CANVAS, CANVAS))]


def test_layout_to_pixel_boxes_scaling():
    boxes = layout_to_pixel_boxes([("hi", (0, 0, 64, 64))], img_size=32)
    assert boxes == [("hi", (0, 0, 16, 16))]
    # degenerate box gets at least 1px, stays in bounds
    [(w, (x0, y0, x1, y1))] = layout_to_pixel_boxes(
        [("x", (127, 127, 127, 127))], img_size=32)
    assert x1 > x0 and y1 > y0 and x1 <= 32 and y1 <= 32


def _tiny_planner():
    cfg = LayoutPlannerConfig(
        embed_dim=64, ffn_dim=128, num_layers=2, num_heads=2, max_positions=128)
    return LayoutPlannerLM(cfg)


@pytest.mark.slow
def test_planner_overfits_and_pipeline_runs():
    """Train M1 on two caption->layout pairs until greedy decode reproduces
    them, then drive the full two-stage pipeline."""
    import optax

    vocab = LayoutVocab()
    data = [
        ("a poster of cats", [("cats", (16, 16, 112, 48))]),
        ("sale banner", [("sale", (8, 40, 64, 72)), ("now", (72, 40, 120, 72))]),
    ]
    max_len = 64
    toks, masks = zip(*(planner_example(vocab, c, l, max_len) for c, l in data))
    tokens = jnp.asarray(np.stack(toks))
    loss_mask = jnp.asarray(np.stack(masks))

    model = _tiny_planner()
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(
            lambda p: planner_loss(model, p, tokens, loss_mask))(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    loss0 = None
    for i in range(1200):
        params, opt, loss = step(params, opt)
        if loss0 is None:
            loss0 = float(loss)
        if float(loss) < 0.01:
            break
    assert float(loss) < 0.05, f"planner failed to overfit: {loss0} -> {float(loss)}"

    unet_cfg = TextDiffuserConfig(img_size=16, base_channels=8,
                                  channel_mults=(1, 2), time_dim=32)
    unet = TextDiffuserUNet(unet_cfg)
    unet_params = unet.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 16, 16), jnp.int32))["params"]

    pipe = TextDiffuser2Pipeline(
        planner=model, planner_params=params,
        unet=unet, unet_params=unet_params,
        prompt_len=32, max_new_tokens=32)

    for caption, layout in data:
        assert pipe.plan(caption) == layout, caption

    img, layout = pipe("a poster of cats", jax.random.PRNGKey(2), steps=4)
    assert img.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(img).all())
    assert layout == data[0][1]
