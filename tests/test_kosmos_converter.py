"""Real-checkpoint converter proof (VERDICT round-1 #8).

Synthesizes a fairseq-format kosmos state dict with the EXACT key layout of
the reference (UniGPTmodel: gpt_model.decoder.* per kosmos2_5/models/gpt.py
+ unigpt.py:58-61, img_model.* = HF Pix2StructVisionModel naming,
img_connector.* per connector.py), converts it with convert/kosmos.py, and
checks decoder logit parity against a minimal torch reimplementation of the
torchscale LMDecoder hot path (subln + SoPE xPos with the reference's
len//2 centering + fp32 softmax + sinusoidal fairseq positions)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from unilm_tpu.convert.kosmos import convert_unigpt
from unilm_tpu.models.kosmos import (
    Pix2StructVisionConfig,
    UniGPT,
    UniGPTConfig,
    sinusoidal_table,
)

V, E, H, L, FFN = 97, 32, 4, 2, 64
D = E // H
SCALE_BASE = 512


def tiny_cfg(**kw):
    return UniGPTConfig(
        vocab_size=V, embed_dim=E, num_layers=L, num_heads=H, ffn_dim=FFN,
        max_positions=64, subln=True, xpos_rel_pos=True, segment_emb=True,
        image_tower="pix2struct", latent_query_num=4,
        pix2struct=Pix2StructVisionConfig(
            hidden_size=16, num_layers=1, num_heads=2, d_ff=32, d_kv=8,
            patch_dim=12, max_rows=8, use_flash=False,
        ),
        use_flash=False, **kw,
    )


def make_fairseq_state_dict(seed=0):
    """Exact reference key layout, random weights."""
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {}
    dp = "gpt_model.decoder."
    sd[dp + "embed_tokens.weight"] = r(V, E)
    sd[dp + "output_projection.weight"] = sd[dp + "embed_tokens.weight"]  # tied
    sd[dp + "segment_emb.weight"] = r(2, E)
    for i in range(L):
        p = f"{dp}layers.{i}."
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[p + f"self_attn.{n}.weight"] = r(E, E)
            sd[p + f"self_attn.{n}.bias"] = r(E)
        sd[p + "self_attn.inner_attn_ln.weight"] = 1 + 0.1 * r(E)
        sd[p + "self_attn.inner_attn_ln.bias"] = 0.1 * r(E)
        sd[p + "self_attn_layer_norm.weight"] = 1 + 0.1 * r(E)
        sd[p + "self_attn_layer_norm.bias"] = 0.1 * r(E)
        sd[p + "ffn.fc1.weight"] = r(FFN, E)
        sd[p + "ffn.fc1.bias"] = r(FFN)
        sd[p + "ffn.fc2.weight"] = r(E, FFN)
        sd[p + "ffn.fc2.bias"] = r(E)
        sd[p + "ffn.ffn_layernorm.weight"] = 1 + 0.1 * r(FFN)
        sd[p + "ffn.ffn_layernorm.bias"] = 0.1 * r(FFN)
        sd[p + "final_layer_norm.weight"] = 1 + 0.1 * r(E)
        sd[p + "final_layer_norm.bias"] = 0.1 * r(E)
    sd[dp + "layer_norm.weight"] = 1 + 0.1 * r(E)
    sd[dp + "layer_norm.bias"] = 0.1 * r(E)

    # img_model: HF Pix2StructVisionModel key layout
    ip = "img_model."
    sd[ip + "embeddings.patch_projection.weight"] = r(16, 12)
    sd[ip + "embeddings.patch_projection.bias"] = r(16)
    sd[ip + "embeddings.row_embedder.weight"] = r(8, 16)
    sd[ip + "embeddings.column_embedder.weight"] = r(8, 16)
    lp = ip + "encoder.layer.0."
    for n, shape in (
        ("attention.query", (16, 16)), ("attention.key", (16, 16)),
        ("attention.value", (16, 16)), ("attention.output", (16, 16)),
        ("mlp.wi_0", (32, 16)), ("mlp.wi_1", (32, 16)), ("mlp.wo", (16, 32)),
    ):
        sd[lp + n + ".weight"] = r(*shape)
    sd[lp + "pre_attention_layer_norm.weight"] = 1 + 0.1 * r(16)
    sd[lp + "pre_mlp_layer_norm.weight"] = 1 + 0.1 * r(16)
    sd[ip + "layernorm.weight"] = 1 + 0.1 * r(16)

    # img_connector: XConnector (connector.py:10-28)
    sd["img_connector.dense.weight"] = r(E, 16)
    sd["img_connector.dense.bias"] = r(E)
    sd["img_connector.latent_query"] = r(4, E)
    for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
        sd[f"img_connector.x_attn.{n}.weight"] = r(E, E)
        sd[f"img_connector.x_attn.{n}.bias"] = r(E)
    return sd


# --------------------------------------------------------------------------- #
# Minimal torch reimplementation of the torchscale LMDecoder text path
# (decoder.py:211-499 + multihead_attention.py:80-176 + sope, reference
# centering len//2)
# --------------------------------------------------------------------------- #

def _ln(x, w, b, eps=1e-5):
    return torch.nn.functional.layer_norm(x, x.shape[-1:], w, b, eps)


def _rotate_every_two(x):
    x1, x2 = x[..., ::2], x[..., 1::2]
    return torch.stack((-x2, x1), dim=-1).reshape(x.shape)


def _dup(m):
    return m.repeat_interleave(2, dim=-1)


def torch_lmdecoder_logits(sd, tokens, segs):
    sd = {k.removeprefix("gpt_model.decoder."): v.double()
          for k, v in sd.items() if k.startswith("gpt_model.decoder.")}
    T = tokens.shape[1]
    x = sd["embed_tokens.weight"][tokens] * math.sqrt(E)
    table = torch.from_numpy(sinusoidal_table(64 + 2, E, 1)).double()
    pos = torch.arange(T) + 2  # padding_idx + 1 + step
    x = x + table[pos][None]
    x = x + sd["segment_emb.weight"][segs]

    # SoPE at the reference's centering (sope_relative_position.py:30-35)
    half = D // 2
    base = (torch.arange(0, D, 2).double() + 0.4 * D) / (1.4 * D)
    power = (torch.arange(T).double() - T // 2) / SCALE_BASE
    scale = base[None, :] ** power[:, None]                # [T, D/2]
    inv_freq = 1.0 / (10000 ** (torch.arange(half).double() / half))
    sinusoid = torch.arange(T).double()[:, None] * inv_freq[None, :]
    sin, cos = torch.sin(sinusoid), torch.cos(sinusoid)

    def rot(v, s):
        return v * _dup(cos * s) + _rotate_every_two(v) * _dup(sin * s)

    causal = torch.triu(torch.full((T, T), float("-inf"), dtype=torch.float64), 1)
    for i in range(L):
        p = f"layers.{i}."
        h = _ln(x, sd[p + "self_attn_layer_norm.weight"],
                sd[p + "self_attn_layer_norm.bias"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T
             + sd[p + "self_attn.q_proj.bias"]).view(-1, T, H, D).transpose(1, 2)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T
             + sd[p + "self_attn.k_proj.bias"]).view(-1, T, H, D).transpose(1, 2)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T
             + sd[p + "self_attn.v_proj.bias"]).view(-1, T, H, D).transpose(1, 2)
        q = rot(q, scale)
        k = rot(k, 1.0 / scale)
        attn = torch.softmax(q @ k.transpose(-1, -2) * D**-0.5 + causal, dim=-1)
        o = (attn @ v).transpose(1, 2).reshape(-1, T, E)
        o = _ln(o, sd[p + "self_attn.inner_attn_ln.weight"],
                sd[p + "self_attn.inner_attn_ln.bias"])
        x = x + o @ sd[p + "self_attn.out_proj.weight"].T + sd[
            p + "self_attn.out_proj.bias"]
        h = _ln(x, sd[p + "final_layer_norm.weight"],
                sd[p + "final_layer_norm.bias"])
        h = torch.nn.functional.gelu(h @ sd[p + "ffn.fc1.weight"].T
                                     + sd[p + "ffn.fc1.bias"])
        h = _ln(h, sd[p + "ffn.ffn_layernorm.weight"],
                sd[p + "ffn.ffn_layernorm.bias"])
        x = x + h @ sd[p + "ffn.fc2.weight"].T + sd[p + "ffn.fc2.bias"]
    x = _ln(x, sd["layer_norm.weight"], sd["layer_norm.bias"])
    return x @ sd["embed_tokens.weight"].T


def test_converted_decoder_logit_parity():
    cfg = tiny_cfg()
    sd = make_fairseq_state_dict()
    params = convert_unigpt(sd, cfg)
    model = UniGPT(cfg)

    tokens = np.array([[0, 5, 9, 23, 41, 8, 17, 3]], np.int32)
    segs = np.array([[0, 0, 1, 1, 0, 0, 1, 0]], np.int32)
    logits = model.apply(
        {"params": params}, jnp.asarray(tokens), None, None, jnp.asarray(segs)
    )
    ref = torch_lmdecoder_logits(sd, torch.from_numpy(tokens).long(),
                                 torch.from_numpy(segs).long())
    np.testing.assert_allclose(
        np.asarray(logits, np.float64), ref.numpy(), atol=2e-4, rtol=2e-4
    )


def test_converted_multimodal_forward_runs():
    """Full converted model (decoder + pix2struct tower + connector) runs."""
    cfg = tiny_cfg()
    params = convert_unigpt(make_fairseq_state_dict(), cfg)
    model = UniGPT(cfg)
    B, T, NP = 1, 12, 4
    tokens = jnp.full((B, T), 4, jnp.int32)
    img_mask = jnp.zeros((B, T), bool).at[:, 2:6].set(True)
    segs = jnp.zeros((B, T), jnp.int32).at[:, 1:7].set(1)
    patches = jax.random.normal(jax.random.PRNGKey(0), (B, NP, 2 + 12))
    out = model.apply({"params": params}, tokens, patches, img_mask, segs)
    assert out.shape == (B, T, V)
    assert bool(jnp.isfinite(out).all())


def test_checkpoint_cli_load_end_to_end(tmp_path):
    """cli/kosmos_infer.py --checkpoint exercised with a saved .pt whose key
    layout matches the reference release format ({'model': state_dict})."""
    from PIL import Image

    from unilm_tpu.cli import kosmos_infer

    # synthesize a checkpoint matching the CLI's --tiny config
    torch_sd = {}
    g = torch.Generator().manual_seed(1)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    E2, H2, L2, FFN2, V2 = 64, 4, 2, 128, 2048
    dp = "gpt_model.decoder."
    torch_sd[dp + "embed_tokens.weight"] = r(V2, E2)
    torch_sd[dp + "segment_emb.weight"] = r(2, E2)
    for i in range(L2):
        p = f"{dp}layers.{i}."
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            torch_sd[p + f"self_attn.{n}.weight"] = r(E2, E2)
            torch_sd[p + f"self_attn.{n}.bias"] = r(E2)
        torch_sd[p + "self_attn.inner_attn_ln.weight"] = torch.ones(E2)
        torch_sd[p + "self_attn.inner_attn_ln.bias"] = torch.zeros(E2)
        torch_sd[p + "self_attn_layer_norm.weight"] = torch.ones(E2)
        torch_sd[p + "self_attn_layer_norm.bias"] = torch.zeros(E2)
        torch_sd[p + "ffn.fc1.weight"] = r(FFN2, E2)
        torch_sd[p + "ffn.fc1.bias"] = r(FFN2)
        torch_sd[p + "ffn.fc2.weight"] = r(E2, FFN2)
        torch_sd[p + "ffn.fc2.bias"] = r(E2)
        torch_sd[p + "ffn.ffn_layernorm.weight"] = torch.ones(FFN2)
        torch_sd[p + "ffn.ffn_layernorm.bias"] = torch.zeros(FFN2)
        torch_sd[p + "final_layer_norm.weight"] = torch.ones(E2)
        torch_sd[p + "final_layer_norm.bias"] = torch.zeros(E2)
    torch_sd[dp + "layer_norm.weight"] = torch.ones(E2)
    torch_sd[dp + "layer_norm.bias"] = torch.zeros(E2)
    ip = "img_model."
    torch_sd[ip + "embeddings.patch_projection.weight"] = r(32, 768)
    torch_sd[ip + "embeddings.patch_projection.bias"] = r(32)
    torch_sd[ip + "embeddings.row_embedder.weight"] = r(4096, 32)
    torch_sd[ip + "embeddings.column_embedder.weight"] = r(4096, 32)
    lp = ip + "encoder.layer.0."
    for n, shape in (
        # inner attention dim = num_heads * d_kv = 2 * 16 = 32
        ("attention.query", (32, 32)), ("attention.key", (32, 32)),
        ("attention.value", (32, 32)), ("attention.output", (32, 32)),
        ("mlp.wi_0", (64, 32)), ("mlp.wi_1", (64, 32)), ("mlp.wo", (32, 64)),
    ):
        torch_sd[lp + n + ".weight"] = r(*shape)
    torch_sd[lp + "pre_attention_layer_norm.weight"] = torch.ones(32)
    torch_sd[lp + "pre_mlp_layer_norm.weight"] = torch.ones(32)
    torch_sd[ip + "layernorm.weight"] = torch.ones(32)
    torch_sd["img_connector.dense.weight"] = r(E2, 32)
    torch_sd["img_connector.dense.bias"] = r(E2)
    torch_sd["img_connector.latent_query"] = r(8, E2)
    for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
        torch_sd[f"img_connector.x_attn.{n}.weight"] = r(E2, E2)
        torch_sd[f"img_connector.x_attn.{n}.bias"] = r(E2)

    ckpt = tmp_path / "kosmos_tiny.pt"
    torch.save({"model": torch_sd}, ckpt)
    img_path = tmp_path / "doc.png"
    Image.fromarray(
        (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    ).save(img_path)

    kosmos_infer.main([
        "--image", str(img_path), "--task", "ocr",
        "--checkpoint", str(ckpt), "--tiny", "--fp32",
        "--max_new_tokens", "4", "--max_patches", "16",
        "--num_image_tokens", "8",
        "--image_id", "5", "--image_end_id", "6", "--ocr_id", "7", "--md_id", "8",
    ])
