"""BEiT/DiT checkpoint converters: HF transformers + timm/unilm formats.

Covers both serialization worlds for the BEiT family:
- HF `BeitForImageClassification` / `BeitModel` state dicts
- reference timm-style checkpoints (beit/modeling_finetune.py param names:
  cls_token, patch_embed.proj, blocks.i.attn.qkv + q_bias/v_bias,
  gamma_1/gamma_2, rel_pos_bias tables) — also used by DiT releases.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from unilm_tpu.convert.common import conv2d_nhwc, dense, layernorm, packed_qkv, t2n
from unilm_tpu.models.beit import BeitConfig


def convert_beit(sd: Mapping, cfg: BeitConfig) -> Dict:
    """Returns flax params for BeitForImageClassification."""
    sd = dict(sd)
    if any(k.startswith("beit.") for k in sd):
        return _from_hf(sd, cfg)
    return _from_timm(sd, cfg)


def _from_timm(sd: Mapping, cfg: BeitConfig) -> Dict:
    E = cfg.embed_dim
    layers = {}
    for i in range(cfg.num_layers):
        p = f"blocks.{i}"
        q, k, v = packed_qkv(
            sd, f"{p}.attn.qkv", E,
            q_bias=sd.get(f"{p}.attn.q_bias"), v_bias=sd.get(f"{p}.attn.v_bias"),
        )
        layer = {
            "self_attn_layer_norm": layernorm(sd, f"{p}.norm1"),
            "final_layer_norm": layernorm(sd, f"{p}.norm2"),
            "self_attn": {
                "q_proj": q,
                "k_proj": k,
                "v_proj": v,
                "out_proj": dense(sd, f"{p}.attn.proj"),
            },
            "ffn": {"fc1": dense(sd, f"{p}.mlp.fc1"), "fc2": dense(sd, f"{p}.mlp.fc2")},
        }
        if f"{p}.gamma_1" in sd:
            layer["gamma_1"] = {"gamma": t2n(sd[f"{p}.gamma_1"])}
            layer["gamma_2"] = {"gamma": t2n(sd[f"{p}.gamma_2"])}
        layers[f"layers_{i}"] = layer

    backbone = {
        "embeddings": {
            "cls_token": t2n(sd["cls_token"]),
            "patch_embed": {"proj": conv2d_nhwc(sd, "patch_embed.proj")},
        },
        "encoder": layers,
    }
    if "mask_token" in sd:
        backbone["embeddings"]["mask_token"] = t2n(sd["mask_token"])
    if "pos_embed" in sd:
        backbone["pos_embed"] = t2n(sd["pos_embed"])
    if "rel_pos_bias.relative_position_bias_table" in sd:
        backbone["rel_pos_bias"] = {
            "relative_position_bias_table": t2n(
                sd["rel_pos_bias.relative_position_bias_table"]
            )
        }
    for i in range(cfg.num_layers):
        key = f"blocks.{i}.attn.relative_position_bias_table"
        if key in sd:
            backbone[f"rel_pos_bias_{i}"] = {
                "relative_position_bias_table": t2n(sd[key])
            }
    if "norm.weight" in sd:
        backbone["encoder"]["layer_norm"] = layernorm(sd, "norm")

    params = {"backbone": backbone}
    if "fc_norm.weight" in sd:
        params["fc_norm"] = layernorm(sd, "fc_norm")
    if "head.weight" in sd:
        params["head"] = dense(sd, "head")
    if "lm_head.weight" in sd:
        params["lm_head"] = dense(sd, "lm_head")
        params["norm"] = layernorm(sd, "norm")
        params["backbone"] = backbone
        backbone["encoder"].pop("layer_norm", None)
    return params


def _from_hf(sd: Mapping, cfg: BeitConfig) -> Dict:
    layers = {}
    for i in range(cfg.num_layers):
        p = f"beit.encoder.layer.{i}"
        kproj = dense(sd, f"{p}.attention.attention.key", bias=False)
        kproj["bias"] = np.zeros(kproj["kernel"].shape[1], np.float32)
        layer = {
            "self_attn_layer_norm": layernorm(sd, f"{p}.layernorm_before"),
            "final_layer_norm": layernorm(sd, f"{p}.layernorm_after"),
            "self_attn": {
                "q_proj": dense(sd, f"{p}.attention.attention.query"),
                "k_proj": kproj,
                "v_proj": dense(sd, f"{p}.attention.attention.value"),
                "out_proj": dense(sd, f"{p}.attention.output.dense"),
            },
            "ffn": {
                "fc1": dense(sd, f"{p}.intermediate.dense"),
                "fc2": dense(sd, f"{p}.output.dense"),
            },
        }
        if f"{p}.lambda_1" in sd:
            layer["gamma_1"] = {"gamma": t2n(sd[f"{p}.lambda_1"])}
            layer["gamma_2"] = {"gamma": t2n(sd[f"{p}.lambda_2"])}
        layers[f"layers_{i}"] = layer

    backbone = {
        "embeddings": {
            "cls_token": t2n(sd["beit.embeddings.cls_token"]),
            "patch_embed": {
                "proj": conv2d_nhwc(sd, "beit.embeddings.patch_embeddings.projection")
            },
        },
        "encoder": layers,
    }
    if "beit.embeddings.mask_token" in sd:
        backbone["embeddings"]["mask_token"] = t2n(sd["beit.embeddings.mask_token"])
    if "beit.embeddings.position_embeddings" in sd:
        backbone["pos_embed"] = t2n(sd["beit.embeddings.position_embeddings"])
    shared = "beit.encoder.relative_position_bias.relative_position_bias_table"
    if shared in sd:
        backbone["rel_pos_bias"] = {"relative_position_bias_table": t2n(sd[shared])}
    for i in range(cfg.num_layers):
        key = (
            f"beit.encoder.layer.{i}.attention.attention."
            "relative_position_bias.relative_position_bias_table"
        )
        if key in sd:
            backbone[f"rel_pos_bias_{i}"] = {
                "relative_position_bias_table": t2n(sd[key])
            }
    if "beit.layernorm.weight" in sd:
        backbone["encoder"]["layer_norm"] = layernorm(sd, "beit.layernorm")

    params = {"backbone": backbone}
    if "beit.pooler.layernorm.weight" in sd:
        params["fc_norm"] = layernorm(sd, "beit.pooler.layernorm")
    if "classifier.weight" in sd:
        params["head"] = dense(sd, "classifier")
    return params
