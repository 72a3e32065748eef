"""LayoutLMv3 checkpoint converter (HF transformers format; the reference
layoutlmft checkpoints use the same key names minus the 'layoutlmv3.' prefix
handling differences)."""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from unilm_tpu.convert.common import conv2d_nhwc, dense, embed, layernorm, t2n
from unilm_tpu.models.layoutlmv3 import LayoutLMv3Config


def convert_layoutlmv3(sd: Mapping, cfg: LayoutLMv3Config) -> Dict:
    sd = dict(sd)
    p = "layoutlmv3."
    if not any(k.startswith(p) for k in sd):
        p = ""

    layers = {}
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layer.{i}"
        layers[f"layers_{i}"] = {
            "self_attn": {
                "q_proj": dense(sd, f"{lp}.attention.self.query"),
                "k_proj": dense(sd, f"{lp}.attention.self.key"),
                "v_proj": dense(sd, f"{lp}.attention.self.value"),
                "out_proj": dense(sd, f"{lp}.attention.output.dense"),
            },
            "self_attn_layer_norm": layernorm(sd, f"{lp}.attention.output.LayerNorm"),
            "ffn": {
                "fc1": dense(sd, f"{lp}.intermediate.dense"),
                "fc2": dense(sd, f"{lp}.output.dense"),
            },
            "final_layer_norm": layernorm(sd, f"{lp}.output.LayerNorm"),
        }

    model = {
        "word_embeddings": embed(sd, f"{p}embeddings.word_embeddings.weight"),
        "token_type_embeddings": embed(sd, f"{p}embeddings.token_type_embeddings.weight"),
        "position_embeddings": embed(sd, f"{p}embeddings.position_embeddings.weight"),
        "spatial": {
            n: embed(sd, f"{p}embeddings.{n}.weight")
            for n in (
                "x_position_embeddings",
                "y_position_embeddings",
                "h_position_embeddings",
                "w_position_embeddings",
            )
        },
        "emb_LayerNorm": layernorm(sd, f"{p}embeddings.LayerNorm"),
        "encoder": layers,
    }
    if f"{p}encoder.rel_pos_bias.weight" in sd:
        model["rel_pos_bias"] = t2n(sd[f"{p}encoder.rel_pos_bias.weight"]).T
    if f"{p}encoder.rel_pos_x_bias.weight" in sd:
        model["rel_pos_x_bias"] = t2n(sd[f"{p}encoder.rel_pos_x_bias.weight"]).T
        model["rel_pos_y_bias"] = t2n(sd[f"{p}encoder.rel_pos_y_bias.weight"]).T
    if f"{p}cls_token" in sd:
        model["cls_token"] = t2n(sd[f"{p}cls_token"])
        model["pos_embed"] = t2n(sd[f"{p}pos_embed"])
        model["patch_embed"] = {"proj": conv2d_nhwc(sd, f"{p}patch_embed.proj")}
        model["visual_norm"] = layernorm(sd, f"{p}norm")
        model["LayerNorm"] = layernorm(sd, f"{p}LayerNorm")

    params = {"layoutlmv3": model}
    if "classifier.weight" in sd:
        params["classifier"] = dense(sd, "classifier")
    elif "classifier.dense.weight" in sd:
        params["classifier"] = {
            "dense": dense(sd, "classifier.dense"),
            "out_proj": dense(sd, "classifier.out_proj"),
        }
    if "qa_outputs.weight" in sd:
        params["qa_outputs"] = dense(sd, "qa_outputs")
    return params
