"""WavLM converter (HF WavLMModel format)."""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from unilm_tpu.convert.common import dense, layernorm, t2n


def convert_wavlm(sd: Mapping, cfg) -> Dict:
    sd = dict(sd)
    p = "wavlm." if any(k.startswith("wavlm.") for k in sd) else ""

    fe = {}
    for i in range(len(cfg.conv_dim)):
        # torch Conv1d [O, I, K] -> flax [K, I, O]
        fe[f"conv_{i}"] = {
            "kernel": t2n(sd[f"{p}feature_extractor.conv_layers.{i}.conv.weight"])
            .transpose(2, 1, 0)
        }
    fe["group_norm"] = {
        "scale": t2n(sd[f"{p}feature_extractor.conv_layers.0.layer_norm.weight"]),
        "bias": t2n(sd[f"{p}feature_extractor.conv_layers.0.layer_norm.bias"]),
    }

    # weight-normed positional conv: weight[:, :, k] = g[k] * v[:, :, k] / ||v[:,:,k]||
    g = t2n(sd[f"{p}encoder.pos_conv_embed.conv.parametrizations.weight.original0"])
    v = t2n(sd[f"{p}encoder.pos_conv_embed.conv.parametrizations.weight.original1"])
    norm = np.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0, keepdims=True)  # per k
    w = v * (g[0] / norm)[None]  # [O, I/g, K]
    pos_conv = {
        "conv": {
            "kernel": w.transpose(2, 1, 0),  # [K, I/g, O]
            "bias": t2n(sd[f"{p}encoder.pos_conv_embed.conv.bias"]),
        }
    }

    params = {
        "feature_extractor": fe,
        "fp_layer_norm": layernorm(sd, f"{p}feature_projection.layer_norm"),
        "fp_projection": dense(sd, f"{p}feature_projection.projection"),
        "pos_conv_embed": pos_conv,
        "encoder_layer_norm": layernorm(sd, f"{p}encoder.layer_norm"),
        "rel_attn_embed": t2n(sd[f"{p}encoder.layers.0.attention.rel_attn_embed.weight"]),
    }
    for i in range(cfg.num_layers):
        lp = f"{p}encoder.layers.{i}"
        params[f"attn_{i}"] = {
            "q_proj": dense(sd, f"{lp}.attention.q_proj"),
            "k_proj": dense(sd, f"{lp}.attention.k_proj"),
            "v_proj": dense(sd, f"{lp}.attention.v_proj"),
            "out_proj": dense(sd, f"{lp}.attention.out_proj"),
            "gru_rel_pos_linear": dense(sd, f"{lp}.attention.gru_rel_pos_linear"),
            "gru_rel_pos_const": t2n(sd[f"{lp}.attention.gru_rel_pos_const"]),
        }
        params[f"ln1_{i}"] = layernorm(sd, f"{lp}.layer_norm")
        params[f"fc1_{i}"] = dense(sd, f"{lp}.feed_forward.intermediate_dense")
        params[f"fc2_{i}"] = dense(sd, f"{lp}.feed_forward.output_dense")
        params[f"ln2_{i}"] = layernorm(sd, f"{lp}.final_layer_norm")
    return params
