"""TrOCR converter: HF VisionEncoderDecoder (DeiT/ViT + TrOCR decoder).

Performs the equivalent of the reference's RoBERTa->decoder state-dict
surgery (trocr/trocr_models.py:149-238) on the HF serialization."""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from unilm_tpu.convert.common import conv2d_nhwc, dense, embed, layernorm, t2n
from unilm_tpu.models.trocr import TrOCRConfig


def _vit_encoder(sd: Mapping, cfg: TrOCRConfig) -> Dict:
    layers = {}
    for i in range(cfg.enc_layers):
        p = f"encoder.encoder.layer.{i}"
        layers[f"layers_{i}"] = {
            "self_attn_layer_norm": layernorm(sd, f"{p}.layernorm_before"),
            "final_layer_norm": layernorm(sd, f"{p}.layernorm_after"),
            "self_attn": {
                "q_proj": dense(sd, f"{p}.attention.attention.query"),
                "k_proj": dense(sd, f"{p}.attention.attention.key"),
                "v_proj": dense(sd, f"{p}.attention.attention.value"),
                "out_proj": dense(sd, f"{p}.attention.output.dense"),
            },
            "ffn": {
                "fc1": dense(sd, f"{p}.intermediate.dense"),
                "fc2": dense(sd, f"{p}.output.dense"),
            },
        }
    layers["layer_norm"] = layernorm(sd, "encoder.layernorm")
    out = {
        "cls_token": t2n(sd["encoder.embeddings.cls_token"]),
        "pos_embed": t2n(sd["encoder.embeddings.position_embeddings"]),
        "patch_embed": {
            "proj": conv2d_nhwc(sd, "encoder.embeddings.patch_embeddings.projection")
        },
        "encoder": layers,
    }
    if "encoder.embeddings.distillation_token" in sd:
        out["dist_token"] = t2n(sd["encoder.embeddings.distillation_token"])
    return out


def _decoder(sd: Mapping, cfg: TrOCRConfig) -> Dict:
    pre = "decoder.model.decoder"
    layers = {}
    for i in range(cfg.dec_layers):
        p = f"{pre}.layers.{i}"
        layers[f"layers_{i}"] = {
            "self_attn": {
                n: dense(sd, f"{p}.self_attn.{n}")
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "self_attn_layer_norm": layernorm(sd, f"{p}.self_attn_layer_norm"),
            "encoder_attn": {
                n: dense(sd, f"{p}.encoder_attn.{n}")
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "encoder_attn_layer_norm": layernorm(sd, f"{p}.encoder_attn_layer_norm"),
            "ffn": {"fc1": dense(sd, f"{p}.fc1"), "fc2": dense(sd, f"{p}.fc2")},
            "final_layer_norm": layernorm(sd, f"{p}.final_layer_norm"),
        }
    if f"{pre}.layer_norm.weight" in sd:  # pre-LN variants (trocr-small)
        layers["layer_norm"] = layernorm(sd, f"{pre}.layer_norm")
    out = {
        "embed_tokens": embed(sd, f"{pre}.embed_tokens.weight"),
        "embed_positions": t2n(sd[f"{pre}.embed_positions.weight"]),
        "decoder": layers,
    }
    if f"{pre}.layernorm_embedding.weight" in sd:
        out["layernorm_embedding"] = layernorm(sd, f"{pre}.layernorm_embedding")
    if "decoder.output_projection.weight" in sd:
        out["output_projection"] = dense(sd, "decoder.output_projection", bias=False)
    return out


def convert_trocr(sd: Mapping, cfg: TrOCRConfig) -> Dict:
    sd = dict(sd)
    params = {"vit": _vit_encoder(sd, cfg), "text_decoder": _decoder(sd, cfg)}
    if "enc_to_dec_proj.weight" in sd:
        params["enc_to_dec_proj"] = dense(sd, "enc_to_dec_proj")
    return params
