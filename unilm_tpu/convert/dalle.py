"""OpenAI DALL-E encoder weight converter (BEiT visual tokenizer).

Maps the released encoder.pkl parameter layout (beit/dall_e/encoder.py:
blocks.input / blocks.group_N.block_M.{id_path,res_path.conv_K} /
blocks.output.conv, each a Conv2d with .w [O,I,k,k] and .b) onto
models/dalle_vae.DalleEncoder flax params."""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _t2n(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return np.asarray(t.detach().cpu().numpy())
    return np.asarray(t)


def _conv(sd: Mapping, prefix: str) -> Dict:
    return {
        "kernel": _t2n(sd[f"{prefix}.w"]).transpose(2, 3, 1, 0),
        "bias": _t2n(sd[f"{prefix}.b"]),
    }


def convert_dalle_encoder(sd: Mapping, cfg=None) -> Dict:
    """state dict (torch module.state_dict() of dall_e Encoder, or a plain
    name->array mapping) -> DalleEncoder params."""
    from unilm_tpu.models.dalle_vae import DalleEncoderConfig

    cfg = cfg or DalleEncoderConfig()
    params: Dict = {"input": _conv(sd, "blocks.input")}
    for gi in range(1, cfg.group_count + 1):
        for bi in range(1, cfg.n_blk_per_group + 1):
            p = f"blocks.group_{gi}.block_{bi}"
            blk: Dict = {
                f"conv_{k}": _conv(sd, f"{p}.res_path.conv_{k}") for k in range(1, 5)
            }
            if f"{p}.id_path.w" in sd:
                blk["id_path"] = _conv(sd, f"{p}.id_path")
            params[f"group_{gi}_block_{bi}"] = blk
    params["output"] = _conv(sd, "blocks.output.conv")
    return params
