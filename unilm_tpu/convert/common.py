"""Shared torch->flax conversion helpers."""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def t2n(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def dense(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    """torch nn.Linear '{prefix}.weight/bias' -> flax Dense {kernel, bias}."""
    out = {"kernel": t2n(sd[f"{prefix}.weight"]).T}
    if bias:
        b = sd.get(f"{prefix}.bias")
        out["bias"] = t2n(b) if b is not None else np.zeros(out["kernel"].shape[1], np.float32)
    return out


def layernorm(sd: Mapping, prefix: str) -> Dict:
    return {"scale": t2n(sd[f"{prefix}.weight"]), "bias": t2n(sd[f"{prefix}.bias"])}


def conv2d_nhwc(sd: Mapping, prefix: str, bias: bool = True) -> Dict:
    """torch Conv2d [O, I, kh, kw] -> flax Conv [kh, kw, I, O]."""
    out = {"kernel": t2n(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = t2n(sd[f"{prefix}.bias"])
    return out


def embed(sd: Mapping, key: str) -> Dict:
    return {"embedding": t2n(sd[key])}


def packed_qkv(sd: Mapping, prefix: str, dim: int, q_bias=None, v_bias=None):
    """Split a packed qkv Linear [3E, E] into q/k/v Dense params.

    BEiT packs qkv with separate q_bias/v_bias params and no k bias
    (beit/modeling_finetune.py:127-139); k bias := 0 is softmax-invariant."""
    w = t2n(sd[f"{prefix}.weight"])  # [3E, E]
    qw, kw, vw = np.split(w, 3, axis=0)
    zeros = np.zeros(dim, np.float32)
    return (
        {"kernel": qw.T, "bias": t2n(q_bias) if q_bias is not None else zeros.copy()},
        {"kernel": kw.T, "bias": zeros.copy()},
        {"kernel": vw.T, "bias": t2n(v_bias) if v_bias is not None else zeros.copy()},
    )
