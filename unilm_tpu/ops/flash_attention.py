"""Pallas TPU flash attention (placeholder — kernel lands next milestone).

Will replace the reference's xformers memory_efficient_attention
(torchscale multihead_attention.py:141-144) and flash-attn sliding window
(YOCO sliding_window_attention.py:65) with a single Pallas kernel supporting
causal, windowed, kv_len-masked and additive-bias attention.
"""

from __future__ import annotations

from typing import Optional

import jax


def is_available() -> bool:
    return False  # flips to TPU-platform check once the kernel lands


def supports(q, k, bias, window) -> bool:
    return False


def flash_attention(q, k, v, **kw):  # pragma: no cover - placeholder
    raise NotImplementedError
