"""Paged KV cache for serving (ragged batches of different lengths).

The north star calls for an "HBM-resident paged/contiguous KV cache"
(SURVEY.md §7 step 6; PAPERS.md: Ragged Paged Attention). The contiguous
per-sequence cache in core/attention covers single-stream generation; this
module adds the serving-side allocator: a shared page pool + per-sequence
block tables so many sequences of different lengths share HBM without
per-sequence max_len reservations.

Static shapes throughout: the pool is [num_pages, page_size, H, D]; each
sequence owns up to max_pages page ids; attention gathers its pages
(XLA gather today; a Pallas kernel that walks the block table with DMA is
the planned upgrade) and masks beyond its true length."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass
class PagedKVConfig:
    num_pages: int
    page_size: int
    num_heads: int
    head_dim: int
    max_pages_per_seq: int
    dtype: jnp.dtype = jnp.bfloat16


class PagePool:
    """Host-side page allocator (free list) + device-side pools.

    The allocator is host logic (like vLLM's block manager): it hands out
    page ids; all device-side state is fixed-shape arrays."""

    def __init__(self, cfg: PagedKVConfig):
        self.cfg = cfg
        self.k_pool = jnp.zeros(
            (cfg.num_pages, cfg.page_size, cfg.num_heads, cfg.head_dim), cfg.dtype
        )
        self.v_pool = jnp.zeros_like(self.k_pool)
        self._free = list(range(cfg.num_pages - 1, -1, -1))
        self._tables = {}  # seq_id -> list[int]
        self._lengths = {}  # seq_id -> int

    # ---- allocator ------------------------------------------------------- #
    def create(self, seq_id) -> None:
        self._tables[seq_id] = []
        self._lengths[seq_id] = 0

    def free(self, seq_id) -> None:
        self._free.extend(reversed(self._tables.pop(seq_id)))
        self._lengths.pop(seq_id)

    def _ensure(self, seq_id, new_len: int):
        need = -(-new_len // self.cfg.page_size)
        table = self._tables[seq_id]
        while len(table) < need:
            if not self._free:
                raise MemoryError("KV page pool exhausted")
            table.append(self._free.pop())
        assert len(table) <= self.cfg.max_pages_per_seq, "sequence too long"

    def block_table(self, seq_id) -> np.ndarray:
        t = self._tables[seq_id]
        out = np.zeros(self.cfg.max_pages_per_seq, np.int32)
        out[: len(t)] = t
        return out

    def length(self, seq_id) -> int:
        return self._lengths[seq_id]

    @property
    def pages_in_use(self) -> int:
        return self.cfg.num_pages - len(self._free)

    # ---- device ops -------------------------------------------------------- #
    def append(self, seq_id, k_new: jax.Array, v_new: jax.Array):
        """Write [T, H, D] new keys/values at the sequence tail."""
        T = k_new.shape[0]
        start = self._lengths[seq_id]
        self._ensure(seq_id, start + T)
        table = self._tables[seq_id]
        ps = self.cfg.page_size
        # scatter token-by-token positions into (page, offset)
        pos = np.arange(start, start + T)
        page_ids = np.asarray([table[p // ps] for p in pos], np.int32)
        offsets = (pos % ps).astype(np.int32)
        self.k_pool = self.k_pool.at[page_ids, offsets].set(k_new.astype(self.cfg.dtype))
        self.v_pool = self.v_pool.at[page_ids, offsets].set(v_new.astype(self.cfg.dtype))
        self._lengths[seq_id] = start + T


def paged_attention(
    q: jax.Array,  # [B, 1, H, D] one decode step per sequence
    k_pool: jax.Array,  # [P, page, H, D]
    v_pool: jax.Array,
    block_tables: jax.Array,  # [B, max_pages] int32
    lengths: jax.Array,  # [B] valid token counts
    scale: Optional[float] = None,
    use_kernel: Optional[bool] = None,
) -> jax.Array:
    """Ragged decode attention over paged KV. Dispatches to the Pallas
    block-table-walking kernel on TPU (ops/paged_attention.py); the XLA
    formulation gathers each sequence's pages into [B, max_pages*page, H, D]
    and masks by length."""
    if use_kernel is None:
        import os

        from unilm_tpu.ops.paged_attention import kernel_supported

        use_kernel = (jax.default_backend() == "tpu"
                      and kernel_supported(q.shape[2], q.shape[3],
                                           k_pool.shape[1], k_pool.dtype)
                      and not os.environ.get("UNILM_TPU_DISABLE_PAGED_KERNEL"))
    if use_kernel:
        from unilm_tpu.ops.paged_attention import paged_decode_attention

        return paged_decode_attention(
            q, k_pool, v_pool, block_tables, lengths, scale=scale,
            interpret=False,
        )
    B, _, H, D = q.shape
    P, page = k_pool.shape[0], k_pool.shape[1]
    k = k_pool[block_tables]  # [B, max_pages, page, ...]
    v = v_pool[block_tables]
    S = k.shape[1] * page
    k = k.reshape(B, S, H, D)
    v = v.reshape(B, S, H, D)
    mask = (jnp.arange(S)[None] < lengths[:, None])[:, None, None, :]
    return dot_product_attention(q, k, v, mask=mask, scale=scale)
