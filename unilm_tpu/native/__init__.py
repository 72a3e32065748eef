"""ctypes loader for the native C++ runtime ops (native/unilm_native.cpp).

Builds on first import with g++ (cached as native/build/unilm_native.so);
every entry point has a pure-numpy fallback so the package works without a
toolchain. Replaces the reference's pybind11/CUDA clib (SURVEY.md §2.8)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_HERE, "native", "unilm_native.cpp")
_SO = os.path.join(_HERE, "native", "build", "unilm_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so:
            lib = ctypes.CDLL(so)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            f32p = ctypes.POINTER(ctypes.c_float)
            lib.bleu_add.argtypes = [i32p, ctypes.c_int64, i32p, ctypes.c_int64, i64p]
            lib.edit_distance.restype = ctypes.c_int64
            lib.edit_distance.argtypes = [i32p, ctypes.c_int64, i32p, ctypes.c_int64]
            lib.edit_distance_batch.argtypes = [i32p, i64p, i32p, i64p, ctypes.c_int64, i64p]
            lib.batch_by_size.restype = ctypes.c_int64
            lib.batch_by_size.argtypes = [
                i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p,
            ]
            lib.balanced_assignment.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, i64p]
            lib.token_block_slices.restype = ctypes.c_int64
            lib.token_block_slices.argtypes = [
                i64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
                ctypes.c_int64, i64p,
            ]
            lib.block_to_dataset_index.argtypes = [
                i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p,
            ]
            _lib = lib
    return _lib


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


# --------------------------------------------------------------------------- #
# public API (native with numpy fallback)
# --------------------------------------------------------------------------- #


def edit_distance(a, b) -> int:
    """Levenshtein distance between two int sequences (libnat equivalent)."""
    a, b = _i32(a), _i32(b)
    lib = get_lib()
    if lib is not None:
        return int(
            lib.edit_distance(_ptr(a, ctypes.c_int32), len(a), _ptr(b, ctypes.c_int32), len(b))
        )
    # numpy fallback
    la, lb = len(a), len(b)
    prev = np.arange(lb + 1, dtype=np.int64)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, np.int64)
        cur[0] = i
        sub = prev[:-1] + (a[i - 1] != b)
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return int(prev[lb])


def edit_distance_batch(seqs_a: List, seqs_b: List) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        return np.asarray([edit_distance(a, b) for a, b in zip(seqs_a, seqs_b)])
    a_lens = np.asarray([len(a) for a in seqs_a], np.int64)
    b_lens = np.asarray([len(b) for b in seqs_b], np.int64)
    a_flat = _i32(np.concatenate([np.asarray(a, np.int32) for a in seqs_a]) if seqs_a else [])
    b_flat = _i32(np.concatenate([np.asarray(b, np.int32) for b in seqs_b]) if seqs_b else [])
    out = np.zeros(len(seqs_a), np.int64)
    lib.edit_distance_batch(
        _ptr(a_flat, ctypes.c_int32), _ptr(a_lens, ctypes.c_int64),
        _ptr(b_flat, ctypes.c_int32), _ptr(b_lens, ctypes.c_int64),
        len(seqs_a), _ptr(out, ctypes.c_int64),
    )
    return out


def bleu_counts(ref, hyp, counts: Optional[np.ndarray] = None) -> np.ndarray:
    """Accumulate 1-4gram (match, total) counts (libbleu equivalent)."""
    if counts is None:
        counts = np.zeros(8, np.int64)
    ref, hyp = _i32(ref), _i32(hyp)
    lib = get_lib()
    if lib is not None:
        lib.bleu_add(
            _ptr(ref, ctypes.c_int32), len(ref), _ptr(hyp, ctypes.c_int32), len(hyp),
            _ptr(counts, ctypes.c_int64),
        )
        return counts
    from collections import Counter

    for n in range(1, 5):
        if len(hyp) < n:
            continue
        rg = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
        hg = Counter(tuple(hyp[i : i + n]) for i in range(len(hyp) - n + 1))
        match = sum(min(c, rg[g]) for g, c in hg.items())
        counts[2 * (n - 1)] += match
        counts[2 * (n - 1) + 1] += len(hyp) - n + 1
    return counts


def batch_by_size(
    lengths: np.ndarray,
    max_tokens: int = 0,
    max_sentences: int = 0,
    bsz_multiple: int = 1,
) -> List[np.ndarray]:
    """Group indices (in given order) into batches bounded by padded token
    count / sentence count (data_utils_fast equivalent). Returns index arrays."""
    lengths = np.ascontiguousarray(lengths, np.int64)
    n = len(lengths)
    lib = get_lib()
    if lib is not None:
        offsets = np.zeros(n + 1, np.int64)
        nb = lib.batch_by_size(
            _ptr(lengths, ctypes.c_int64), n, max_tokens, max_sentences,
            bsz_multiple, _ptr(offsets, ctypes.c_int64),
        )
        return [np.arange(offsets[i], offsets[i + 1]) for i in range(nb)]
    batches, start, cur_max = [], 0, 0
    for i in range(n):
        new_max = max(cur_max, int(lengths[i]))
        count = i - start + 1
        overflow = (max_tokens and new_max * count > max_tokens and count > 1) or (
            max_sentences and count > max_sentences
        )
        if overflow:
            close = i - start
            if bsz_multiple > 1 and close > bsz_multiple:
                close -= close % bsz_multiple
            batches.append(np.arange(start, start + close))
            start += close
            cur_max = int(lengths[start : i + 1].max())
        else:
            cur_max = new_max
    if start < n:
        batches.append(np.arange(start, n))
    return batches


def balanced_assignment(scores: np.ndarray) -> np.ndarray:
    """Auction-based balanced token->expert assignment (libbase equivalent,
    BASE-layer MoE routing). scores [n, k] -> expert id [n], each expert
    receives exactly n/k tokens (n divisible by k)."""
    scores = np.ascontiguousarray(scores, np.float32)
    n, k = scores.shape
    lib = get_lib()
    if lib is not None:
        out = np.zeros(n, np.int64)
        lib.balanced_assignment(
            _ptr(scores, ctypes.c_float), n, k, _ptr(out, ctypes.c_int64)
        )
        return out
    # greedy fallback: sort all (token, expert) scores desc, fill capacities
    cap = n // k
    order = np.argsort(-scores, axis=None)
    fill = np.zeros(k, np.int64)
    out = np.full(n, -1, np.int64)
    for flat in order:
        i, j = divmod(int(flat), k)
        if out[i] == -1 and fill[j] < cap:
            out[i] = j
            fill[j] += 1
    return out


_BREAK_MODES = {None: 0, "none": 0, "complete": 1, "complete_doc": 2, "eos": 3}


def token_block_slices(
    sizes: np.ndarray,
    break_mode: Optional[str] = None,
    block_size: int = 512,
    document_sep_len: int = 1,
) -> np.ndarray:
    """[n] sentence sizes -> [m, 2] (start, end) token-stream slices
    (token_block_utils_fast._get_slice_indices_fast equivalent;
    modes: none / complete / complete_doc / eos)."""
    sizes = np.ascontiguousarray(sizes, np.int64)
    mode = _BREAK_MODES[break_mode]
    lib = get_lib()
    if lib is not None:
        null = ctypes.POINTER(ctypes.c_int64)()
        m = lib.token_block_slices(
            _ptr(sizes, ctypes.c_int64), len(sizes), mode, block_size,
            document_sep_len, null,
        )
        out = np.zeros((m, 2), np.int64)
        lib.token_block_slices(
            _ptr(sizes, ctypes.c_int64), len(sizes), mode, block_size,
            document_sep_len, _ptr(out, ctypes.c_int64),
        )
        return out
    # numpy fallback
    rows = []
    if mode == 0:
        total = int(sizes.sum())
        for s in range(0, total, block_size):
            rows.append((s, min(s + block_size, total)))
    elif mode == 1:
        tok = cur = i = 0
        while i < len(sizes):
            if cur + sizes[i] <= block_size or cur == 0:
                cur += int(sizes[i]); i += 1
            else:
                rows.append((tok, tok + cur)); tok += cur; cur = 0
        if cur:
            rows.append((tok, tok + cur))
    elif mode == 2:
        tok = cur = i = 0
        while i < len(sizes):
            if (cur + sizes[i] <= block_size or cur == 0) and sizes[i] != document_sep_len:
                cur += int(sizes[i]); i += 1
            else:
                if cur > 1:
                    rows.append((tok, tok + cur))
                tok += cur; cur = 0
                if sizes[i] == document_sep_len:
                    tok += int(sizes[i]); i += 1
        if cur > 1:
            rows.append((tok, tok + cur))
    else:
        start = 0
        for sz in sizes:
            rows.append((start, start + int(sz))); start += int(sz)
    return np.asarray(rows, np.int64).reshape(-1, 2)


def block_to_dataset_index(sizes: np.ndarray, slices: np.ndarray) -> np.ndarray:
    """[m, 2] slices -> [m, 3] (start_ds_idx, start_offset, end_ds_idx)
    (_get_block_to_dataset_index_fast equivalent)."""
    sizes = np.ascontiguousarray(sizes, np.int64)
    slices = np.ascontiguousarray(slices, np.int64)
    m = len(slices)
    lib = get_lib()
    if lib is not None:
        out = np.zeros((m, 3), np.int64)
        lib.block_to_dataset_index(
            _ptr(sizes, ctypes.c_int64), len(sizes),
            _ptr(slices, ctypes.c_int64), m, _ptr(out, ctypes.c_int64),
        )
        return out
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    out = np.zeros((m, 3), np.int64)
    for i, (s, e) in enumerate(slices):
        ds = int(np.searchsorted(starts, s, side="right") - 1)
        out[i, 0] = ds
        out[i, 1] = s - starts[ds]
        out[i, 2] = int(np.searchsorted(starts, max(e - 1, s), side="right") - 1)
    return out
