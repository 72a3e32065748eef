"""Binarized mmap token dataset (fairseq MMapIndexedDataset equivalent).

Capability-equivalent of fairseq/data/indexed_dataset.py: a .bin file of
concatenated token arrays plus a .idx file with dtype/sizes/pointers;
random access via np.memmap so hosts stream corpora without loading them.
Format is self-describing, not byte-compatible with fairseq's (converted
checkpoints don't ship data; corpora are rebuilt with the builder)."""

from __future__ import annotations

import json
import os
import struct
from typing import Iterable, List, Optional

import numpy as np

_MAGIC = b"UNILMTPU_IDX1\x00"


class MMapIndexedDatasetBuilder:
    def __init__(self, path_prefix: str, dtype=np.int32):
        self.prefix = path_prefix
        self.dtype = np.dtype(dtype)
        self._bin = open(path_prefix + ".bin", "wb")
        self.sizes: List[int] = []

    def add_item(self, tokens) -> None:
        arr = np.ascontiguousarray(tokens, dtype=self.dtype)
        self._bin.write(arr.tobytes())
        self.sizes.append(len(arr))

    def finalize(self) -> None:
        self._bin.close()
        sizes = np.asarray(self.sizes, np.int64)
        pointers = np.zeros(len(sizes) + 1, np.int64)
        np.cumsum(sizes * self.dtype.itemsize, out=pointers[1:])
        with open(self.prefix + ".idx", "wb") as f:
            f.write(_MAGIC)
            header = json.dumps(
                {"dtype": self.dtype.name, "n": len(sizes)}
            ).encode()
            f.write(struct.pack("<I", len(header)))
            f.write(header)
            f.write(sizes.tobytes())
            f.write(pointers.tobytes())


class MMapIndexedDataset:
    def __init__(self, path_prefix: str):
        with open(path_prefix + ".idx", "rb") as f:
            assert f.read(len(_MAGIC)) == _MAGIC, "bad index file"
            (hlen,) = struct.unpack("<I", f.read(4))
            header = json.loads(f.read(hlen))
            self.dtype = np.dtype(header["dtype"])
            n = header["n"]
            self.sizes = np.frombuffer(f.read(8 * n), np.int64)
            self.pointers = np.frombuffer(f.read(8 * (n + 1)), np.int64)
        self._data = np.memmap(path_prefix + ".bin", dtype=self.dtype, mode="r")

    def __len__(self) -> int:
        return len(self.sizes)

    def __getitem__(self, i: int) -> np.ndarray:
        start = self.pointers[i] // self.dtype.itemsize
        return np.asarray(self._data[start : start + self.sizes[i]])


def build_indexed_dataset(path_prefix: str, sequences: Iterable, dtype=np.int32):
    b = MMapIndexedDatasetBuilder(path_prefix, dtype)
    for s in sequences:
        b.add_item(s)
    b.finalize()
    return MMapIndexedDataset(path_prefix)


class TokenBlockIterator:
    """Pack a stream of documents into fixed token blocks (fairseq
    token_block_utils / kosmos LMLoader 2048-packing). Checkpointable via the
    underlying source iterator state + carry buffer."""

    def __init__(self, source, block_size: int, eod: Optional[int] = None):
        self._source = source
        self._block = block_size
        self._eod = eod
        self._carry: List[int] = []

    def getstate(self):
        return {"source_state": self._source.getstate(), "carry": list(self._carry)}

    def setstate(self, state):
        self._source.setstate(state["source_state"])
        self._carry = list(state["carry"])

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        while len(self._carry) < self._block:
            doc = next(self._source)
            self._carry.extend(int(t) for t in doc)
            if self._eod is not None:
                self._carry.append(self._eod)
        out = np.asarray(self._carry[: self._block], np.int32)
        self._carry = self._carry[self._block :]
        return out
