"""fairseq-style Dictionary (kosmos-2/fairseq/fairseq/data/dictionary.py
equivalent): symbol<->id mapping with bos/pad/eos/unk, text round-trip, and
the kosmos grounding-vocab extension (<image>/<patch_index_xxxx> tokens,
kosmos-2/unilm/data/utils.py:25-34)."""

from __future__ import annotations

from typing import Iterable, List, Optional

import numpy as np


class Dictionary:
    def __init__(
        self,
        bos: str = "<s>",
        pad: str = "<pad>",
        eos: str = "</s>",
        unk: str = "<unk>",
    ):
        self.symbols: List[str] = []
        self.count: List[int] = []
        self.indices = {}
        self.bos_word, self.pad_word, self.eos_word, self.unk_word = bos, pad, eos, unk
        self.bos_index = self.add_symbol(bos)
        self.pad_index = self.add_symbol(pad)
        self.eos_index = self.add_symbol(eos)
        self.unk_index = self.add_symbol(unk)
        self.nspecial = len(self.symbols)

    def __len__(self):
        return len(self.symbols)

    def __getitem__(self, idx):
        return self.symbols[idx] if idx < len(self.symbols) else self.unk_word

    def __contains__(self, sym):
        return sym in self.indices

    def bos(self):
        return self.bos_index

    def pad(self):
        return self.pad_index

    def eos(self):
        return self.eos_index

    def unk(self):
        return self.unk_index

    def add_symbol(self, word: str, n: int = 1) -> int:
        if word in self.indices:
            idx = self.indices[word]
            self.count[idx] += n
            return idx
        idx = len(self.symbols)
        self.indices[word] = idx
        self.symbols.append(word)
        self.count.append(n)
        return idx

    def index(self, sym: str) -> int:
        return self.indices.get(sym, self.unk_index)

    def encode_line(
        self, line: str, append_eos: bool = True, add_if_not_exist: bool = False
    ) -> np.ndarray:
        words = line.split()
        ids = []
        for w in words:
            ids.append(self.add_symbol(w) if add_if_not_exist else self.index(w))
        if append_eos:
            ids.append(self.eos_index)
        return np.asarray(ids, dtype=np.int64)

    def string(
        self,
        tensor,
        bpe_symbol: Optional[str] = None,
        escape_unk: bool = False,
        extra_symbols_to_ignore: Optional[set] = None,
    ) -> str:
        ignore = {self.bos_index, self.eos_index, self.pad_index}
        if extra_symbols_to_ignore:
            ignore |= set(extra_symbols_to_ignore)
        toks = [self[int(i)] for i in np.asarray(tensor).reshape(-1) if int(i) not in ignore]
        s = " ".join(toks)
        if bpe_symbol is not None:
            s = (s + " ").replace(bpe_symbol + " ", "").rstrip()
        return s

    @classmethod
    def load(cls, path: str) -> "Dictionary":
        """fairseq dict.txt format: '<symbol> <count>' per line."""
        d = cls()
        with open(path, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip().rsplit(" ", 1)
                if len(parts) == 2:
                    sym, cnt = parts
                    d.add_symbol(sym, int(cnt) if cnt.lstrip("-").isdigit() else 1)
                elif parts and parts[0]:
                    d.add_symbol(parts[0])
        return d

    def save(self, path: str):
        with open(path, "w", encoding="utf-8") as f:
            for sym, cnt in zip(
                self.symbols[self.nspecial :], self.count[self.nspecial :]
            ):
                f.write(f"{sym} {cnt}\n")


def add_location_symbols(d: Dictionary, quantized_size: int = 32, locate_special: int = 0):
    """Kosmos-2 grounding vocabulary (kosmos-2/unilm/data/utils.py:25-34):
    <object>/<phrase>/... markers + <patch_index_0000>..<patch_index_NNNN>
    over a quantized_size^2 grid."""
    for sym in ("<object>", "</object>", "<phrase>", "</phrase>", "</chunk>",
                "</line>", "<grounding>"):
        d.add_symbol(sym)
    for i in range(quantized_size**2):
        d.add_symbol(f"<patch_index_{i:04d}>")
    for i in range(locate_special):
        d.add_symbol(f"<grounding_special_{i}>")
    return d
