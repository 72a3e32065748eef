"""Streaming vision-language pretraining data (Kosmos-2/2.5 input pipe).

Capability-equivalent of the reference's infinibatch-based VL loaders:
- kosmos-2/unilm/data/vl/laion2b_obj_loader.py:70,314 — image-caption
  shards with grounded objects; bboxes become `<phrase>...</phrase>
  <object><patch_index_xxxx>...</object>` markup embedded after the phrase,
  then spm-tokenized into the LM stream with `<image>` placeholder spans.
- kosmos-2/unilm/data/vl/vl_base_loader.py / interleaved loader —
  documents interleaving text and images.
- kosmos-2/unilm/data/lm_loader.py:116 — token-count-based batching.

TPU-first re-design: every sample is a fixed [T] token row with an image
placeholder span and boolean splice mask (static shapes; no per-batch
dynamic padding), the whole pipeline is a CheckpointableIterator algebra
(data/iterators.py) so the *stream position* checkpoints with the model,
and tokenization is tiktoken cl100k (the kosmos-2.5 tokenizer,
inference.py:214) with special/location tokens in an id range appended
above the text vocab (the reference appends them to its fairseq
Dictionary, unilm/data/utils.py:25-34).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from unilm_tpu.data import iterators as it
from unilm_tpu.data.grounding import box_tokens


# --------------------------------------------------------------------------- #
# Tokenizer: tiktoken text ids + special/location ids above the text vocab
# --------------------------------------------------------------------------- #

SPECIAL_TOKENS = [
    "<s>", "</s>", "<pad>", "<image>", "</image>", "<ocr>", "<md>",
    "<grounding>", "<phrase>", "</phrase>", "<object>", "</object>",
    "</delimiter_of_multi_objects/>",
]


class VLTokenizer:
    """Text tokenizer + grounding vocabulary.

    ids [0, text_vocab) are the text tokenizer's; specials and the
    quantized-grid location tokens <patch_index_0000>.. live above it.

    Backends: 'tiktoken' (cl100k, the kosmos-2.5 tokenizer), 'spm' — a
    sentencepiece model through the NATIVE reader (data/spm.py), which is
    the kosmos-2 SpmLmLoader text path (unilm/data/lm_loader.py:19; its
    dict is an spm model + specials appended, unilm/data/utils.py:25-34) —
    or byte-level fallback when tiktoken is unavailable ('auto').
    """

    def __init__(self, quantized_size: int = 32, backend: str = "auto",
                 spm_path: Optional[str] = None):
        self.quantized_size = quantized_size
        self._enc = None
        self._spm = None
        if backend == "spm" or (backend == "auto" and spm_path):
            from unilm_tpu.data.spm import SentencePieceModel

            assert spm_path, "backend='spm' requires spm_path"
            self._spm = SentencePieceModel.from_file(spm_path)
        elif backend in ("auto", "tiktoken"):
            try:
                import tiktoken

                self._enc = tiktoken.get_encoding("cl100k_base")
            except Exception:
                if backend == "tiktoken":
                    raise
        self.text_vocab = (
            self._spm.vocab_size if self._spm
            else self._enc.n_vocab if self._enc else 256
        )
        self.special_to_id = {
            s: self.text_vocab + i for i, s in enumerate(SPECIAL_TOKENS)
        }
        self.loc_base = self.text_vocab + len(SPECIAL_TOKENS)
        self.vocab_size = self.loc_base + quantized_size * quantized_size
        self.id_to_special = {v: k for k, v in self.special_to_id.items()}

    def token(self, name: str) -> int:
        return self.special_to_id[name]

    def loc_token(self, cell: int) -> int:
        return self.loc_base + cell

    def encode_text(self, text: str) -> List[int]:
        if self._spm:
            return self._spm.encode(text)
        if self._enc:
            return self._enc.encode(text, disallowed_special=())
        return list(text.encode("utf-8"))

    def decode_text(self, ids: Sequence[int]) -> str:
        ids = [i for i in ids if i < self.text_vocab]
        if self._spm:
            return self._spm.decode(ids)
        if self._enc:
            return self._enc.decode(ids)
        return bytes(ids).decode("utf-8", errors="replace")

    def encode_grounded(self, text: str) -> List[int]:
        """Encode text containing special/location markup: specials become
        their reserved ids, plain spans go through the text tokenizer."""
        import re

        out: List[int] = []
        pat = re.compile(
            "|".join(re.escape(s) for s in SPECIAL_TOKENS)
            + r"|<patch_index_(\d{4,})>"
        )
        pos = 0
        for m in pat.finditer(text):
            if m.start() > pos:
                out.extend(self.encode_text(text[pos : m.start()]))
            if m.group(1) is not None:
                out.append(self.loc_token(int(m.group(1))))
            else:
                out.append(self.special_to_id[m.group(0)])
            pos = m.end()
        if pos < len(text):
            out.extend(self.encode_text(text[pos:]))
        return out

    def decode(self, ids: Sequence[int]) -> str:
        """Inverse of encode_grounded (markup restored for grounded decode)."""
        parts: List[str] = []
        buf: List[int] = []

        def flush():
            if buf:
                parts.append(self.decode_text(buf))
                buf.clear()

        for i in ids:
            if i < self.text_vocab:
                buf.append(int(i))
            elif i >= self.loc_base:
                flush()
                parts.append(f"<patch_index_{i - self.loc_base:04d}>")
            else:
                flush()
                parts.append(self.id_to_special.get(int(i), ""))
        flush()
        return "".join(parts)


# --------------------------------------------------------------------------- #
# Grounding markup insertion (laion2b_obj_loader._embed_box_after_phrase)
# --------------------------------------------------------------------------- #

def insert_grounding_markup(
    caption: str,
    objects: Sequence[Dict],
    quantized_size: int = 32,
) -> str:
    """objects: [{"span": [start, end), "boxes": [[x0,y0,x1,y1] norm..]}].
    Wraps each span as <phrase>..</phrase><object>loc tokens</object>,
    multiple boxes joined by </delimiter_of_multi_objects/>."""
    spans = sorted(objects, key=lambda o: o["span"][0])
    out, pos = ["<grounding>"], 0
    for o in spans:
        s, e = o["span"]
        if s < pos:  # overlapping span: skip (reference drops these too)
            continue
        out.append(caption[pos:s])
        toks = "</delimiter_of_multi_objects/>".join(
            box_tokens(tuple(b), quantized_size)[len("<object>"):-len("</object>")]
            for b in o["boxes"]
        )
        out.append(f"<phrase>{caption[s:e]}</phrase><object>{toks}</object>")
        pos = e
    out.append(caption[pos:])
    return "".join(out)


# --------------------------------------------------------------------------- #
# Image loading / transform (host side, numpy)
# --------------------------------------------------------------------------- #

def load_image(
    path: Optional[str], image_root: str, image_size: int, key: str = ""
) -> np.ndarray:
    """[H, W, 3] float32 in [0,1]; deterministic pseudo-image when the file
    is missing (annotation-only smoke tests / unit tests)."""
    full = os.path.join(image_root, path) if (path and image_root) else path
    if full and os.path.exists(full):
        from PIL import Image

        img = Image.open(full).convert("RGB").resize((image_size, image_size))
        return np.asarray(img, np.float32) / 255.0
    seed = int(hashlib.md5((path or key).encode()).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    return rng.rand(image_size, image_size, 3).astype(np.float32)


# --------------------------------------------------------------------------- #
# Sample assembly: fixed-shape token row with image placeholder span
# --------------------------------------------------------------------------- #

@dataclasses.dataclass(frozen=True)
class VLSampleSpec:
    tokens_per_sample: int = 256
    image_tokens: int = 64        # latent query count (k2: 64, k2.5: 2048)
    image_size: int = 224
    max_images: int = 1           # >1 for interleaved documents
    quantized_size: int = 32


def assemble_sample(
    tok: VLTokenizer,
    spec: VLSampleSpec,
    segments: Sequence[Tuple[str, object]],  # ("text", ids) | ("image", np img)
) -> Optional[Dict[str, np.ndarray]]:
    """-> {tokens [T], img_mask [T], segs [T], loss_mask [T], images
    [max_images, H, W, 3], n_images}; None if nothing fits."""
    T = spec.tokens_per_sample
    bos, eos = tok.token("<s>"), tok.token("</s>")
    boi, eoi = tok.token("<image>"), tok.token("</image>")
    pad = tok.token("<pad>")

    tokens = [bos]
    img_mask = [False]
    segs = [0]
    loss = [False]
    images: List[np.ndarray] = []
    n_text = 0
    for kind, payload in segments:
        if kind == "image":
            # skip (not break on) images that don't fit so later text
            # segments still pack — consistent with the max_images skip
            need = 2 + spec.image_tokens
            if len(images) >= spec.max_images or len(tokens) + need + 1 > T:
                continue
            tokens.append(boi); img_mask.append(False); segs.append(1); loss.append(False)
            for _ in range(spec.image_tokens):
                tokens.append(pad); img_mask.append(True); segs.append(1); loss.append(False)
            tokens.append(eoi); img_mask.append(False); segs.append(1); loss.append(False)
            images.append(payload)
        else:
            for t in payload:
                if len(tokens) + 1 >= T:
                    break
                tokens.append(int(t)); img_mask.append(False); segs.append(0); loss.append(True)
                n_text += 1
    if len(tokens) < T:
        tokens.append(eos); img_mask.append(False); segs.append(0); loss.append(True)
    # require an image AND at least one real text token (the trailing eos
    # alone must not keep an image-only sample alive)
    if not images or n_text == 0:
        return None
    n = len(tokens)
    tokens += [pad] * (T - n)
    img_mask += [False] * (T - n)
    segs += [0] * (T - n)
    loss += [False] * (T - n)
    img_arr = np.zeros(
        (spec.max_images, spec.image_size, spec.image_size, 3), np.float32
    )
    for i, im in enumerate(images):
        img_arr[i] = im
    return {
        "tokens": np.asarray(tokens, np.int32),
        "img_mask": np.asarray(img_mask, bool),
        "segs": np.asarray(segs, np.int32),
        "loss_mask": np.asarray(loss, bool),
        "images": img_arr,
        "n_images": np.int32(len(images)),
    }


# --------------------------------------------------------------------------- #
# Loaders
# --------------------------------------------------------------------------- #

def _jsonl_reader(path: str) -> List[dict]:
    with open(path, encoding="utf-8") as f:
        return [json.loads(l) for l in f if l.strip()]


def laion_obj_stream(
    shard_paths: Sequence[str],
    tok: VLTokenizer,
    spec: VLSampleSpec,
    *,
    image_root: str = "",
    seed: int = 0,
    shuffle_buffer: int = 256,
) -> it.CheckpointableIterator:
    """Grounded image-caption stream (Laion2BObjLoader equivalent).

    Shard line format: {"caption": str, "image": str|null,
    "objects": [{"span": [s, e], "boxes": [[x0,y0,x1,y1]..]}]}.
    """
    src = it.InfinitePermutationSourceIterator(list(shard_paths), seed=seed)
    lines = it.SelectManyIterator(src, _jsonl_reader)
    lines = it.BufferedShuffleIterator(lines, shuffle_buffer, seed=seed + 1)

    def build(rec):
        caption = rec.get("caption", "")
        text = insert_grounding_markup(
            caption, rec.get("objects", []), spec.quantized_size
        )
        ids = tok.encode_grounded(text)
        img = load_image(
            rec.get("image"), image_root, spec.image_size, key=caption
        )
        return assemble_sample(tok, spec, [("image", img), ("text", ids)])

    samples = it.MapIterator(lines, build)
    return _SkipNoneIterator(samples)


def interleaved_stream(
    shard_paths: Sequence[str],
    tok: VLTokenizer,
    spec: VLSampleSpec,
    *,
    image_root: str = "",
    seed: int = 0,
    shuffle_buffer: int = 64,
) -> it.CheckpointableIterator:
    """Interleaved text-image documents (interleaved loader equivalent).

    Shard line format: {"segments": [{"text": str} | {"image": str}]}.
    """
    src = it.InfinitePermutationSourceIterator(list(shard_paths), seed=seed)
    lines = it.SelectManyIterator(src, _jsonl_reader)
    lines = it.BufferedShuffleIterator(lines, shuffle_buffer, seed=seed + 1)

    def build(rec):
        segs = []
        for s in rec.get("segments", []):
            if "image" in s:
                segs.append(
                    ("image", load_image(s["image"], image_root, spec.image_size))
                )
            elif "text" in s:
                segs.append(("text", tok.encode_text(s["text"])))
        return assemble_sample(tok, spec, segs)

    samples = it.MapIterator(lines, build)
    return _SkipNoneIterator(samples)


class _SkipNoneIterator(it.CheckpointableIterator):
    """Drop samples the assembler rejected (too long / empty)."""

    def __init__(self, source: it.CheckpointableIterator):
        self._source = source

    def getstate(self):
        return {"source": self._source.getstate()}

    def setstate(self, state):
        self._source.setstate(state["source"] if state else None)

    def __next__(self):
        while True:
            x = next(self._source)
            if x is not None:
                return x


def vl_batch_stream(
    sample_stream: it.CheckpointableIterator, batch_size: int
) -> it.CheckpointableIterator:
    """Fixed-size batches collated to stacked arrays (static shapes)."""
    batches = it.FixedBatchIterator(sample_stream, batch_size, drop_last=True)

    def collate(samples):
        return {
            k: np.stack([s[k] for s in samples]) for k in samples[0].keys()
        }

    return it.MapIterator(batches, collate)
