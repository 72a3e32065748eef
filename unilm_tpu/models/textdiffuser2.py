"""TextDiffuser-2: language-model layout planning + text-rendering diffusion.

Capability-equivalent of textdiffuser-2/ two-stage inference
(inference_textdiffuser2_t2i_full.py:484-600):

  M1  a causal "layout planner" LM maps a caption to one line per keyword,
      ``keyword l,t,r,b`` on a 128x128 canvas (the reference fine-tunes
      vicuna-7b with the template at inference_textdiffuser2_t2i_full.py:510
      and decodes with temperature sampling).
  M2  the diffusion generator consumes the caption plus the planned layout
      encoded as coordinate tokens l{i}/t{i}/r{i}/b{i} and per-character
      tokens (inference_textdiffuser2_t2i_full.py:559-576), then runs
      classifier-free-guided latent diffusion.

TPU-native redesign: M1 is a compact Decoder (core/transformer.py) over an
explicit layout vocabulary — caption characters, coordinate bins, and
structural separators — so planning is a single static-shape
`greedy_generate` call instead of a fastchat conversation loop. M2 reuses
the character-mask UNet from models/textdiffuser.py: the planned boxes are
rasterized by `render_char_mask` and drive DDIM sampling. The plain-text
``keyword l,t,r,b`` grammar is preserved by `parse_layout_text` /
`format_layout_text` so externally-planned layouts (reference M1 output)
interoperate bidirectionally.
"""

from __future__ import annotations

import dataclasses
import re
import string
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.transformer import Decoder
from unilm_tpu.models.textdiffuser import (
    TextDiffuserConfig,
    TextDiffuserUNet,
    ddim_sample,
    render_char_mask,
)

# The reference plans on a fixed 128x128 canvas
# (inference_textdiffuser2_t2i_full.py:510 "The size of the image is 128x128").
CANVAS = 128

# M2's character alphabet (inference_textdiffuser2_t2i_full.py:24).
ALPHABET = (
    string.digits + string.ascii_lowercase + string.ascii_uppercase
    + string.punctuation + " "
)

Box = Tuple[int, int, int, int]
Layout = List[Tuple[str, Box]]


# --------------------------------------------------------------------------- #
# Layout vocabulary: caption/keyword characters + coordinate bins + structure
# --------------------------------------------------------------------------- #

class LayoutVocab:
    """Token ids for the planner LM.

    0=pad 1=bos 2=eos 3=sep(line break) 4=box(start-of-coords), then the
    95-char alphabet, then l0..l127, t0..t127, r0..r127, b0..b127 — the same
    coordinate-token scheme M2's extended CLIP tokenizer uses
    (inference_textdiffuser2_t2i_full.py:571 ``'l'+str(l), 't'+str(t), ...``).
    """

    PAD, BOS, EOS, SEP, BOX = 0, 1, 2, 3, 4

    def __init__(self, canvas: int = CANVAS):
        self.canvas = canvas
        self.char_base = 5
        self.c2i = {c: self.char_base + i for i, c in enumerate(ALPHABET)}
        self.i2c = {v: k for k, v in self.c2i.items()}
        self.coord_base = self.char_base + len(ALPHABET)
        # coordinate axes in the reference's l,t,r,b order
        self.axes = "ltrb"
        self.size = self.coord_base + 4 * canvas

    def coord_token(self, axis: int, v: int) -> int:
        v = int(np.clip(v, 0, self.canvas - 1))
        return self.coord_base + axis * self.canvas + v

    def decode_coord(self, tok: int) -> Optional[Tuple[int, int]]:
        if tok < self.coord_base or tok >= self.size:
            return None
        axis, v = divmod(tok - self.coord_base, self.canvas)
        return axis, v

    def encode_text(self, text: str) -> List[int]:
        return [self.c2i[c] for c in text if c in self.c2i]

    def encode_prompt(self, caption: str, max_len: int) -> np.ndarray:
        """[max_len] int32, BOS + caption chars + BOX marker, left-padded is
        NOT used — planner prompts are right-padded with PAD and the decode
        starts from the true length (static-shape greedy_generate)."""
        ids = [self.BOS] + self.encode_text(caption)[: max_len - 2] + [self.BOX]
        ids = ids + [self.PAD] * (max_len - len(ids))
        return np.asarray(ids, np.int32)

    def encode_layout(self, layout: Layout) -> List[int]:
        """keyword chars + l/t/r/b coord tokens + SEP per line, EOS last."""
        ids: List[int] = []
        for word, (l, t, r, b) in layout:
            ids += self.encode_text(word)
            ids += [self.coord_token(a, v) for a, v in enumerate((l, t, r, b))]
            ids.append(self.SEP)
        ids.append(self.EOS)
        return ids

    def decode_layout(self, ids: Sequence[int]) -> Layout:
        """Inverse of encode_layout; tolerant of malformed model output —
        lines missing any of the four coordinates are dropped, mirroring the
        reference's skip-on-parse-failure (t2i_full.py:560-566)."""
        layout: Layout = []
        word: List[str] = []
        coords: dict = {}
        for tok in ids:
            tok = int(tok)
            if tok == self.EOS:
                break
            if tok == self.SEP:
                if len(coords) == 4 and word:
                    layout.append(
                        ("".join(word), tuple(coords[a] for a in range(4))))
                word, coords = [], {}
                continue
            c = self.decode_coord(tok)
            if c is not None:
                coords[c[0]] = c[1]
            elif tok in self.i2c:
                word.append(self.i2c[tok])
        return layout


# --------------------------------------------------------------------------- #
# Plain-text grammar (the reference M1's output format)
# --------------------------------------------------------------------------- #

_LINE_RE = re.compile(r"^(.*?)\s+(\d+),(\d+),(\d+),(\d+)\s*$")


def parse_layout_text(text: str, canvas: int = CANVAS) -> Layout:
    """Parse ``keyword l,t,r,b`` lines (t2i_full.py:559-571): splits each
    line on whitespace, last item is the comma-separated box; skips empty
    lines and the reference's '###'/'.com' junk filters."""
    layout: Layout = []
    for line in text.splitlines():
        line = line.strip()
        if not line or "###" in line or ".com" in line:
            continue
        m = _LINE_RE.match(line)
        if not m:
            continue
        word = m.group(1).strip()
        l, t, r, b = (int(np.clip(int(m.group(i)), 0, canvas)) for i in range(2, 6))
        if word:
            layout.append((word, (l, t, r, b)))
    return layout


def format_layout_text(layout: Layout) -> str:
    return "\n".join(f"{w} {l},{t},{r},{b}" for w, (l, t, r, b) in layout)


def layout_to_pixel_boxes(
    layout: Layout, img_size: int, canvas: int = CANVAS
) -> List[Tuple[str, Box]]:
    """Scale canvas-space boxes to image pixels for render_char_mask."""
    s = img_size / canvas
    out = []
    for word, (l, t, r, b) in layout:
        x0, y0 = int(l * s), int(t * s)
        x1, y1 = max(int(r * s), x0 + 1), max(int(b * s), y0 + 1)
        out.append((word, (x0, y0, min(x1, img_size), min(y1, img_size))))
    return out


# --------------------------------------------------------------------------- #
# M1: the layout-planner LM
# --------------------------------------------------------------------------- #

@dataclasses.dataclass(frozen=True)
class LayoutPlannerConfig:
    vocab_size: int = LayoutVocab().size
    embed_dim: int = 256
    ffn_dim: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    max_positions: int = 512
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def core(self) -> TransformerConfig:
        return TransformerConfig(
            vocab_size=self.vocab_size,
            embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dropout=self.dropout,
            max_positions=self.max_positions,
            normalize_before=True,
            subln=True,
            activation="swiglu",
            xpos_rel_pos=True,
            learned_pos=False,
            dtype=self.dtype,
        )


class LayoutPlannerLM(nn.Module):
    """Causal LM over the layout vocabulary: caption chars -> layout tokens.

    Stands in for the reference's fine-tuned vicuna-7b planner
    (train_layout_planner.sh; loaded via fastchat at t2i_full.py:486). The
    conversation template collapses to BOS caption BOX -> layout tokens.
    """

    cfg: LayoutPlannerConfig

    def setup(self):
        core = self.cfg.core()
        self.embed = nn.Embed(self.cfg.vocab_size, self.cfg.embed_dim,
                              dtype=self.cfg.dtype, name="embed")
        self.decoder = Decoder(core, name="decoder")

    def _logits(self, tokens, mode: str, cache_size: int):
        x = self.embed(tokens)
        x = self.decoder(
            x, mode=mode, cache_size=cache_size,
            self_key_padding_mask=(
                (tokens != LayoutVocab.PAD) if mode == "train" else None),
        )
        # tied output projection
        return x @ self.embed.embedding.T.astype(x.dtype)

    def __call__(self, tokens):  # [B, T] -> [B, T, V]
        return self._logits(tokens, "train", 0)

    def prefill(self, tokens, cache_size: int):
        return self._logits(tokens, "prefill", cache_size)

    def decode_step(self, tokens, cache_size: int):
        return self._logits(tokens, "decode", cache_size)


def make_planner_fns(model: LayoutPlannerLM, cache_size: int):
    """(prefill, step) pair for runtime/generate.py drivers."""

    def prefill(params, tokens, aux):
        logits, vars_ = model.apply(
            {"params": params}, tokens, cache_size,
            method=model.prefill, mutable=["cache"])
        return logits, vars_["cache"]

    def step(params, tokens, cache, aux):
        logits, vars_ = model.apply(
            {"params": params, "cache": cache}, tokens, cache_size,
            method=model.decode_step, mutable=["cache"])
        return logits, vars_["cache"]

    return prefill, step


def planner_example(
    vocab: LayoutVocab, caption: str, layout: Layout, max_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(tokens [max_len], loss_mask [max_len]) — next-token CE is masked to
    the layout segment only (the caption is conditioning, not target),
    matching instruction-tuning loss masking in train_layout_planner.sh's
    fastchat recipe."""
    prompt = [vocab.BOS] + vocab.encode_text(caption) + [vocab.BOX]
    target = vocab.encode_layout(layout)
    ids = (prompt + target)[:max_len]
    mask = ([0.0] * len(prompt) + [1.0] * len(target))[:max_len]
    pad = max_len - len(ids)
    tokens = np.asarray(ids + [vocab.PAD] * pad, np.int32)
    # mask applies to the PREDICTION of position i (i.e. logits[i-1])
    loss_mask = np.asarray(mask + [0.0] * pad, np.float32)
    return tokens, loss_mask


def planner_loss(model: LayoutPlannerLM, params, tokens, loss_mask):
    """Masked next-token cross-entropy."""
    logits = model.apply({"params": params}, tokens)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = loss_mask[:, 1:]
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


# --------------------------------------------------------------------------- #
# Two-stage pipeline: plan (M1) -> rasterize -> diffuse (M2)
# --------------------------------------------------------------------------- #

@dataclasses.dataclass
class TextDiffuser2Pipeline:
    """plan_layout + char-mask DDIM rendering, the full t2i path of
    inference_textdiffuser2_t2i_full.py (sans SD checkpoint, which cannot be
    fetched offline — M2 is the standalone-trainable UNet of
    models/textdiffuser.py)."""

    planner: LayoutPlannerLM
    planner_params: Any
    unet: TextDiffuserUNet
    unet_params: Any
    vocab: LayoutVocab = dataclasses.field(default_factory=LayoutVocab)
    prompt_len: int = 96
    max_new_tokens: int = 160

    def plan(self, caption: str, rng: Optional[jax.Array] = None,
             temperature: float = 0.7, sample: bool = False) -> Layout:
        """M1: caption -> layout (t2i_full.py:518 generates with
        do_sample=True, temperature=0.7; greedy is the deterministic mode)."""
        from unilm_tpu.runtime.generate import GenerationConfig, greedy_generate

        prompt = jnp.asarray(
            self.vocab.encode_prompt(caption, self.prompt_len))[None]
        n_valid = int(jnp.sum(prompt != self.vocab.PAD))
        prompt = prompt[:, :n_valid]
        cache_size = n_valid + self.max_new_tokens
        prefill, step = make_planner_fns(self.planner, cache_size)
        cfg = GenerationConfig(
            max_new_tokens=self.max_new_tokens,
            eos=self.vocab.EOS, pad=self.vocab.PAD,
            sampling=sample, temperature=temperature if sample else 1.0,
        )
        tokens, _ = greedy_generate(
            cfg, prefill, step, self.planner_params, prompt,
            rng=rng if rng is not None else jax.random.PRNGKey(0))
        return self.vocab.decode_layout(np.asarray(tokens[0, n_valid:]))

    def render(self, layout: Layout, rng: jax.Array,
               steps: int = 20) -> jax.Array:
        """M2: layout -> image via char-mask conditioned DDIM."""
        img_size = self.unet.cfg.img_size
        boxes = layout_to_pixel_boxes(layout, img_size)
        mask = jnp.asarray(render_char_mask(boxes, img_size))[None]
        return ddim_sample(self.unet, self.unet_params, mask, rng,
                           self.unet.cfg, steps=steps)

    def __call__(self, caption: str, rng: jax.Array, steps: int = 20,
                 sample_layout: bool = False) -> Tuple[jax.Array, Layout]:
        r_plan, r_img = jax.random.split(rng)
        layout = self.plan(caption, r_plan, sample=sample_layout)
        return self.render(layout, r_img, steps=steps), layout
