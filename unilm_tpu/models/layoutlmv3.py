"""LayoutLMv3: text + 2D layout + image patches (document AI).

Capability-equivalent of reference
layoutlmv3/layoutlmft/models/layoutlmv3/modeling_layoutlmv3.py:
- word + 1D-position + 2D bbox (x/y corners concat + h/w) embeddings (:77-186)
- conv16 patch embedding with cls token, visual pos embed + LN (:783-800)
- visual bbox grid over a 1000-unit page (:760-781)
- 1D & 2D bucketed relative attention bias, segment-aware valid_span and
  image-text distance-0 (:507-577); bias added as (rel_pos+rel_2d)/sqrt(d)
  (:318-321) — passed pre-scaled into the shared attention core
- CogView PB-relax softmax (:259-272) is numerically identical to the
  max-subtracted fp32 softmax the core always uses, so no special path
- heads: token classification :1015, QA :1101, sequence classification :1196

Post-LN (RoBERTa-style) configuration of the shared Encoder core.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.embedding import PatchEmbed
from unilm_tpu.core.positional import relative_position_bucket
from unilm_tpu.core.transformer import Encoder


@dataclasses.dataclass(frozen=True)
class LayoutLMv3Config:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 514
    pad_token_id: int = 1
    type_vocab_size: int = 1
    coordinate_size: int = 128
    shape_size: int = 128
    max_2d_positions: int = 1024
    rel_pos_bins: int = 32
    max_rel_pos: int = 128
    rel_2d_pos_bins: int = 64
    max_rel_2d_pos: int = 256
    input_size: int = 224
    patch_size: int = 16
    num_labels: int = 2
    dropout: float = 0.0
    layernorm_eps: float = 1e-5
    visual_embed: bool = True
    has_relative_attention_bias: bool = True
    has_spatial_attention_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True
    # Pass the relative bias SYMBOLICALLY (packed bucket planes + [nb, H]
    # tables, ops/bucket_bias.py) so the flash kernel reconstructs each bias
    # tile in-VMEM instead of streaming a materialized [B, H, T, S] tensor.
    # Falls back to the materialized form wherever the fused kernel doesn't
    # apply (non-TPU, dropout, oversized S).
    fused_bias: bool = True
    remat: bool = False  # HF gradient_checkpointing equivalent
    remat_policy: str = "full"

    @property
    def visual_grid(self):
        g = self.input_size // self.patch_size
        return (g, g)

    @property
    def visual_len(self) -> int:
        g = self.visual_grid
        return g[0] * g[1] + 1

    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            embed_dim=self.hidden_size,
            ffn_dim=self.ffn_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dropout=self.dropout,
            normalize_before=False,  # post-LN RoBERTa encoder
            layernorm_eps=self.layernorm_eps,
            dtype=self.dtype,
            use_flash=self.use_flash,
            remat=self.remat,
            remat_policy=self.remat_policy,
        )


def _bucket_take(table: jax.Array, buckets: jax.Array, nb: int,
                 dtype=jnp.float32) -> jax.Array:
    """Per-head bias lookup as a one-hot matmul on the MXU: [nb,H] table
    indexed by per-example [B,T,S] buckets -> [B,H,T,S].

    A gather (table[buckets]) runs on the TPU scalar path: measured 174 ms
    for LayoutLMv3-B's three tables at B=32/S=709 vs 6 ms for this matmul
    form (29x; 191 ms of a 234 ms forward). Layout matters too: gathering
    [nb,H] tables puts H=12 in the lane dim, padded to 128 — a 10.7x
    memory expansion (16.5 GB at B=64, OOM); here every intermediate keeps
    B*T*S in the lane dim.

    Autodiff of the dot is itself a dot (dtable = g-contraction against the
    one-hot matrix), so no custom VJP: the gather's autodiff backward was a
    scatter-add serialized on the scalar path (655 ms of an 810 ms step).

    One-hot values are exact in any dtype; pass dtype=bf16 in bf16 training
    (table rounding ~2^-8 relative, below the bf16 attention-logit noise).
    """
    B, T, S = buckets.shape
    H = table.shape[1]
    oh = jax.nn.one_hot(buckets.reshape(-1), nb, dtype=dtype)  # [BTS, nb]
    r = jax.lax.dot_general(
        table.T.astype(dtype), oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, BTS]
    return jnp.moveaxis(r.reshape(H, B, T, S), 0, 1)  # [B,H,T,S]


def create_position_ids(input_ids: jax.Array, padding_idx: int) -> jax.Array:
    """fairseq make_positions: pads stay at padding_idx (modeling:134-146)."""
    mask = (input_ids != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def visual_bbox_grid(grid=(14, 14), max_len: int = 1000) -> np.ndarray:
    """[1 + g*g, 4] page-normalized patch boxes (+cls box) (modeling:760-781)."""
    gy, gx = grid
    xs = (np.arange(0, max_len * (gx + 1), max_len) // gx).astype(np.int64)
    ys = (np.arange(0, max_len * (gy + 1), max_len) // gy).astype(np.int64)
    boxes = np.stack(
        [
            np.tile(xs[:-1], (gy, 1)),
            np.tile(ys[:-1], (gx, 1)).T,
            np.tile(xs[1:], (gy, 1)),
            np.tile(ys[1:], (gx, 1)).T,
        ],
        axis=-1,
    ).reshape(-1, 4)
    cls_box = np.array([[1, 1, max_len - 1, max_len - 1]], np.int64)
    return np.concatenate([cls_box, boxes], axis=0)


class SpatialEmbedding(nn.Module):
    """x/y corner + h/w embeddings concatenated (modeling:104-123)."""

    cfg: LayoutLMv3Config

    @nn.compact
    def __call__(self, bbox: jax.Array) -> jax.Array:
        cfg = self.cfg
        emb = lambda n, d: nn.Embed(
            cfg.max_2d_positions, d, embedding_init=nn.initializers.normal(0.02), name=n
        )
        x_emb = emb("x_position_embeddings", cfg.coordinate_size)
        y_emb = emb("y_position_embeddings", cfg.coordinate_size)
        h_emb = emb("h_position_embeddings", cfg.shape_size)
        w_emb = emb("w_position_embeddings", cfg.shape_size)
        left = x_emb(bbox[..., 0])
        upper = y_emb(bbox[..., 1])
        right = x_emb(bbox[..., 2])
        lower = y_emb(bbox[..., 3])
        h = h_emb(jnp.clip(bbox[..., 3] - bbox[..., 1], 0, 1023))
        w = w_emb(jnp.clip(bbox[..., 2] - bbox[..., 0], 0, 1023))
        return jnp.concatenate([left, upper, right, lower, h, w], axis=-1)


def relative_bucket_planes(
    cfg: "LayoutLMv3Config",
    position_ids: jax.Array,   # [B, T] 1D positions (text then visual)
    full_bbox: jax.Array,      # [B, T, 4] text+visual boxes, 0..1000
    valid_span: Optional[jax.Array] = None,  # [B, L, L] same-segment mask
    visual_len: int = 0,       # trailing visual tokens (distance-0 vs text)
    want_1d: bool = True,
    want_2d: bool = True,
):
    """Int bucket planes [(B, T, S)] for (1D, x, y) relative bias
    (modeling_layoutlmv3.py:507-577). Consumed either by `_bucket_take`
    (materialized bias) or packed for `ops.bucket_bias` (the fused kernel
    reconstructs bias tiles in-VMEM from these indices)."""
    planes = []
    if want_1d:
        rel = position_ids[:, None, :] - position_ids[:, :, None]  # [B, T, T]
        if valid_span is not None:
            V = visual_len
            T = position_ids.shape[1]
            big = position_ids.shape[1]
            tt = rel[:, : T - V, : T - V]
            tt = jnp.where((tt > 0) & (~valid_span), big, tt)
            tt = jnp.where((tt < 0) & (~valid_span), -big, tt)
            rel = rel.at[:, : T - V, : T - V].set(tt)
            if V:
                rel = rel.at[:, T - V :, : T - V].set(0)
                rel = rel.at[:, : T - V, T - V :].set(0)
        # rel[i, j] = pos[j] - pos[i] (memory - context), same convention
        # as relative_position_bucket's input
        planes.append(relative_position_bucket(
            rel, True, cfg.rel_pos_bins, cfg.max_rel_pos
        ))
    if want_2d:
        cx = full_bbox[..., 0]
        cy = full_bbox[..., 3]
        planes.append(relative_position_bucket(
            cx[:, None, :] - cx[:, :, None], True, cfg.rel_2d_pos_bins,
            cfg.max_rel_2d_pos,
        ))
        planes.append(relative_position_bucket(
            cy[:, None, :] - cy[:, :, None], True, cfg.rel_2d_pos_bins,
            cfg.max_rel_2d_pos,
        ))
    return planes


def relative_attention_bias(
    cfg: "LayoutLMv3Config",
    t1: Optional[jax.Array],   # [rel_pos_bins, H] or None
    tx: Optional[jax.Array],   # [rel_2d_pos_bins, H] or None
    ty: Optional[jax.Array],
    position_ids: jax.Array,   # [B, T] 1D positions (text then visual)
    full_bbox: jax.Array,      # [B, T, 4] text+visual boxes, 0..1000
    valid_span: Optional[jax.Array] = None,  # [B, L, L] same-segment mask
    visual_len: int = 0,       # trailing visual tokens (distance-0 vs text)
) -> Optional[jax.Array]:
    """The (rel_pos + rel_2d_pos)/sqrt(d) attention bias, [B, H, T, S]
    (modeling_layoutlmv3.py:507-577,318-321), shared by every layer.

    Standalone (not a module method) so benchmarks/diagnostics can time the
    bias computation in isolation with the same tables the model learned.
    This is the MATERIALIZED form — the training hot path uses the fused
    bucket-bias kernel (ops/bucket_bias.py) instead, which never builds the
    [B, H, T, S] tensor; this function remains the oracle and the fallback.
    """
    planes = relative_bucket_planes(
        cfg, position_ids, full_bbox, valid_span, visual_len,
        want_1d=t1 is not None, want_2d=tx is not None,
    )
    bias = None
    i = 0
    if t1 is not None:
        bias = _bucket_take(t1, planes[i], cfg.rel_pos_bins, dtype=cfg.dtype)
        i += 1
    if tx is not None:
        b2d = (
            _bucket_take(tx, planes[i], cfg.rel_2d_pos_bins, dtype=cfg.dtype)
            + _bucket_take(ty, planes[i + 1], cfg.rel_2d_pos_bins, dtype=cfg.dtype)
        )  # [B,H,T,S]
        bias = b2d if bias is None else bias + b2d
    if bias is not None:
        # reference adds (rel_pos + rel_2d_pos)/sqrt(d) (modeling:318-321).
        # Keep the [B,H,T,S] table at the compute dtype: in bf16 training
        # the f32 version is the single largest HBM allocation (1.17 GB at
        # B=48) and the attention math downstream is bf16 anyway.
        bias = (bias / float(cfg.hidden_size // cfg.num_heads) ** 0.5
                ).astype(cfg.dtype)
    return bias


class LayoutLMv3Model(nn.Module):
    cfg: LayoutLMv3Config

    def bias_tables(self):
        """Learned bucket->heads tables (nn.Linear over one-hot in reference
        == embedding lookup; encoder rel_pos_bias/rel_pos_x_bias/rel_pos_y_bias)."""
        cfg = self.cfg
        mk = lambda name, bins: self.param(
            name, nn.initializers.normal(0.02), (bins, cfg.num_heads)
        )
        t1 = mk("rel_pos_bias", cfg.rel_pos_bins) if cfg.has_relative_attention_bias else None
        tx = mk("rel_pos_x_bias", cfg.rel_2d_pos_bins) if cfg.has_spatial_attention_bias else None
        ty = mk("rel_pos_y_bias", cfg.rel_2d_pos_bins) if cfg.has_spatial_attention_bias else None
        return t1, tx, ty

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,  # [B, L]
        bbox: jax.Array,  # [B, L, 4] in 0..1000
        attention_mask: Optional[jax.Array] = None,  # [B, L] 1=valid
        images: Optional[jax.Array] = None,  # [B, H, W, 3] NHWC
        valid_span: Optional[jax.Array] = None,  # [B, L, L] same-segment mask
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        tcfg = cfg.transformer()
        B, L = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, L), jnp.int32)

        # ---- text embeddings -------------------------------------------------
        word = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02), name="word_embeddings",
        )(input_ids)
        tok_type = nn.Embed(
            cfg.type_vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02), name="token_type_embeddings",
        )(jnp.zeros_like(input_ids))
        pos_ids = create_position_ids(input_ids, cfg.pad_token_id)
        pos = nn.Embed(
            cfg.max_positions, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02), name="position_embeddings",
        )(pos_ids)
        spatial = SpatialEmbedding(cfg, name="spatial")(bbox)
        x = word + tok_type + pos + spatial
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="emb_LayerNorm")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        full_bbox = bbox
        position_ids = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        key_padding = attention_mask.astype(bool)

        # ---- visual stream -----------------------------------------------------
        if cfg.visual_embed and images is not None:
            v = PatchEmbed(cfg.patch_size, cfg.hidden_size, name="patch_embed")(images)
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size))
            v = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.hidden_size)), v], 1)
            pos_embed = self.param(
                "pos_embed", nn.initializers.zeros, (1, cfg.visual_len, cfg.hidden_size)
            )
            v = v + pos_embed
            v = nn.Dropout(cfg.dropout)(v, deterministic=deterministic)
            v = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="visual_norm")(v)

            x = jnp.concatenate([x, v], axis=1)
            x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="LayerNorm")(x)
            x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

            vb = jnp.asarray(visual_bbox_grid(cfg.visual_grid))
            full_bbox = jnp.concatenate(
                [bbox, jnp.broadcast_to(vb[None], (B,) + vb.shape)], axis=1
            )
            vis_pos = jnp.broadcast_to(jnp.arange(cfg.visual_len)[None], (B, cfg.visual_len))
            position_ids = jnp.concatenate([position_ids, vis_pos], axis=1)
            key_padding = jnp.concatenate(
                [key_padding, jnp.ones((B, cfg.visual_len), bool)], axis=1
            )

        # ---- relative attention bias (computed once, shared by layers) ---------
        t1, tx, ty = self.bias_tables()
        vlen = cfg.visual_len if (cfg.visual_embed and images is not None) else 0
        if cfg.fused_bias and (t1 is not None or tx is not None):
            # One-contraction-per-step bias path: materialize the shared
            # bias ONCE in bf16 via the one-hot MXU lookup (it is identical
            # for every layer — modeling_layoutlmv3.py:318 computes it once
            # too), STOP-GRADIENT it, and add the bias_grad_collector's
            # lazy zeros. The layers stream the bf16 plane through the
            # blocked one-pass doc kernel (ops/doc_attention.py), whose
            # backward emits the logit grad `ds` as dbias; JAX sums the 12
            # layers' cotangents into the collector, whose VJP does ONE
            # one-hot table contraction per step — no per-layer f32 dbias,
            # no per-layer contraction. (The in-kernel gather variant,
            # ops/bucket_bias.py, loses to streaming at S<=2048: the VPU
            # lane-gather costs ~2.5 ms/layer-pass vs 0.5 ms of HBM.)
            from unilm_tpu.ops.bucket_bias import (BucketBias,
                                                   bias_grad_collector,
                                                   materialize_bias,
                                                   pack_bucket_planes)

            planes = relative_bucket_planes(
                cfg, position_ids, full_bbox, valid_span, vlen,
                want_1d=t1 is not None, want_2d=tx is not None,
            )
            tables = tuple(t for t in (t1, tx, ty) if t is not None)
            packed = pack_bucket_planes(*planes)
            head_scale = float(cfg.hidden_size // cfg.num_heads) ** -0.5
            Bv, Tv, Sv = packed.shape
            Bq = position_ids.shape[0]
            from unilm_tpu.ops.doc_attention import HeadMajorBias

            sym = BucketBias(packed=packed, tables=tables, scale=head_scale)
            # HEAD-MAJOR [H, B, T, S]: the one-hot dot's natural output
            # order — the [B, H, *] transpose of this 386 MB plane lowers
            # to an XLA while-loop worth ~16 ms/step (profiled); the doc
            # kernel streams head-major natively. Bias dtype FOLLOWS the
            # compute dtype: hardcoded bf16 silently deviated from the
            # reference's f32 bias math in exact-parity (f32) runs
            # (round-4 advisor finding).
            bias_dt = cfg.dtype
            dense = jax.lax.stop_gradient(
                materialize_bias(sym, bias_dt, layout="hbts"))
            if dense.shape[1] == 1 and Bq > 1:
                dense = jnp.broadcast_to(
                    dense, (dense.shape[0], Bq) + dense.shape[2:])
            # tables are shared by all layers: their gradient is ONE
            # contraction of the layer-summed logit grads — the collector
            # receives that sum as its cotangent (bucket_bias.py)
            vbias = bias_grad_collector(
                tables, packed, (cfg.num_heads, Bq, Tv, Sv),
                jnp.dtype(bias_dt).name, head_scale, "hbts")
            bias = HeadMajorBias(hbts=dense + vbias)
        else:
            bias = relative_attention_bias(
                cfg, t1, tx, ty, position_ids, full_bbox,
                valid_span=valid_span, visual_len=vlen,
            )

        return Encoder(tcfg, name="encoder")(
            x,
            key_padding_mask=key_padding,
            attn_bias=bias,
            deterministic=deterministic,
        )


class ClassificationHead(nn.Module):
    """dense -> tanh -> out_proj (modeling:990-1013, RobertaClassificationHead)."""

    cfg: LayoutLMv3Config
    num_labels: int

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dropout(self.cfg.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.cfg.hidden_size, name="dense")(x)
        x = jnp.tanh(x)
        x = nn.Dropout(self.cfg.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_labels, name="out_proj")(x)


class LayoutLMv3ForTokenClassification(nn.Module):
    """FUNSD/CORD token classification (modeling:1015-1099). Returns logits for
    the text positions only (visual tokens dropped, like the reference)."""

    cfg: LayoutLMv3Config

    @nn.compact
    def __call__(self, input_ids, bbox, attention_mask=None, images=None,
                 valid_span=None, deterministic=True):
        cfg = self.cfg
        seq = LayoutLMv3Model(cfg, name="layoutlmv3")(
            input_ids, bbox, attention_mask, images, valid_span, deterministic
        )
        text = seq[:, : input_ids.shape[1]]
        text = nn.Dropout(cfg.dropout)(text, deterministic=deterministic)
        if cfg.num_layers <= 12:
            return nn.Dense(cfg.num_labels, name="classifier")(text)
        return ClassificationHead(cfg, cfg.num_labels, name="classifier")(
            text, deterministic
        )


class LayoutLMv3ForSequenceClassification(nn.Module):
    cfg: LayoutLMv3Config

    @nn.compact
    def __call__(self, input_ids, bbox, attention_mask=None, images=None,
                 valid_span=None, deterministic=True):
        seq = LayoutLMv3Model(self.cfg, name="layoutlmv3")(
            input_ids, bbox, attention_mask, images, valid_span, deterministic
        )
        return ClassificationHead(self.cfg, self.cfg.num_labels, name="classifier")(
            seq[:, 0], deterministic
        )


class LayoutLMv3ForQuestionAnswering(nn.Module):
    cfg: LayoutLMv3Config

    @nn.compact
    def __call__(self, input_ids, bbox, attention_mask=None, images=None,
                 valid_span=None, deterministic=True):
        seq = LayoutLMv3Model(self.cfg, name="layoutlmv3")(
            input_ids, bbox, attention_mask, images, valid_span, deterministic
        )
        logits = nn.Dense(2, name="qa_outputs")(seq[:, : input_ids.shape[1]])
        return logits[..., 0], logits[..., 1]  # start, end


def layoutlmv3_base(**kw) -> LayoutLMv3Config:
    return LayoutLMv3Config(**kw)


def layoutlmv3_large(**kw) -> LayoutLMv3Config:
    return LayoutLMv3Config(
        hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=4096,
        coordinate_size=171, shape_size=170, **kw
    )
