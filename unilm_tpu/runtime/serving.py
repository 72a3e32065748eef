"""Batched serving engine: continuous batching over a paged KV cache.

The reference serves its decoder LMs through fairseq's SequenceGenerator
(one contiguous KV per sequence, batch fixed for the whole generate call)
and, for ReSA, through vLLM (ReSA/llm). This module is the TPU-native
serving story that ties our pieces together:

- `PagedGPT`: a serving-mode twin of `models.kosmos.UniGPT`'s text path with
  an IDENTICAL param tree (embed_tokens / decoder / layers_i / self_attn /
  ffn ...), so any trained or converted UniGPT checkpoint serves unchanged.
  With `cfg.scan_layers` the stack runs as ONE lax.scan over stacked
  params (looped checkpoints auto-stacked by the engine; docs/DECODING.md).
  Self-attention reads/writes a vLLM-style paged pool (FLAT
  [L*pages, page, H*D] + per-slot block tables) instead of per-sequence
  contiguous caches: prefill scatters prompt KV into pages (XLA gather
  attention, causal); decode steps run the contiguous-run slab-streaming
  Pallas kernel (~HBM-roofline, ops/paged_attention._run_decode_kernel)
  when the allocator placed the slot's pages contiguously, else the
  block-table-walking kernel.
- `ServingEngine`: host-side continuous batching (vLLM block-manager style):
  fixed decode slots, per-request page reservation at admission, greedy
  decode for the whole batch in ONE jitted step, finished sequences free
  their pages and the next queued request is admitted into the empty slot —
  no generate-call barrier, mixed sequence lengths share HBM.

Design notes (TPU-first): everything on device is static-shape — slot count,
page pool, block tables, chunked prefill with ONE fixed-size program. Page 0
is a trash page: pad positions and inactive slots scatter there so no
sequence reads another's KV. Pages for prompt+max_new are reserved at
admission (simpler than vLLM's on-demand growth + preemption; admission
backpressures instead).

Prompts prefill in prefill_bucket-sized chunks interleaved with decode
steps (Sarathi-style), and full prompt pages register in a prefix cache:
a later request whose prompt starts with a cached page chain reuses those
pages (refcounted; rc==0 pages are retained for future hits and evicted
under pool pressure) and skips their prefill entirely.
"""

from __future__ import annotations

import dataclasses
import math
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.layers import FeedForward, make_norm, scaled_init
from unilm_tpu.core import positional
from unilm_tpu.models.kosmos import UniGPTConfig, sinusoidal_table


# --------------------------------------------------------------------------- #
# Serving-mode modules (param-tree mirrors of core Decoder / UniGPT)
# --------------------------------------------------------------------------- #


def _per_batch_xpos(x, pos, scale_base, invert=False):
    """Apply xPos at per-batch absolute positions. x [B,T,H,D], pos [B,T]."""
    B, T, H, D = x.shape
    sin, cos, scale = positional.xpos_sin_cos_scale(
        pos.reshape(-1), jnp.zeros((), jnp.float32), D, scale_base
    )
    sin = sin.reshape(B, 1, T, -1)
    cos = cos.reshape(B, 1, T, -1)
    scale = scale.reshape(B, 1, T, -1)
    if invert:
        scale = 1.0 / scale
    xt = x.swapaxes(1, 2)  # [B,H,T,D]
    out = positional.apply_xpos(xt, sin, cos, scale)
    return out.swapaxes(1, 2)


class PagedSelfAttention(nn.Module):
    """MultiheadAttention's serving twin: same projections/param names,
    KV lives in the shared page pool.

    The pool is ONE flat array [L*P, page, H*D] shared by all layers;
    `block_tables` arrives pre-offset by layer_idx*P (so every update is a
    chained in-place scatter on the same buffer — no per-layer unstack /
    restack copies, which would move GBs per decode step).

    `use_kernel=False` forces the XLA scatter/gather formulation — required
    under a multi-chip GSPMD mesh (the Pallas kernel is single-device; the
    XLA path partitions cleanly with pools sharded over heads)."""

    cfg: TransformerConfig
    use_kernel: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, E]
        k_pool: jax.Array,  # [L*P, page, H*D] flat pool (a [.., H, D] view
        # lane-pads D to 128 on TPU; reshaping per layer would relayout-copy
        # the whole pool — measured 4x the decode-attention kernel cost)
        v_pool: jax.Array,
        block_tables: jax.Array,  # [B, MP] int32, layer-offset applied
        lengths: jax.Array,  # [B] tokens already in cache
        n_valid: jax.Array,  # [B] valid (non-pad) tokens in x
        trash_page: int = 0,  # this layer's trash page id
        bases: Optional[jax.Array] = None,  # [B] first page of each run
        chunk_pages: int = 8,
        scale_pool: Optional[jax.Array] = None,  # int8 KV: [slabs, 8, S] f32
    ):
        cfg = self.cfg
        H, D, E = cfg.num_heads, cfg.head_dim, cfg.embed_dim
        B, T = x.shape[0], x.shape[1]
        page = k_pool.shape[1]
        quantized = scale_pool is not None

        qk_init = scaled_init(nn.initializers.xavier_uniform(), 2**-0.5)
        vo_scale = (1.0 / cfg.deepnorm_init_div) * cfg.subln_init_mul
        v_init = scaled_init(nn.initializers.xavier_uniform(), (2**-0.5) * vo_scale)
        o_init = scaled_init(nn.initializers.xavier_uniform(), vo_scale)

        from unilm_tpu.core.layers import make_dense

        def proj(name, init):
            return make_dense(cfg, H * D, kernel_init=init, name=name)

        q = proj("q_proj", qk_init)(x).reshape(B, T, H, D)
        k = proj("k_proj", qk_init)(x).reshape(B, T, H, D)
        v = proj("v_proj", v_init)(x).reshape(B, T, H, D)

        pos = lengths[:, None] + jnp.arange(T)[None, :]  # [B, T] absolute
        if cfg.xpos_rel_pos:
            q = _per_batch_xpos(q, pos, cfg.xpos_scale_base)
            k = _per_batch_xpos(k, pos, cfg.xpos_scale_base, invert=True)
            k_len = (lengths + n_valid).astype(jnp.float32)  # [B]
            p = jnp.maximum(pos.astype(jnp.float32), 1.0)
            mult = jnp.maximum(1.0, jnp.log(p) / math.log(cfg.scale_length))
            qscale = jnp.where(
                (k_len > cfg.scale_length)[:, None], mult, jnp.ones_like(mult)
            )
            q = (q * qscale[:, :, None, None]).astype(q.dtype)

        scale = cfg.attn_scale if cfg.attn_scale is not None else D**-0.5
        from unilm_tpu.ops.paged_attention import kernel_supported

        if (T == 1 and self.use_kernel and jax.default_backend() == "tpu"
                and kernel_supported(H, D, page, k_pool.dtype)
                and (bases is not None or not quantized)):
            if bases is not None:
                # contiguous-run path: in-place row scatter + pure-read
                # slab-streaming kernel (~140us/layer ~= HBM roofline at
                # B=8/ctx=2048 on v5e — see ops/paged_attention)
                from unilm_tpu.ops.paged_attention import (
                    run_decode_append_attention,
                )

                if quantized:
                    out, k_pool, v_pool, scale_pool = (
                        run_decode_append_attention(
                            q, k, v, k_pool, v_pool, bases, lengths,
                            max_pages=block_tables.shape[1], scale=scale,
                            chunk=chunk_pages, scale_pool=scale_pool,
                        ))
                else:
                    out, k_pool, v_pool = run_decode_append_attention(
                        q, k, v, k_pool, v_pool, bases, lengths,
                        max_pages=block_tables.shape[1], scale=scale,
                        chunk=chunk_pages,
                    )
            else:
                from unilm_tpu.ops.paged_attention import (
                    paged_decode_append_attention,
                )

                out, k_pool, v_pool = paged_decode_append_attention(
                    q, k, v, k_pool, v_pool, block_tables, lengths, scale=scale
                )
            out = out.reshape(B, T, H * D)
            if cfg.subln:
                out = make_norm(cfg, "inner_attn_ln")(out)
            out = make_dense(cfg, E, kernel_init=o_init, name="out_proj")(out)
            return out, k_pool, v_pool, scale_pool

        # ---- scatter new KV into pages (invalid positions -> trash page)
        valid = jnp.arange(T)[None, :] < n_valid[:, None]  # [B, T]
        slot = pos // page
        slot = jnp.clip(slot, 0, block_tables.shape[1] - 1)
        page_ids = jnp.where(
            valid, jnp.take_along_axis(block_tables, slot, axis=1), trash_page
        )
        offs = pos % page
        if quantized:
            from unilm_tpu.ops.paged_attention import quantize_kv_rows

            ki, vi, ks, vs = quantize_kv_rows(
                k.reshape(B * T, H * D), v.reshape(B * T, H * D))
            k_pool = k_pool.at[page_ids, offs].set(ki.reshape(B, T, H * D))
            v_pool = v_pool.at[page_ids, offs].set(vi.reshape(B, T, H * D))
            chunk = chunk_pages
            S_slab = chunk * page
            slab_ids = page_ids // chunk
            slab_pos = (page_ids % chunk) * page + offs
            scale_pool = scale_pool.at[slab_ids, 0, slab_pos].set(
                ks.reshape(B, T))
            scale_pool = scale_pool.at[slab_ids, 1, slab_pos].set(
                vs.reshape(B, T))
            # dequantize for the XLA attention below (fallback path only:
            # tiny on CPU tests; the TPU hot path uses the int8 kernel)
            nslab = scale_pool.shape[0]
            ksc = scale_pool[:, 0].reshape(nslab * chunk, page)[:, :, None]
            vsc = scale_pool[:, 1].reshape(nslab * chunk, page)[:, :, None]
            k_read = (k_pool.astype(cfg.dtype) * ksc.astype(cfg.dtype))
            v_read = (v_pool.astype(cfg.dtype) * vsc.astype(cfg.dtype))
        else:
            k_pool = k_pool.at[page_ids, offs].set(
                k.reshape(B, T, H * D).astype(k_pool.dtype))
            v_pool = v_pool.at[page_ids, offs].set(
                v.reshape(B, T, H * D).astype(v_pool.dtype))
            k_read, v_read = k_pool, v_pool

        if T == 1:
            from unilm_tpu.runtime.paged_kv import paged_attention

            out = paged_attention(
                q, k_read, v_read, block_tables, lengths + 1, scale=scale,
                use_kernel=(None if self.use_kernel and not quantized
                            else False),
            )
        else:
            # prefill: gather this batch's pages, causal + ragged mask
            kk = k_read[block_tables].reshape(B, -1, H, D)  # [B, S, H, D]
            vv = v_read[block_tables].reshape(B, -1, H, D)
            S = kk.shape[1]
            j = jnp.arange(S)[None, None, :]  # logical key positions
            causal_ok = j <= pos[:, :, None]  # [B, T, S]
            in_seq = j < (lengths + n_valid)[:, None, None]
            logits = jnp.einsum(
                "bthd,bshd->bhts", q * scale, kk, preferred_element_type=jnp.float32
            )
            logits = jnp.where((causal_ok & in_seq)[:, None], logits, -1e30)
            p = jax.nn.softmax(logits, axis=-1).astype(vv.dtype)
            out = jnp.einsum("bhts,bshd->bthd", p, vv)

        out = out.reshape(B, T, H * D)
        if cfg.subln:
            out = make_norm(cfg, "inner_attn_ln")(out)
        out = make_dense(cfg, E, kernel_init=o_init, name="out_proj")(out)
        return out, k_pool, v_pool, scale_pool


class PagedDecoderLayer(nn.Module):
    cfg: TransformerConfig
    layer_idx: int = 0
    pages_per_layer: int = 0  # logical pages P; this layer owns [i*P, (i+1)*P)
    use_kernel: bool = True
    chunk_pages: int = 8

    @nn.compact
    def __call__(self, x, k_pool, v_pool, block_tables, lengths, n_valid,
                 bases=None, scale_pool=None):
        cfg = self.cfg
        assert cfg.normalize_before, "serving path assumes pre-LN (Magneto/subln)"
        off = self.layer_idx * self.pages_per_layer
        residual = x
        h = make_norm(cfg, "self_attn_layer_norm")(x)
        h, k_pool, v_pool, scale_pool = PagedSelfAttention(
            cfg, use_kernel=self.use_kernel, name="self_attn")(
            h, k_pool, v_pool, block_tables + off, lengths, n_valid,
            trash_page=off,
            bases=None if bases is None else bases + off,
            chunk_pages=self.chunk_pages,
            scale_pool=scale_pool,
        )
        x = residual + h
        residual = x
        h = make_norm(cfg, "final_layer_norm")(x)
        from unilm_tpu.core.transformer import _build_ffn

        ffn, is_moe = _build_ffn(cfg, self.layer_idx)
        if is_moe:
            # X-MoE FFN (core/moe.py einsum dispatch; EP sharding via GSPMD
            # when served under a mesh with an 'expert' axis)
            h, _aux = ffn(h, deterministic=True)
            x = residual + h
        else:
            x = residual + ffn(h, deterministic=True)
        return x, k_pool, v_pool, scale_pool


class _ScanPagedLayer(nn.Module):
    """nn.scan body for the serving stack (cfg.scan_layers): carry threads
    (x, pools, scale_pool, layer_index); the pools are loop-carried buffers
    so per-layer updates stay in place — same design as the generate-path
    scan (core/transformer._ScanDecoderLayerKV). The layer-region offset
    li*P becomes a traced value added to tables/bases/trash (all are
    runtime operands of the kernels already)."""

    cfg: TransformerConfig
    pages_per_layer: int = 0
    use_kernel: bool = True
    chunk_pages: int = 8

    @nn.compact
    def __call__(self, carry, block_tables, lengths, n_valid, bases):
        cfg = self.cfg
        x, k_pool, v_pool, scale_pool, li = carry
        assert cfg.normalize_before, "serving path assumes pre-LN"
        off = li * self.pages_per_layer
        residual = x
        h = make_norm(cfg, "self_attn_layer_norm")(x)
        sp = scale_pool if jnp.ndim(scale_pool) > 0 else None
        h, k_pool, v_pool, sp = PagedSelfAttention(
            cfg, use_kernel=self.use_kernel, name="self_attn")(
            h, k_pool, v_pool, block_tables + off, lengths, n_valid,
            trash_page=off,
            bases=None if bases is None or jnp.ndim(bases) == 0
            else bases + off,
            chunk_pages=self.chunk_pages,
            scale_pool=sp,
        )
        if sp is not None:
            scale_pool = sp
        x = residual + h
        residual = x
        h = make_norm(cfg, "final_layer_norm")(x)
        from unilm_tpu.core.transformer import _build_ffn

        # dense only (the scan_layers dispatch asserts moe_freq == 0)
        ffn, _ = _build_ffn(cfg, 0)
        x = residual + ffn(h, deterministic=True)
        return (x, k_pool, v_pool, scale_pool, li + 1), None


class PagedDecoderStack(nn.Module):
    cfg: TransformerConfig
    pages_per_layer: int = 0
    use_kernel: bool = True
    chunk_pages: int = 8

    @nn.compact
    def __call__(self, x, k_pool, v_pool, block_tables, lengths, n_valid,
                 bases=None, scale_pool=None):
        cfg = self.cfg
        if cfg.scan_layers:
            # ONE lax.scan over stacked per-layer params (decode dispatch
            # killer — the unrolled 24-layer step pays per-op scheduling
            # gaps; see core/config.py scan_layers). Params convert from a
            # looped tree with models.kosmos.stack_unigpt_params.
            assert cfg.moe_freq == 0, "scan_layers serving: dense layers"
            scan_cls = nn.scan(
                _ScanPagedLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=cfg.num_layers,
            )
            spv = (scale_pool if scale_pool is not None
                   else jnp.zeros((), jnp.float32))
            carry = (x, k_pool, v_pool, spv, jnp.zeros((), jnp.int32))
            carry, _ = scan_cls(
                cfg, pages_per_layer=self.pages_per_layer,
                use_kernel=self.use_kernel, chunk_pages=self.chunk_pages,
                name="layers",
            )(carry, block_tables, lengths, n_valid,
              bases if bases is not None else jnp.zeros((), jnp.int32))
            x, k_pool, v_pool, spv, _ = carry
            if scale_pool is not None:
                scale_pool = spv
            if cfg.normalize_before:
                x = make_norm(cfg, "layer_norm")(x)
            return x, k_pool, v_pool, scale_pool

        for i in range(cfg.num_layers):
            x, k_pool, v_pool, scale_pool = PagedDecoderLayer(
                cfg, layer_idx=i, pages_per_layer=self.pages_per_layer,
                use_kernel=self.use_kernel, chunk_pages=self.chunk_pages,
                name=f"layers_{i}",
            )(x, k_pool, v_pool, block_tables, lengths, n_valid, bases=bases,
              scale_pool=scale_pool)
        if cfg.normalize_before:
            x = make_norm(cfg, "layer_norm")(x)
        return x, k_pool, v_pool, scale_pool


class PagedGPT(nn.Module):
    """UniGPT's text path in serving mode; accepts UniGPT params verbatim."""

    cfg: UniGPTConfig
    use_kernel: bool = True
    chunk_pages: int = 8

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,  # [B, T]
        k_pools: jax.Array,  # [L*P, page, H, D] flat pool, P logical pages
        v_pools: jax.Array,
        block_tables: jax.Array,  # [B, MP] logical page ids
        lengths: jax.Array,  # [B]
        n_valid: jax.Array,  # [B]
        last_logit_only: bool = False,
        bases: Optional[jax.Array] = None,  # [B] contiguous-run first pages
        scale_pool: Optional[jax.Array] = None,  # int8 KV scale sidecar
    ):
        cfg = self.cfg
        tcfg = cfg.decoder_cfg()
        assert k_pools.shape[0] % cfg.num_layers == 0
        pages_per_layer = k_pools.shape[0] // cfg.num_layers
        embed = nn.Embed(
            cfg.vocab_size, cfg.embed_dim,
            embedding_init=nn.initializers.normal(cfg.embed_dim**-0.5),
            dtype=tcfg.dtype, name="embed_tokens",
        )
        x = embed(tokens) * (cfg.embed_dim**0.5 if cfg.scale_embedding else 1.0)
        if cfg.use_positional:
            positions = (
                lengths[:, None] + jnp.arange(tokens.shape[1])[None, :]
                + cfg.padding_idx + 1
            )
            if cfg.learned_pos:
                x = x + nn.Embed(
                    cfg.max_positions + cfg.padding_idx + 1, cfg.embed_dim,
                    embedding_init=nn.initializers.normal(cfg.embed_dim**-0.5),
                    name="embed_positions",
                )(positions).astype(x.dtype)
            else:
                table = jnp.asarray(sinusoidal_table(
                    cfg.max_positions + cfg.padding_idx + 1, cfg.embed_dim,
                    cfg.padding_idx,
                ))
                x = x + jnp.take(table, positions, axis=0).astype(x.dtype)
        x, k_pools, v_pools, scale_pool = PagedDecoderStack(
            tcfg, pages_per_layer=pages_per_layer,
            use_kernel=self.use_kernel, chunk_pages=self.chunk_pages,
            name="decoder"
        )(x, k_pools, v_pools, block_tables, lengths, n_valid, bases=bases,
          scale_pool=scale_pool)
        if last_logit_only:
            x = x[:, -1:]
        logits = embed.attend(x)
        if scale_pool is not None:
            return logits, k_pools, v_pools, scale_pool
        return logits, k_pools, v_pools


# --------------------------------------------------------------------------- #
# Per-slot sampling (one traced program for any mix of greedy/topk/topp)
# --------------------------------------------------------------------------- #


def batched_sample(
    logits: jax.Array,  # [B, V]
    temperature: jax.Array,  # [B] float; <= 0 means greedy
    top_k: jax.Array,  # [B] int; 0 disables the top-k cut
    top_p: jax.Array,  # [B] float; 0 disables the nucleus cut
    rng: jax.Array,
    max_topk: int = 64,
) -> jax.Array:
    """Vectorized sampler over heterogeneous per-slot params (reference:
    fairseq search.Sampling top-k/top-p, fairseq/search.py). All slots share
    ONE traced program — params are data, not trace constants, so mixing
    greedy and sampled requests in a batch never recompiles the step.

    TPU-first deviation: candidates are truncated to the static top-`max_topk`
    before the nucleus cut (a full-vocab sort per decode step would dominate
    the DMA-bound decode). Nucleus mass beyond rank max_topk is dropped;
    raise ServingConfig.max_topk if a request needs a wider tail."""
    B, V = logits.shape
    K = min(max_topk, V)
    lf = logits.astype(jnp.float32)
    lp = jax.nn.log_softmax(lf / jnp.maximum(temperature, 1e-6)[:, None])
    vals, idx = jax.lax.top_k(lp, K)  # [B, K] sorted desc
    ranks = jnp.arange(K)[None, :]
    k_eff = jnp.where(top_k > 0, jnp.minimum(top_k, K), K)[:, None]
    keep = ranks < k_eff
    probs = jnp.exp(vals)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose preceding cumulative mass is < top_p (always >= 1 kept)
    keep &= jnp.where(top_p[:, None] > 0, (cum - probs) < top_p[:, None], True)
    masked = jnp.where(keep, vals, -1e30)
    choice = jax.random.categorical(rng, masked)  # [B]
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    greedy = jnp.argmax(lf, axis=-1)
    return jnp.where(temperature <= 0, greedy, sampled).astype(jnp.int32)


# --------------------------------------------------------------------------- #
# Continuous-batching engine (host scheduler)
# --------------------------------------------------------------------------- #


@dataclasses.dataclass
class ServingConfig:
    max_batch: int = 8
    page_size: int = 64
    num_pages: int = 256  # per layer, page 0 reserved as trash
    max_pages_per_seq: int = 16
    max_new_tokens: int = 64
    eos: int = 2
    prefill_bucket: int = 64  # prompt lengths padded up to a multiple of this
    max_topk: int = 64  # static candidate window for sampled requests
    seed: int = 0
    chunk_pages: int = 8  # slab size for the contiguous-run decode kernel;
    # the last chunk_pages-1 pages of each layer's region are kept free so
    # slab overreads stay in-bounds (ops/paged_attention._run_decode_kernel)
    prefix_caching: bool = True  # page-granular prompt-prefix sharing
    spec_k: int = 0  # speculative decoding: verify up to k prompt-lookup
    # draft tokens per step (0 = off). Greedy slots only; exact-output.
    spec_ngram: int = 3  # n-gram length for prompt-lookup draft matching
    kv_dtype: str = "model"  # "model" (cfg.dtype) or "int8" (per-token
    # symmetric quantization; halves the decode bandwidth roofline and
    # doubles KV capacity at a small logit error — see quantize_kv_rows)
    weight_dtype: str = "model"  # "model" or "int8": weight-only int8 for
    # every decoder-layer projection (ops/quant.py). Decode is weight-
    # streaming-bound, so this halves the other half of the roofline;
    # embeddings stay full precision (tied lookup + lm head).


@dataclasses.dataclass
class SamplingParams:
    """Per-request decode params. temperature <= 0 selects greedy argmax."""

    temperature: float = 0.0
    top_k: int = 0  # 0 = no top-k cut
    top_p: float = 0.0  # 0 = no nucleus cut


@dataclasses.dataclass
class _Slot:
    req_id: Any
    budget: int
    reserved: int  # pages reserved at admission
    generated: int = 0
    base: int = -1  # first page of a contiguous run, or -1 if scattered
    prompt: Optional[List[int]] = None  # tokens not yet prefilled
    filled: int = 0  # prompt tokens already in the pool
    table_row: Optional[np.ndarray] = None  # held back until prefill done
    sp: Optional["SamplingParams"] = None
    full_prompt: Optional[List[int]] = None  # for prefix registration
    history: Optional[List[int]] = None  # prompt + emitted (lookup drafting)


class ServingEngine:
    """Continuous-batching server. With `mesh` (a jax Mesh with a 'tensor'
    axis), decode runs tensor-parallel across chips: q/k/v column-parallel
    and out_proj/fc2 row-parallel (parallel/sharding.py rules, GSPMD inserts
    the psums the reference's Megatron path did by hand,
    fairseq/model_parallel/megatron_trainer.py:27), and the KV page pools
    are sharded over the head dim so each chip holds 1/tp of the cache."""

    def __init__(self, cfg: UniGPTConfig, scfg: ServingConfig, params,
                 mesh=None):
        if cfg.scan_layers:
            # single-chip decode optimization (the TP mesh path keeps the
            # looped stack: infer_param_shardings rules are per-layer)
            assert mesh is None, "scan_layers serving is single-chip"
            if "layers_0" in params.get("decoder", {}):
                from unilm_tpu.models.kosmos import stack_unigpt_params

                params = stack_unigpt_params(dict(params), cfg.num_layers)
        if scfg.weight_dtype == "int8":
            # Weight-only int8: quantize every decoder-layer PROJECTION
            # kernel (per-output-channel scales). Embeddings, norms, MoE
            # gates (plain nn.Dense, fp32 routing) and vmapped expert
            # kernels (3D) stay full precision. Works on a plain
            # UniGPT/PagedGPT param tree — param names stay aligned with
            # QuantDense (ops/quant.py).
            assert mesh is None, (
                "int8 weights are a single-chip decode optimization; the TP "
                "mesh path shards full-precision kernels")
            from unilm_tpu.ops.quant import quantize_dense_tree

            _PROJ = {"q_proj", "k_proj", "v_proj", "out_proj",
                     "fc1", "fc2", "fc3"}
            params = quantize_dense_tree(
                params,
                predicate=lambda p: p[-2] in _PROJ and any(
                    s.startswith("layers") for s in p),
            )
            cfg = dataclasses.replace(cfg, quant_weights=True)
        self.cfg, self.scfg = cfg, scfg
        self.mesh = mesh
        self.model = PagedGPT(cfg, use_kernel=mesh is None,
                              chunk_pages=scfg.chunk_pages)
        L, H = cfg.num_layers, cfg.num_heads
        D = cfg.embed_dim // H
        # per-layer page count rounded to a chunk multiple so every layer
        # region starts slab-aligned (global run bases = i*P + local base)
        self.num_pages = -(-scfg.num_pages // scfg.chunk_pages) * scfg.chunk_pages
        self.quantized = scfg.kv_dtype == "int8"
        kv_dt = jnp.int8 if self.quantized else cfg.dtype
        k = jnp.zeros((L * self.num_pages, scfg.page_size, H * D), kv_dt)
        pools = [k, jnp.zeros_like(k)]
        if self.quantized:
            nslab = L * self.num_pages // scfg.chunk_pages
            pools.append(jnp.zeros(
                (nslab, 8, scfg.chunk_pages * scfg.page_size), jnp.float32))
        self._pool_sharding = self._rep = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from unilm_tpu.parallel.sharding import infer_param_shardings

            tp = mesh.shape.get("tensor", 1)
            assert H % tp == 0, f"heads {H} not divisible by tensor axis {tp}"
            self._pool_sharding = NamedSharding(mesh, P(None, None, "tensor"))
            self._rep = NamedSharding(mesh, P())
            params = jax.device_put(params, infer_param_shardings(params, mesh))
            pools[0] = jax.device_put(pools[0], self._pool_sharding)
            pools[1] = jax.device_put(pools[1], self._pool_sharding)
            if self.quantized:
                pools[2] = jax.device_put(pools[2], self._rep)
        self.pools = tuple(pools)
        self.params = params
        self.tables = np.zeros((scfg.max_batch, scfg.max_pages_per_seq), np.int32)
        self.lengths = np.zeros(scfg.max_batch, np.int32)
        self.cur_tok = np.zeros(scfg.max_batch, np.int32)
        self.active = np.zeros(scfg.max_batch, bool)
        self.temps = np.zeros(scfg.max_batch, np.float32)
        self.topks = np.zeros(scfg.max_batch, np.int32)
        self.topps = np.zeros(scfg.max_batch, np.float32)
        self.bases = np.zeros(scfg.max_batch, np.int32)
        # pages [1, num_pages - chunk_pages + 1): the tail stays free so the
        # run kernel's slab overread never leaves this layer's pool region
        self.free_pages: List[int] = list(
            range(1, max(2, self.num_pages - scfg.chunk_pages + 1)))
        self.slots: List[Optional[_Slot]] = [None] * scfg.max_batch
        self.queue: deque = deque()
        self.outputs: Dict[Any, List[int]] = {}
        # prefix cache: chain-key (nested tuples of full-page token tuples)
        # -> logical page id; page_rc counts live slots sharing a page
        # (rc==0 entries are retained for reuse and evictable under
        # pool pressure). Reference has no equivalent; this is the
        # vLLM-automatic-prefix-caching capability, reservation-style.
        self.prefix_cache: Dict[Any, int] = {}
        self.page_key: Dict[int, Any] = {}
        self.page_depth: Dict[int, int] = {}  # chain depth (eviction order)
        self.page_rc: Dict[int, int] = {}
        self.stats = {"prefill_chunks": 0, "prefix_hit_pages": 0,
                      "evicted_pages": 0, "spec_steps": 0,
                      "spec_accepted": 0}
        self._verify_jit = None  # built lazily when spec_k > 0
        self._rng = jax.random.PRNGKey(scfg.seed)
        self._step_count = 0
        self._decode_jit = self._jit(self._decode_fn, 8)
        self._decode_contig_jit = None  # built lazily (TPU-only path)
        self._prefill_jit = self._jit(self._prefill_fn, 9)

    def _jit(self, fn, n_args):
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=(0,))
        psh = [self._pool_sharding] * 2
        if self.quantized:
            psh.append(self._rep)
        sh = [tuple(psh)] + [self._rep] * (n_args - 1)
        return jax.jit(
            fn, donate_argnums=(0,), in_shardings=sh,
            out_shardings=(self._rep, tuple(psh)),
        )

    def _next_rng(self):
        # fold the step counter instead of split(): no device round-trip and
        # bit-reproducible streams for a fixed (seed, admission order, steps)
        self._step_count += 1
        return jax.random.fold_in(self._rng, self._step_count)

    # ---- device fns ------------------------------------------------------ #
    def _apply(self, pools, tokens, tables, lengths, n_valid, bases=None):
        kp, vp = pools[0], pools[1]
        sp = pools[2] if len(pools) == 3 else None
        res = self.model.apply(
            {"params": self.params}, tokens, kp, vp, tables,
            lengths, n_valid, bases=bases, scale_pool=sp,
        )
        if sp is not None:
            logits, kp, vp, sp = res
            return logits, (kp, vp, sp)
        logits, kp, vp = res
        return logits, (kp, vp)

    def _decode_fn(self, pools, tokens, tables, lengths,
                   temps, topks, topps, rng, bases=None):
        n_valid = jnp.ones_like(lengths)
        logits, pools = self._apply(pools, tokens, tables, lengths, n_valid,
                                    bases=bases)
        nxt = batched_sample(logits[:, -1], temps, topks, topps, rng,
                             max_topk=self.scfg.max_topk)
        return nxt, pools

    def _verify_fn(self, pools, tokens, tables, lengths, n_valid,
                   temps, topks, topps, rng):
        """Speculative verify: run T=spec_k+1 positions through the model
        and return the greedy token AT EVERY position. Drafted rows land in
        the pool like a prefill chunk; rejected ones become stale rows
        beyond the accepted length — the paged layout makes rewind free.

        Non-drafted slots (sampled, or greedy without a lookup hit) ride the
        same program as a plain decode step: their position-0 logits are run
        through batched_sample with the slot's own params, so a spec step
        never forces argmax onto a temperature>0 slot."""
        logits, pools = self._apply(pools, tokens, tables, lengths, n_valid)
        g = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)
        s0 = batched_sample(logits[:, 0], temps, topks, topps, rng,
                            max_topk=self.scfg.max_topk)
        return g, s0, pools

    def _prefill_fn(self, pools, tokens, table, lengths, n_valid,
                    temps, topks, topps, rng):
        logits, pools = self._apply(pools, tokens, table, lengths, n_valid)
        # first generated token = sampled at the last valid prompt position
        last = jnp.take_along_axis(
            logits.astype(jnp.float32), (n_valid - 1)[:, None, None], axis=1
        )[:, 0]
        nxt = batched_sample(last, temps, topks, topps, rng,
                             max_topk=self.scfg.max_topk)
        return nxt, pools

    # ---- scheduler ------------------------------------------------------- #
    def submit(self, req_id, prompt: List[int], max_new_tokens: Optional[int] = None,
               sampling: Optional[SamplingParams] = None):
        self.queue.append((req_id, list(prompt), max_new_tokens
                           or self.scfg.max_new_tokens,
                           sampling or SamplingParams()))
        self.outputs[req_id] = []

    def _pages_needed(self, total_len: int) -> int:
        return -(-total_len // self.scfg.page_size)

    def _prefix_keys(self, prompt: List[int]):
        """Chain keys for each FULL page of the prompt."""
        page = self.scfg.page_size
        keys, key = [], ()
        for i in range(len(prompt) // page):
            key = (key, tuple(prompt[i * page:(i + 1) * page]))
            keys.append(key)
        return keys

    def _match_prefix(self, prompt: List[int]) -> List[int]:
        """Longest chain of cached full pages matching the prompt head.

        Capped at (len(prompt)-1)//page_size pages so the final prompt token
        is ALWAYS recomputed: a page-aligned prompt fully served from cache
        would leave _prefill_chunk with an empty chunk (n_valid=0) and the
        first sample would read a padding-token query at a clamped index
        (vLLM recomputes the last block for exactly this reason)."""
        if not self.scfg.prefix_caching:
            return []
        matched = []
        max_full = (len(prompt) - 1) // self.scfg.page_size
        for key in self._prefix_keys(prompt)[:max_full]:
            pid = self.prefix_cache.get(key)
            if pid is None:
                break
            matched.append(pid)
        return matched

    def _evict_retained(self, need: int) -> int:
        """Free up to `need` retained (rc==0) prefix pages. Returns count."""
        freed = 0
        # evict deepest chains first so shorter shared prefixes survive
        for pid, rc in sorted(self.page_rc.items(),
                              key=lambda kv: -self.page_depth.get(kv[0], 0)):
            if freed >= need:
                break
            if rc == 0:
                self.prefix_cache.pop(self.page_key.pop(pid), None)
                self.page_depth.pop(pid, None)
                del self.page_rc[pid]
                self.free_pages.append(pid)
                self.stats["evicted_pages"] += 1
                freed += 1
        return freed

    def _alloc(self, need: int) -> Tuple[List[int], int]:
        """Allocate `need` pages, contiguous-first (vLLM reserves page-by-
        page; we reserve the whole budget at admission, so a contiguous run
        is free to prefer — it enables slab streaming in the decode kernel).
        Runs start at chunk_pages-aligned ids (the kernel's slab index maps
        address the pool in chunk units). Returns (pages, base); base=-1
        when only a scattered set fit (block-table kernel fallback)."""
        free = sorted(self.free_pages)
        chunk = self.scfg.chunk_pages
        fs = set(free)
        for start in free:
            if start % chunk:
                continue
            if all((start + j) in fs for j in range(need)):
                run = list(range(start, start + need))
                self.free_pages = [p for p in free if p not in set(run)]
                return run, start
        run = free[:need]
        self.free_pages = free[need:]
        return run, -1

    def _try_admit(self) -> bool:
        if not self.queue:
            return False
        free_slots = [i for i in range(self.scfg.max_batch)
                      if self.slots[i] is None]
        if not free_slots:
            return False
        req_id, prompt, budget, sp = self.queue[0]
        need = self._pages_needed(len(prompt) + budget)
        if need > self.scfg.max_pages_per_seq:
            self.queue.popleft()
            raise MemoryError(f"request {req_id!r} exceeds max_pages_per_seq")
        matched = self._match_prefix(prompt)
        # pin the matched pages BEFORE eviction: they may sit at rc==0
        # (retained) and _evict_retained would otherwise reclaim them,
        # leaving dangling page ids in this request's table
        for pid in matched:
            self.page_rc[pid] += 1
        need_new = need - len(matched)
        if need_new > len(self.free_pages):
            self._evict_retained(need_new - len(self.free_pages))
        if need_new > len(self.free_pages):
            for pid in matched:  # un-pin; request stays queued
                self.page_rc[pid] -= 1
            return False  # backpressure
        self.stats["prefix_hit_pages"] += len(matched)
        self.queue.popleft()
        slot = free_slots[0]
        pages, base = self._alloc(need_new)
        row = np.zeros(self.scfg.max_pages_per_seq, np.int32)
        row[: len(matched)] = matched
        row[len(matched): len(matched) + len(pages)] = pages
        base = -1 if matched else base  # mixed tables use the table kernel
        # the slot's table stays pointed at the trash page until the whole
        # prompt is prefilled: interleaved decode steps run over every slot
        # row and must not write into this sequence's real pages
        self.slots[slot] = _Slot(req_id, budget, reserved=need, base=base,
                                 prompt=list(prompt),
                                 filled=len(matched) * self.scfg.page_size,
                                 table_row=row, sp=sp,
                                 full_prompt=list(prompt),
                                 history=(list(prompt)
                                          if self.scfg.spec_k > 0 else None))
        return True

    def _prefill_chunk(self, slot: int) -> None:
        """Advance one prefill_bucket-sized chunk of this slot's prompt
        (Sarathi-style chunked prefill: long prompts never block decode for
        more than one chunk, and there is exactly ONE prefill program to
        compile instead of one per prompt-length bucket)."""
        st = self.slots[slot]
        self.stats["prefill_chunks"] += 1
        bucket = self.scfg.prefill_bucket
        chunk = st.prompt[st.filled:st.filled + bucket]
        padded = np.full((1, bucket), self.cfg.padding_idx, np.int32)
        padded[0, : len(chunk)] = chunk
        first, self.pools = self._prefill_jit(
            self.pools, jnp.asarray(padded),
            jnp.asarray(st.table_row[None]),
            jnp.asarray([st.filled], jnp.int32),
            jnp.asarray([len(chunk)], jnp.int32),
            jnp.asarray([st.sp.temperature], jnp.float32),
            jnp.asarray([st.sp.top_k], jnp.int32),
            jnp.asarray([st.sp.top_p], jnp.float32),
            self._next_rng(),
        )
        st.filled += len(chunk)
        if st.filled >= len(st.prompt):
            # register this prompt's full pages for prefix sharing (only now:
            # their KV just finished landing in the pool)
            if self.scfg.prefix_caching:
                for i, key in enumerate(self._prefix_keys(st.full_prompt)):
                    pid = int(st.table_row[i])
                    if key not in self.prefix_cache:
                        # newly shareable page: rc counts THIS slot (pages
                        # matched at admission were already counted there;
                        # a concurrent same-prefix prefill that lost the
                        # registration race keeps its private copy unshared)
                        self.prefix_cache[key] = pid
                        self.page_key[pid] = key
                        self.page_depth[pid] = i
                        self.page_rc[pid] = self.page_rc.get(pid, 0) + 1
            # prompt complete: install the table and go live
            self.tables[slot] = st.table_row
            self.bases[slot] = max(st.base, 0)
            self.lengths[slot] = len(st.prompt)
            self.cur_tok[slot] = int(first[0])
            self.active[slot] = True
            self.temps[slot] = st.sp.temperature
            self.topks[slot] = st.sp.top_k
            self.topps[slot] = st.sp.top_p
            st.prompt = None
            if st.history is not None:
                st.history.append(int(first[0]))
            self._record(slot, int(first[0]))

    def _prefilling_slots(self) -> List[int]:
        return [i for i, st in enumerate(self.slots)
                if st is not None and st.prompt is not None]

    def _record(self, slot: int, tok: int):
        s = self.slots[slot]
        self.outputs[s.req_id].append(tok)
        s.generated += 1
        if tok == self.scfg.eos or s.generated >= s.budget:
            # free pages, clear slot; shared prefix pages only drop their
            # refcount (rc==0 pages stay RETAINED in the cache for reuse and
            # are reclaimed by _evict_retained under pool pressure)
            for p in self.tables[slot][: s.reserved]:
                p = int(p)
                if p in self.page_rc:
                    self.page_rc[p] -= 1
                else:
                    self.free_pages.append(p)
            self.tables[slot] = 0
            self.lengths[slot] = 0
            self.active[slot] = False
            self.temps[slot] = 0.0
            self.topks[slot] = 0
            self.topps[slot] = 0.0
            self.bases[slot] = 0
            self.slots[slot] = None

    def _find_draft(self, slot: int) -> List[int]:
        """Prompt-lookup drafting (Saxena 2023 / vLLM ngram speculator):
        match the last spec_ngram history tokens against earlier history;
        on a hit, propose the tokens that followed."""
        st = self.slots[slot]
        n, k = self.scfg.spec_ngram, self.scfg.spec_k
        h = st.history
        if h is None or len(h) <= n:
            return []
        tail = h[-n:]
        # newest match first (recent repetition predicts best)
        for i in range(len(h) - n - 1, -1, -1):
            if h[i:i + n] == tail:
                d = h[i + n:i + n + k]
                if d:
                    return d
                break
        return []

    def _spec_room(self, slot: int) -> bool:
        """Drafted rows must stay inside the slot's reserved pages (the
        scatter clips out-of-table positions onto the last page, which
        would overwrite valid rows)."""
        st = self.slots[slot]
        cap = st.reserved * self.scfg.page_size
        return int(self.lengths[slot]) + self.scfg.spec_k + 1 <= cap

    def _spec_step(self, drafts: Dict[int, List[int]]) -> None:
        K = self.scfg.spec_k
        B = self.scfg.max_batch
        tokens = np.full((B, K + 1), self.cfg.padding_idx, np.int32)
        n_valid = np.ones(B, np.int32)
        tokens[:, 0] = self.cur_tok
        for i, d in drafts.items():
            tokens[i, 1:1 + len(d)] = d
            n_valid[i] = 1 + len(d)
        if self._verify_jit is None:
            self._verify_jit = self._jit(self._verify_fn, 9)
        g, s0, self.pools = self._verify_jit(
            self.pools, jnp.asarray(tokens), jnp.asarray(self.tables),
            jnp.asarray(self.lengths), jnp.asarray(n_valid),
            jnp.asarray(self.temps), jnp.asarray(self.topks),
            jnp.asarray(self.topps), self._next_rng(),
        )
        g, s0 = np.asarray(g), np.asarray(s0)
        self.stats["spec_steps"] += 1
        for i in range(B):
            if not self.active[i]:
                continue
            if i not in drafts:
                # plain decode step for this slot: emit the position-0 token
                # sampled with ITS params (argmax iff temperature <= 0)
                tok = int(s0[i])
                self.lengths[i] += 1
                self.cur_tok[i] = tok
                if self.slots[i].history is not None:
                    self.slots[i].history.append(tok)
                self._record(i, tok)
                continue
            d = drafts[i]
            acc = 0
            while acc < len(d) and d[acc] == g[i, acc]:
                acc += 1
            self.stats["spec_accepted"] += acc
            # emit the accepted drafts plus the bonus token
            emitted = list(d[:acc]) + [int(g[i, acc])]
            self.lengths[i] += acc + 1
            self.cur_tok[i] = int(g[i, acc])
            for t in emitted:
                if self.slots[i] is None:
                    break  # EOS/budget hit mid-acceptance
                if self.slots[i].history is not None:
                    self.slots[i].history.append(int(t))
                self._record(i, int(t))

    def step(self):
        """One decode step for every active slot (single jitted call).
        When every active slot holds a contiguous page run (the common case
        under the contiguous-first allocator), dispatch the slab-DMA decode
        program; otherwise the block-table walk."""
        if self.scfg.spec_k > 0:
            drafts = {
                i: d for i in range(self.scfg.max_batch)
                if self.active[i] and self.temps[i] <= 0
                and self._spec_room(i) and (d := self._find_draft(i))
            }
            if drafts:
                self._spec_step(drafts)
                return
        contig = (
            self.mesh is None
            and jax.default_backend() == "tpu"
            and all(self.slots[i].base >= 0
                    for i in range(self.scfg.max_batch) if self.active[i])
        )
        args = (
            self.pools,
            jnp.asarray(self.cur_tok[:, None]), jnp.asarray(self.tables),
            jnp.asarray(self.lengths),
            jnp.asarray(self.temps), jnp.asarray(self.topks),
            jnp.asarray(self.topps), self._next_rng(),
        )
        if contig:
            if self._decode_contig_jit is None:
                self._decode_contig_jit = jax.jit(
                    lambda *a: self._decode_fn(*a[:8], bases=a[8]),
                    donate_argnums=(0,),
                )
            nxt, self.pools = self._decode_contig_jit(
                *args, jnp.asarray(self.bases))
        else:
            nxt, self.pools = self._decode_jit(*args)
        nxt = np.asarray(nxt)
        for i in range(self.scfg.max_batch):
            if self.active[i]:
                self.lengths[i] += 1
                self.cur_tok[i] = nxt[i]
                if self.slots[i].history is not None:
                    self.slots[i].history.append(int(nxt[i]))
                self._record(i, int(nxt[i]))

    def run(self) -> Dict[Any, List[int]]:
        while self.queue or self.active.any() or self._prefilling_slots():
            while self._try_admit():
                pass
            pre = self._prefilling_slots()
            if pre:
                self._prefill_chunk(pre[0])
            if self.active.any():
                self.step()
            elif not pre and self.queue:
                raise MemoryError("queued request can never be admitted")
        return self.outputs
