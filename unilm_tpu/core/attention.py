"""MultiheadAttention: the one attention module for the whole framework.

Capability-equivalent of torchscale MultiheadAttention
(kosmos-2/torchscale/torchscale/component/multihead_attention.py:38-184):
- self & cross attention with additive relative-position bias
- xPos/SoPE rotary with length-extrapolation rescale
- sub-LN inner LayerNorm (Magneto)
- incremental decoding via a static-shape KV cache (the reference's
  incremental_state dict becomes a flax 'cache' variable collection; beam
  reorder becomes a gather on the batch axis — no reorder hooks needed)

Design deviation (TPU-first): xPos decay uses center=0 rather than the
reference's len//2 (sope_relative_position.py:33). The center term cancels
exactly in q·k since q carries scale^(+p) and k scale^(-p), so logits are
mathematically identical; center=0 makes cached rotated keys valid for the
whole decode, avoiding an O(L) re-rotation of the cache every step.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unilm_tpu.core.config import TransformerConfig
from unilm_tpu.core.layers import scaled_init
from unilm_tpu.core import positional
from unilm_tpu.core.multiway import MultiwayDense, MultiwayNorm
from unilm_tpu.ops.attention import attention, fa_on_tpu


class MultiheadAttention(nn.Module):
    cfg: TransformerConfig
    self_attention: bool = True
    use_xpos: bool = False
    scale: Optional[float] = None  # qk scale override (default head_dim**-0.5)

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # [B, T, E]
        key: Optional[jax.Array] = None,  # [B, S, E] (cross-attn)
        value: Optional[jax.Array] = None,
        *,
        key_padding_mask: Optional[jax.Array] = None,  # bool [B, S] True=valid
        attn_bias: Optional[jax.Array] = None,  # additive [B|1, H|1, T, S]
        causal: bool = False,
        mode: str = "train",  # train | prefill | decode
        cache_size: int = 0,
        cache_pos: Optional[jax.Array] = None,  # scalar write offset owned
        # by the CALLER (scan_layers path: one Decoder-level counter instead
        # of a per-layer scalar, which nn.scan's axis-1 cache stacking
        # cannot represent). None = this module owns its own counter.
        split_mask: Optional[jax.Array] = None,  # multiway modality mask
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        H, D, E = cfg.num_heads, cfg.head_dim, cfg.embed_dim
        B, T = query.shape[0], query.shape[1]
        cross = not self.self_attention
        if cross:
            # decode reads cross K/V from the cache; callers may pass
            # key=None then (threading the dead beam-tiled encoder tensor
            # through the decode loop costs real HBM — models/trocr.py)
            assert key is not None or mode == "decode"
            value = key if value is None else value
        else:
            key = query if key is None else key
            value = query if value is None else value

        qk_init = scaled_init(nn.initializers.xavier_uniform(), 2**-0.5)
        vo_scale = (1.0 / cfg.deepnorm_init_div) * cfg.subln_init_mul
        # sub-LN skips cross-attention projections (decoder.py:321-322)
        if cross and cfg.subln:
            vo_scale = 1.0 / cfg.deepnorm_init_div
        v_init = scaled_init(nn.initializers.xavier_uniform(), (2**-0.5) * vo_scale)
        o_init = scaled_init(nn.initializers.xavier_uniform(), vo_scale)

        def proj(x, name, init):
            if cfg.multiway:
                y = MultiwayDense(
                    H * D, use_bias=cfg.use_bias, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, kernel_init=init, name=name,
                )(x, split_mask)
            else:
                # make_dense so cfg.quant_weights swaps in QuantDense here the
                # same way PagedGPT's serving attention does — a tree from
                # quantize_dense_tree must load into BOTH decode paths
                # (tests/test_quant.py).
                from unilm_tpu.core.layers import make_dense

                y = make_dense(cfg, H * D, kernel_init=init, name=name)(x)
            return y.reshape(x.shape[0], x.shape[1], H, D)

        q = proj(query, "q_proj", qk_init)

        # ------------------------------------------------------------------ #
        # KV computation + cache management
        # ------------------------------------------------------------------ #
        q_offset = jnp.zeros((), jnp.int32)
        kv_len = None  # valid prefix of k/v (None = full)

        if mode == "train" and cfg.seq_axis and not cross:
            # Sequence-parallel self-attention (cfg.seq_axis): we hold a
            # [B, Tl, ...] shard of the sequence under shard_map. xPos must
            # rotate at GLOBAL positions (shard_start + 0..Tl), and the
            # length-extrapolation qscale normalizes by the GLOBAL length.
            k = proj(key, "k_proj", qk_init)
            v = proj(value, "v_proj", v_init)
            n_shards = jax.lax.psum(1, cfg.seq_axis)
            shard_start = jax.lax.axis_index(cfg.seq_axis) * T
            if self.use_xpos:
                q, k = self._apply_xpos_positions(q, k, shard_start)
                qscale = positional.length_extrapolation_qscale(
                    shard_start + jnp.arange(T), jnp.asarray(T * n_shards),
                    cfg.scale_length, jnp.float32,
                )
                q = (q * qscale[None, :, None, None]).astype(q.dtype)
            if attn_bias is not None:
                raise NotImplementedError(
                    "cfg.seq_axis (sequence-parallel ring attention) does "
                    "not thread ADDITIVE biases through the ring chunks "
                    "(each traveling KV chunk would need its [T, S_chunk] "
                    "bias slice in both ring passes). Key-padding masks ARE "
                    "supported (the [B, Tl] shard rides the ring); biased "
                    "workloads use the dense/flash path "
                    "(TransformerConfig.seq_axis docstring, COVERAGE.md "
                    "§2.9).")
            from unilm_tpu.parallel.ring_attention import ring_attention_flash

            # key_padding_mask here is the LOCAL [B, Tl] shard (the module
            # runs under shard_map with T split on seq_axis); it rotates
            # the ring with its K/V chunk.
            out = ring_attention_flash(
                q, k, v, key_padding_mask, cfg.seq_axis, causal,
                self.scale if self.scale is not None else cfg.attn_scale,
                cfg.flash_block_q, cfg.flash_block_k, not fa_on_tpu(),
            )
            out = out.reshape(B, T, H * D)
            if cfg.subln and self.self_attention:
                from unilm_tpu.core.layers import make_norm

                out = make_norm(cfg, "inner_attn_ln")(out)
            from unilm_tpu.core.layers import make_dense

            return make_dense(cfg, E, kernel_init=o_init, name="out_proj")(out)

        if mode == "train":
            k = proj(key, "k_proj", qk_init)
            v = proj(value, "v_proj", v_init)
            if self.use_xpos:
                q, k = self._apply_xpos_train(q, k, cross=cross)
        elif cross:
            # Cross-attention under generation: k/v are static per sequence.
            # prefill computes & caches them; decode reads the cache.
            if mode == "prefill":
                k = proj(key, "k_proj", qk_init)
                v = proj(value, "v_proj", v_init)
                if self.use_xpos:
                    _, k = self._apply_xpos_train(q, k, cross=True, keys_only=True)
                ck = self.variable("cache", "cross_key", lambda: k)
                cv = self.variable("cache", "cross_value", lambda: v)
                ck.value, cv.value = k, v
            else:  # decode
                k = self.variable("cache", "cross_key", None).value
                v = self.variable("cache", "cross_value", None).value
            if self.use_xpos:
                q = self._apply_xpos_cross_q(q, k_len=k.shape[1])
        else:
            # Self-attention with a [B, cache_size, H, D] ring-free cache.
            assert cache_size > 0, "prefill/decode need cache_size"
            k_new = proj(key, "k_proj", qk_init)
            v_new = proj(value, "v_proj", v_init)
            ck = self.variable(
                "cache", "cached_key", jnp.zeros, (B, cache_size, H, D), cfg.dtype
            )
            cv = self.variable(
                "cache", "cached_value", jnp.zeros, (B, cache_size, H, D), cfg.dtype
            )
            if cache_pos is not None:
                start = cache_pos
            else:
                idx = self.variable(
                    "cache", "cache_index", lambda: jnp.zeros((), jnp.int32))
                start = jnp.zeros((), jnp.int32) if mode == "prefill" else idx.value
            if self.use_xpos:
                q, k_new = self._apply_xpos_positions(q, k_new, start)
            ck.value = jax.lax.dynamic_update_slice(ck.value, k_new, (0, start, 0, 0))
            cv.value = jax.lax.dynamic_update_slice(cv.value, v_new, (0, start, 0, 0))
            new_len = start + T
            if cache_pos is None:
                idx.value = new_len
            k, v = ck.value, cv.value
            q_offset = start
            kv_len = new_len
            if self.use_xpos:
                qscale = positional.length_extrapolation_qscale(
                    start + jnp.arange(T), new_len, cfg.scale_length, jnp.float32
                )
                q = (q * qscale[None, :, None, None]).astype(q.dtype)

        if mode == "train" and self.use_xpos and not cross:
            qscale = positional.length_extrapolation_qscale(
                jnp.arange(T), jnp.asarray(T), cfg.scale_length, jnp.float32
            )
            q = (q * qscale[None, :, None, None]).astype(q.dtype)

        # QKV capture for distillation (MiniLM relation distillation,
        # minilm/README.md): a no-op unless the caller applies the module
        # with mutable=["intermediates"].
        if mode == "train":
            self.sow("intermediates", "attn_q", q)
            self.sow("intermediates", "attn_k", k)
            self.sow("intermediates", "attn_v", v)

        # ------------------------------------------------------------------ #
        out = attention(
            q,
            k,
            v,
            bias=attn_bias,
            key_padding_mask=key_padding_mask,
            scale=self.scale if self.scale is not None else cfg.attn_scale,
            causal=causal,
            q_offset=q_offset if mode != "train" else None,
            kv_len=kv_len,
            window=cfg.window_size if not cross else 0,
            dropout_rate=cfg.attention_dropout,
            dropout_rng=None if deterministic else self.make_rng("dropout"),
            deterministic=deterministic,
            use_flash=cfg.use_flash,
            flash_block_q=cfg.flash_block_q,
            flash_block_k=cfg.flash_block_k,
        )
        out = out.reshape(B, T, H * D)

        if cfg.subln and self.self_attention:
            if cfg.multiway:
                out = MultiwayNorm(
                    epsilon=cfg.layernorm_eps, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, rms=cfg.norm_type == "rmsnorm",
                    name="inner_attn_ln",
                )(out, split_mask)
            else:
                from unilm_tpu.core.layers import make_norm

                out = make_norm(cfg, "inner_attn_ln")(out)

        if cfg.multiway:
            return MultiwayDense(
                E, use_bias=cfg.use_bias, dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, kernel_init=o_init, name="out_proj",
            )(out, split_mask)
        from unilm_tpu.core.layers import make_dense

        return make_dense(cfg, E, kernel_init=o_init, name="out_proj")(out)

    # ---------------------------------------------------------------------- #
    # xPos helpers
    # ---------------------------------------------------------------------- #
    def _sin_cos_scale(self, positions):
        return positional.xpos_sin_cos_scale(
            positions,
            jnp.zeros((), jnp.float32),  # center=0; see module docstring
            self.cfg.head_dim,
            self.cfg.xpos_scale_base,
        )

    def _apply_xpos_train(self, q, k, cross: bool, keys_only: bool = False):
        """Full-sequence xPos. Self-attn: q and k share positions 0..L.
        Cross-attn: k gets 0..S, q gets S..S+T (multihead_attention.py:133-139)."""
        S = k.shape[1]
        sin, cos, scale = self._sin_cos_scale(jnp.arange(S))
        k = positional.apply_xpos(k.swapaxes(1, 2), sin, cos, 1.0 / scale).swapaxes(1, 2)
        if keys_only:
            return q, k
        T = q.shape[1]
        q_pos = jnp.arange(T) + (S if cross else 0)
        sin_q, cos_q, scale_q = self._sin_cos_scale(q_pos)
        q = positional.apply_xpos(q.swapaxes(1, 2), sin_q, cos_q, scale_q).swapaxes(1, 2)
        return q, k

    def _apply_xpos_cross_q(self, q, k_len: int):
        q_pos = jnp.arange(q.shape[1]) + k_len
        sin, cos, scale = self._sin_cos_scale(q_pos)
        return positional.apply_xpos(q.swapaxes(1, 2), sin, cos, scale).swapaxes(1, 2)

    def _apply_xpos_positions(self, q, k, start):
        """Rotate q and new k at absolute positions start..start+T (decode)."""
        pos = start + jnp.arange(q.shape[1])
        sin, cos, scale = self._sin_cos_scale(pos)
        q = positional.apply_xpos(q.swapaxes(1, 2), sin, cos, scale).swapaxes(1, 2)
        k = positional.apply_xpos(k.swapaxes(1, 2), sin, cos, 1.0 / scale).swapaxes(1, 2)
        return q, k
