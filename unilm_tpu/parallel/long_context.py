"""Sequence-parallel long-context training (the LongNet/YOCO envelope).

The reference has no context-parallel implementation (SURVEY.md §2.9);
this is the TPU-native path that makes a context length whose activations
exceed one chip's HBM trainable: the sequence is sharded over a `seq`
mesh axis, the whole model runs under shard_map (every op except
attention is position-local), and self-attention is the flash-chunk ring
(parallel/ring_attention.ring_attention_flash) — k/v chunks rotate over
ICI while the Pallas flash kernel computes each block, and the backward
is a second ring of flash-backward chunk kernels. cfg.seq_axis wires the
routing inside core.MultiheadAttention, including global-position xPos.

SeqParallelLM is the trainable workload: a decoder-only LM with tied
embeddings whose loss_fn plugs straight into runtime.train.make_train_step.
Cross-shard next-token targets come from a ppermute of each shard's first
token; the final global position is masked (it has no target).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


class SeqParallelLM:
    """Decoder-only LM trained with the sequence sharded over `seq_axis`.

    cfg: TransformerConfig with cfg.seq_axis set (e.g. 'seq'). Params are
    replicated over the axis; tokens [B, T_global] enter sharded on T.
    """

    def __init__(self, cfg, mesh: Mesh, axis_name: str = "seq"):
        from unilm_tpu.core.transformer import Decoder

        assert cfg.seq_axis == axis_name, "cfg.seq_axis must name the mesh axis"
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis_name
        self.n_shards = mesh.shape[axis_name]
        self.decoder = Decoder(cfg)

    def init(self, rng: jax.Array) -> Any:
        cfg = self.cfg
        kE, kD = jax.random.split(rng)
        # param shapes are T-independent; init the decoder OUTSIDE shard_map
        # on a tiny local length with the seq routing disabled
        import dataclasses

        flat_cfg = dataclasses.replace(cfg, seq_axis=None)
        from unilm_tpu.core.transformer import Decoder

        x0 = jnp.zeros((1, 8, cfg.embed_dim), cfg.dtype)
        dec = Decoder(flat_cfg).init(kD, x0, causal=True)["params"]
        embed = (jax.random.normal(kE, (cfg.vocab_size, cfg.embed_dim))
                 * cfg.embed_dim**-0.5).astype(cfg.dtype)
        return {"embed_tokens": {"embedding": embed}, "decoder": dec}

    # ------------------------------------------------------------------ #
    def _local_loss(self, params, tokens_local):
        """Inside shard_map: [B, Tl] local tokens -> (sum_nll, count)."""
        cfg = self.cfg
        axis = self.axis
        Pn = jax.lax.psum(1, axis)
        idx = jax.lax.axis_index(axis)
        emb = params["embed_tokens"]["embedding"]
        x = emb[tokens_local] * cfg.embed_dim**0.5
        h = self.decoder.apply({"params": params["decoder"]}, x, causal=True)
        logits = jax.lax.dot_general(
            h, emb, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # next-token targets: shift left; the last local position's target
        # is the NEXT shard's first token (ring hop), masked on the last
        # shard (no target for the final global position)
        first = tokens_local[:, 0]
        nxt_first = jax.lax.ppermute(
            first, axis, [(i, (i - 1) % Pn) for i in range(Pn)])
        targets = jnp.concatenate(
            [tokens_local[:, 1:], nxt_first[:, None]], axis=1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        mask = jnp.ones_like(nll)
        is_last_shard = (idx == Pn - 1).astype(nll.dtype)
        mask = mask.at[:, -1].multiply(1.0 - is_last_shard)
        s = jnp.sum(nll * mask)
        n = jnp.sum(mask)
        return jax.lax.psum(s, axis), jax.lax.psum(n, axis)

    def loss_fn(self, params, tokens, rng=None):
        """make_train_step-compatible: tokens [B, T_global]."""
        f = shard_map(
            self._local_loss,
            mesh=self.mesh,
            in_specs=(P(), P(None, self.axis)),
            out_specs=(P(), P()),
            check_rep=False,  # pallas_call doesn't thread rep/vma metadata
        )
        s, n = f(params, tokens)
        return s / n, {"ntok": n}


def activation_footprint_bytes(cfg, batch: int, seq: int,
                               remat: bool = True) -> float:
    """Analytic per-chip activation footprint of one train step (bf16).

    With per-layer remat the live set at the backward of layer i is the
    layer-boundary residuals (L x [B, T, E]) plus ONE layer's recomputed
    internals (~qkv+probsless flash: 4x [B,T,E] + ffn 2x [B,T,F]); without
    remat, every layer's internals stay live. Flash attention contributes
    no [T, S] plane. This is the number that decides whether a context
    length is trainable on one chip — the dryrun asserts the 32k case
    exceeds one v5e's 16 GB while the per-shard slice fits.
    """
    E, F, L = cfg.embed_dim, cfg.ffn_dim, cfg.num_layers
    tok = batch * seq * 2  # bf16
    boundaries = L * tok * E
    layer_internals = tok * (6 * E + 2 * F)
    if remat:
        return float(boundaries + layer_internals)
    return float(boundaries + L * layer_internals)
