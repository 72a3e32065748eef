"""Pipeline parallelism: GPipe schedule over a mesh 'stage' axis.

Equivalent of fairseq's torch Pipe integration
(fairseq/distributed/utils.py:153-243 _pipeline_parallel_pre/post_init,
--pipeline-model-parallel balance/devices): layers are partitioned into S
stages stacked on a mesh axis; microbatches flow through the ring with
ppermute, S + M - 1 ticks total. TPU-first: one SPMD program, activations
hop over ICI, every stage computes every tick (bubble ticks are masked) —
no per-rank process logic or RPC like torch Pipe.

Use under shard_map:

    out = shard_map(
        lambda p, x: pipeline_apply(stage_fn, p, x, axis_name="stage"),
        mesh=mesh,
        in_specs=(P("stage"), P(None)),   # stacked stage params; replicated in
        out_specs=P(None),                 # replicated output
    )(stacked_params, microbatches)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _pvary(x, axis_name):
    """pvary with fallback across jax versions (pcast is the new name)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)



def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,  # this device's stage parameters (leading stage dim of 1 squeezed by shard_map)
    microbatches: jax.Array,  # [M, mb, ...] (replicated input)
    *,
    axis_name: str,
    remat: bool = False,
) -> jax.Array:
    """Runs stage_fn at every pipeline stage; returns [M, mb, ...] outputs
    (replicated — the last stage's results are psum-broadcast).

    DIFFERENTIABLE: jax autodiffs through the scan-of-ppermute, giving the
    GPipe backward schedule for free — the reverse scan re-runs the ticks
    backwards, the ppermute transposes to the inverse ring hop (cotangents
    flow last-stage -> first), and the bubble-tick `where` masks transpose
    to zeros, so garbage ticks contribute nothing to any gradient. This is
    what fairseq's --pipeline-model-parallel exists for: *training*
    (fairseq/distributed/utils.py:153-243). `remat=True` rematerializes each
    stage_fn call in the backward (GPipe's per-microbatch checkpointing,
    torch.utils.checkpoint in torch Pipe).
    """
    if remat:
        stage_fn = jax.checkpoint(stage_fn)
    S = jax.lax.psum(1, axis_name)
    s = jax.lax.axis_index(axis_name)
    M = microbatches.shape[0]
    mb_shape = microbatches.shape[1:]

    perm = None  # built lazily inside body (needs python ints)

    def tick(carry, t):
        buf, outputs = carry
        # stage 0 consumes microbatch t; later stages consume the hop buffer
        mb_idx = jnp.clip(t, 0, M - 1)
        inject = jax.lax.dynamic_index_in_dim(microbatches, mb_idx, 0, keepdims=False)
        h_in = jnp.where(s == 0, inject, buf)
        h_out = stage_fn(stage_params, h_in)
        # last stage finalizes microbatch t - (S - 1)
        out_idx = t - (S - 1)
        valid = jnp.logical_and(s == S - 1, out_idx >= 0)
        write = jnp.where(valid, h_out, jax.lax.dynamic_index_in_dim(
            outputs, jnp.clip(out_idx, 0, M - 1), 0, keepdims=False))
        outputs = jax.lax.dynamic_update_index_in_dim(
            outputs, write, jnp.clip(out_idx, 0, M - 1), 0
        )
        # rotate activations to the next stage over the ICI ring
        nxt = [(i, (i + 1) % S) for i in range(S)]
        buf = jax.lax.ppermute(h_out, axis_name, nxt)
        return (buf, outputs), None

    buf0 = _pvary(jnp.zeros(mb_shape, microbatches.dtype), axis_name)
    outs0 = _pvary(jnp.zeros((M,) + mb_shape, microbatches.dtype), axis_name)
    (buf, outputs), _ = jax.lax.scan(tick, (buf0, outs0), jnp.arange(M + S - 1))

    # broadcast the last stage's outputs to everyone
    mask = (s == S - 1).astype(outputs.dtype)
    return jax.lax.psum(outputs * mask, axis_name)


class PipelineLM:
    """A trainable decoder-only LM whose layer stack runs pipeline-parallel.

    The TPU-native equivalent of fairseq's --pipeline-model-parallel
    training path (fairseq/distributed/utils.py:153-243: balance/devices
    partitioning + torch Pipe): layers are stacked [S, L/S, ...] and driven
    by `pipeline_apply` under shard_map over a 'stage' mesh axis; embedding,
    final LN, and the (tied) output projection run outside the pipeline in
    plain GSPMD. The whole thing is an ordinary differentiable loss_fn, so
    it plugs straight into runtime.train.make_train_step.

    v1 scope: uniform non-MoE DecoderLayers (cfg.moe_freq == 0); stage
    params are sharded on 'stage' only (compose TP/FSDP via the main mesh
    path, not inside the pipeline).
    """

    def __init__(self, cfg, num_stages: int, mesh: Mesh,
                 num_microbatches: int, axis_name: str = "stage",
                 remat: bool = False):
        from unilm_tpu.core.transformer import DecoderLayer

        assert cfg.num_layers % num_stages == 0
        assert getattr(cfg, "moe_freq", 0) == 0, "PP v1: dense layers only"
        self.cfg = cfg
        self.S = num_stages
        self.M = num_microbatches
        self.mesh = mesh
        self.axis_name = axis_name
        self.remat = remat
        self.layer = DecoderLayer(cfg, layer_idx=0)

    def init(self, rng: jax.Array) -> Any:
        cfg = self.cfg
        kE, kL = jax.random.split(rng)
        x0 = jnp.zeros((1, 8, cfg.embed_dim), cfg.dtype)
        per_layer = jax.vmap(lambda k: self.layer.init(k, x0)["params"])(
            jax.random.split(kL, cfg.num_layers)
        )
        stages = jax.tree.map(
            lambda a: a.reshape((self.S, cfg.num_layers // self.S) + a.shape[1:]),
            per_layer,
        )
        embed = (jax.random.normal(kE, (cfg.vocab_size, cfg.embed_dim))
                 * cfg.embed_dim**-0.5).astype(cfg.dtype)
        return {
            "embed_tokens": {"embedding": embed},
            "stages": stages,
            "ln_f": {"scale": jnp.ones(cfg.embed_dim),
                     "bias": jnp.zeros(cfg.embed_dim)},
        }

    def _stage_fn(self, sp, x):
        def body(h, lp):
            return self.layer.apply({"params": lp}, h, causal=True), None

        out, _ = jax.lax.scan(body, x, sp)
        return out

    def _ln_f(self, params, x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (y * params["scale"] + params["bias"]).astype(x.dtype)

    def apply_layers(self, stages: Any, h: jax.Array) -> jax.Array:
        """[M, mb, T, D] microbatched hidden states -> same, pipelined."""
        piped = shard_map(
            lambda sp, xx: pipeline_apply(
                self._stage_fn, jax.tree.map(lambda l: l[0], sp), xx,
                axis_name=self.axis_name, remat=self.remat),
            mesh=self.mesh,
            in_specs=(P(self.axis_name), P(None)),
            out_specs=P(None),
        )
        return piped(stages, h)

    def logits(self, params: Any, tokens: jax.Array) -> jax.Array:
        cfg = self.cfg
        B, T = tokens.shape
        M = self.M
        assert B % M == 0, f"batch {B} not divisible into {M} microbatches"
        emb = params["embed_tokens"]["embedding"]
        h = emb[tokens] * cfg.embed_dim**0.5
        h = h.reshape(M, B // M, T, cfg.embed_dim)
        h = self.apply_layers(params["stages"], h)
        h = h.reshape(B, T, cfg.embed_dim)
        h = self._ln_f(params["ln_f"], h)
        return jax.lax.dot_general(
            h, emb, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def sequential_logits(self, params: Any, tokens: jax.Array) -> jax.Array:
        """Same math without the pipeline — the parity oracle."""
        cfg = self.cfg
        emb = params["embed_tokens"]["embedding"]
        h = emb[tokens] * cfg.embed_dim**0.5
        flat = jax.tree.map(
            lambda a: a.reshape((cfg.num_layers,) + a.shape[2:]),
            params["stages"],
        )
        h = self._stage_fn(flat, h)
        h = self._ln_f(params["ln_f"], h)
        return jax.lax.dot_general(
            h, emb, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


class PipelineGPT:
    """The FLAGSHIP decoder (UniGPT's text path — the 1.3B bench config)
    trained pipeline-parallel: real UniGPT checkpoints convert in/out.

    This is the reference's --pipeline-model-parallel applied to its real
    registered model (fairseq/distributed/utils.py:153-243 partitions the
    actual TransformerLanguageModel across devices), not a bespoke toy:
    embedding (scaled + fairseq sinusoidal positions), the subln/xPos
    DecoderLayer stack (pipelined via pipeline_apply), final layer_norm,
    and the tied output head — same math as models.kosmos.UniGPT's
    text-only forward (parity-tested in tests/test_pipeline.py).

    Composition with FSDP (`fsdp_axis`): fully-manual ZeRO-3 inside the
    same shard_map — stage-stacked weight matrices shard their LAST dim
    over the fsdp axis and are all-gathered just-in-time inside each
    stage; microbatch rows shard over fsdp (data parallel), and reverse-AD
    of the all_gather reduce-scatters the gradients back to the shards.
    (The partial-manual/auto-axes formulation hard-crashes this XLA
    build's SPMD partitioner at fsdp>2 and under bf16 — hence manual.)
    Scope: dense layers (cfg.moe_freq == 0 — MoE-in-pipeline would need
    expert all_to_all groups nested inside stage shards, which the
    reference also never combined with Pipe; see COVERAGE.md §2.9) and no
    key-padding mask (packed pretraining batches are full blocks; loss
    masking handles pad targets).
    """

    def __init__(self, cfg, num_stages: int, mesh: Mesh,
                 num_microbatches: int, axis_name: str = "stage",
                 remat: bool = False, fsdp_axis: Optional[str] = None):
        from unilm_tpu.core.transformer import DecoderLayer

        tcfg = cfg.decoder_cfg()
        assert tcfg.num_layers % num_stages == 0
        assert tcfg.moe_freq == 0, (
            "PP: dense layers only (MoE needs expert groups nested in "
            "stages; documented scope limit)")
        self.cfg = cfg
        self.tcfg = tcfg
        self.S = num_stages
        self.M = num_microbatches
        self.mesh = mesh
        self.axis_name = axis_name
        self.remat = remat
        self.fsdp_axis = fsdp_axis
        if fsdp_axis is not None:
            assert fsdp_axis in mesh.shape, (fsdp_axis, mesh.shape)
        self.layer = DecoderLayer(tcfg, layer_idx=0)

    def _fsdp_sharded(self, x) -> bool:
        """Which stage-stacked leaves shard over fsdp: weight MATRICES
        ([S, per, in, out] and up) whose last dim divides evenly; vectors
        (biases/LN scales) stay replicated."""
        return (self.fsdp_axis is not None and x.ndim >= 4
                and x.shape[-1] % self.mesh.shape[self.fsdp_axis] == 0)

    # ---- param conversion (UniGPT tree <-> staged tree) ----------------- #
    def from_unigpt(self, params: Any) -> Any:
        """UniGPT text-path params -> pipeline tree: decoder/layers_i
        stacked to [S, L/S, ...]; embed + final LN pass through."""
        L = self.tcfg.num_layers
        dec = params["decoder"]
        stages = stack_stage_params(
            [dec[f"layers_{i}"] for i in range(L)], self.S)
        return {
            "embed_tokens": params["embed_tokens"],
            "stages": stages,
            "layer_norm": dec["layer_norm"],
        }

    def to_unigpt(self, pp_params: Any, like: Any) -> Any:
        """Inverse of from_unigpt (checkpoint export). `like` supplies the
        non-decoder leaves (step counters etc.) untouched by PP."""
        L = self.tcfg.num_layers
        per = L // self.S
        dec = dict(like["decoder"])
        for i in range(L):
            dec[f"layers_{i}"] = jax.tree.map(
                lambda a: a[i // per, i % per], pp_params["stages"])
        dec["layer_norm"] = pp_params["layer_norm"]
        out = dict(like)
        out["decoder"] = dec
        out["embed_tokens"] = pp_params["embed_tokens"]
        return out

    def init(self, rng: jax.Array) -> Any:
        """Init through the real UniGPT (so params ARE a flagship
        checkpoint) and convert."""
        from unilm_tpu.models.kosmos import UniGPT

        model = UniGPT(self.cfg)
        tokens = jnp.ones((1, 8), jnp.int32)
        params = model.init(rng, tokens)["params"]
        return self.from_unigpt(params)

    # ---- forward --------------------------------------------------------- #
    def _stage_fn(self, sp, x):
        def body(h, lp):
            return self.layer.apply({"params": lp}, h, causal=True), None

        out, _ = jax.lax.scan(body, x, sp)
        return out

    def apply_layers(self, stages: Any, h: jax.Array) -> jax.Array:
        fa = self.fsdp_axis

        def leaf_spec(x):
            axes = [self.axis_name] + [None] * (x.ndim - 1)
            if self._fsdp_sharded(x):
                axes[-1] = fa
            return P(*axes)

        sharded_mask = jax.tree.map(lambda x: bool(self._fsdp_sharded(x)),
                                    stages)
        in_specs = (jax.tree.map(leaf_spec, stages),
                    P(None, fa) if fa else P(None))
        out_spec = P(None, fa) if fa else P(None)

        def wrapped(sp, xx):
            sp = jax.tree.map(lambda l: l[0], sp)  # squeeze stage dim
            if fa:
                # ZeRO-3 just-in-time gather; its reverse-AD is the
                # reduce-scatter that hands each rank its grad shard
                sp = jax.tree.map(
                    lambda l, m: (jax.lax.all_gather(
                        l, fa, axis=l.ndim - 1, tiled=True) if m else l),
                    sp, sharded_mask)
            return pipeline_apply(
                self._stage_fn, sp, xx,
                axis_name=self.axis_name, remat=self.remat)

        piped = shard_map(
            wrapped, mesh=self.mesh,
            in_specs=in_specs, out_specs=out_spec, check_rep=False,
        )
        return piped(stages, h)

    def features(self, params: Any, tokens: jax.Array) -> jax.Array:
        """Pre-logit decoder output [B, T, E] (same contract as
        UniGPT(..., return_features=True) — feeds chunked-vocab CE,
        ops/fused_ce.py)."""
        from unilm_tpu.models.kosmos import sinusoidal_table

        cfg = self.cfg
        B, T = tokens.shape
        M = self.M
        assert B % M == 0, f"batch {B} not divisible into {M} microbatches"
        if self.fsdp_axis is not None:
            f = self.mesh.shape[self.fsdp_axis]
            assert (B // M) % f == 0, (
                f"microbatch rows {B // M} must divide over fsdp={f} "
                "(data shards over the fsdp axis; replicated data would "
                "double-count gradients through the ZeRO reduce-scatter)")
        emb = params["embed_tokens"]["embedding"]
        h = emb[tokens].astype(self.tcfg.dtype)
        if cfg.scale_embedding:
            h = h * cfg.embed_dim**0.5
        if cfg.use_positional:
            table = jnp.asarray(sinusoidal_table(
                cfg.max_positions + cfg.padding_idx + 1, cfg.embed_dim,
                cfg.padding_idx))
            pos = jnp.arange(T) + cfg.padding_idx + 1
            h = h + jnp.take(table, pos, axis=0)[None].astype(h.dtype)
        h = h.reshape(M, B // M, T, cfg.embed_dim)
        h = self.apply_layers(params["stages"], h)
        h = h.reshape(B, T, cfg.embed_dim)
        if self.tcfg.normalize_before:
            xf = h.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(-1, keepdims=True)
            y = (xf - mu) * jax.lax.rsqrt(var + self.tcfg.layernorm_eps)
            ln = params["layer_norm"]
            h = (y * ln["scale"] + ln["bias"]).astype(h.dtype)
        return h

    def logits(self, params: Any, tokens: jax.Array) -> jax.Array:
        """Same embedding/head math as UniGPT.__call__'s text path
        (models/kosmos.py _embed/output_layer), layers pipelined."""
        h = self.features(params, tokens)
        emb = params["embed_tokens"]["embedding"]
        return jax.lax.dot_general(
            h, emb.astype(h.dtype), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def shardings(self, params: Any):
        """NamedShardings for the pipeline tree: stages on ('stage', ...)
        with weight matrices' last dim on the fsdp axis (the exact layout
        apply_layers' in_specs consume); everything else replicated."""
        from jax.sharding import NamedSharding

        def spec(path, x):
            is_stage = any(getattr(k, "key", "") == "stages" for k in path)
            if not is_stage:
                return NamedSharding(self.mesh, P())
            axes = [self.axis_name] + [None] * (x.ndim - 1)
            if self._fsdp_sharded(x):
                axes[-1] = self.fsdp_axis
            return NamedSharding(self.mesh, P(*axes))

        return jax.tree_util.tree_map_with_path(spec, params)


def stack_stage_params(params_per_layer: list, num_stages: int) -> Any:
    """[L] per-layer param pytrees -> stacked pytree with leading
    [num_stages, L/num_stages] dims (ready for P('stage', ...) sharding)."""
    L = len(params_per_layer)
    assert L % num_stages == 0, f"{L} layers not divisible into {num_stages} stages"
    per = L // num_stages

    def stack(*leaves):
        x = jnp.stack(leaves)  # [L, ...]
        return x.reshape((num_stages, per) + x.shape[1:])

    return jax.tree.map(stack, *params_per_layer)
