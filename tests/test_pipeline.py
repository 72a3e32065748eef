"""Pipeline parallelism (GPipe over shard_map) vs sequential oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from unilm_tpu.parallel import make_mesh
from unilm_tpu.parallel.pipeline import pipeline_apply, stack_stage_params


def mlp_layer_params(key, d):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (d, 2 * d)) * 0.1,
        "w2": jax.random.normal(k2, (2 * d, d)) * 0.1,
    }


def apply_layer(p, x):
    return x + jnp.tanh(x @ p["w1"]) @ p["w2"]


def apply_stage(stage_params, x):
    # stage_params leaves: [per_stage, ...]
    def body(h, lp):
        return apply_layer(lp, h), None

    out, _ = jax.lax.scan(body, x, stage_params)
    return out


@pytest.mark.parametrize("stages,layers,micro", [(4, 8, 6), (2, 4, 3), (8, 8, 2)])
def test_pipeline_matches_sequential(stages, layers, micro):
    assert jax.device_count() >= stages
    mesh = make_mesh({"data": -1}, devices=jax.devices()[:stages])  # axis reused as stage
    d = 16
    keys = jax.random.split(jax.random.PRNGKey(0), layers)
    layer_params = [mlp_layer_params(k, d) for k in keys]
    stacked = stack_stage_params(layer_params, stages)
    x = jax.random.normal(jax.random.PRNGKey(1), (micro, 4, d))

    # sequential oracle
    ref = x
    for lp in layer_params:
        ref = jax.vmap(lambda mb: apply_layer(lp, mb))(ref)

    f = shard_map(
        lambda p, xx: pipeline_apply(apply_stage, p, xx, axis_name="data"),
        mesh=mesh,
        in_specs=(P("data"), P(None)),
        out_specs=P(None),
    )
    # shard_map with P('data') on leading stage dim leaves [1, per, ...]; squeeze
    def wrapped(p, xx):
        p = jax.tree.map(lambda l: l[0], p)
        return pipeline_apply(apply_stage, p, xx, axis_name="data")

    f = shard_map(wrapped, mesh=mesh, in_specs=(P("data"), P(None)),
                  out_specs=P(None))
    out = jax.jit(f)(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


# --------------------------------------------------------------------------- #
# Trainable PP: gradients through the GPipe schedule
# (fairseq/distributed/utils.py:153-243 exists to TRAIN with
#  --pipeline-model-parallel; forward-only PP is not parity)
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("stages,layers,micro", [(2, 4, 3), (4, 8, 6), (8, 8, 2)])
def test_pipeline_grad_matches_sequential(stages, layers, micro):
    assert jax.device_count() >= stages
    mesh = make_mesh({"data": -1}, devices=jax.devices()[:stages])
    d = 16
    keys = jax.random.split(jax.random.PRNGKey(0), layers)
    layer_params = [mlp_layer_params(k, d) for k in keys]
    stacked = stack_stage_params(layer_params, stages)
    x = jax.random.normal(jax.random.PRNGKey(1), (micro, 4, d))

    def wrapped(p, xx):
        p = jax.tree.map(lambda l: l[0], p)
        return pipeline_apply(apply_stage, p, xx, axis_name="data")

    f = shard_map(wrapped, mesh=mesh, in_specs=(P("data"), P(None)),
                  out_specs=P(None))

    def piped_loss(p, xx):
        out = f(p, xx)
        return jnp.sum(out * out)

    def seq_loss(p, xx):
        flat = jax.tree.map(
            lambda a: a.reshape((layers,) + a.shape[2:]), p)
        out = jax.vmap(lambda mb: apply_stage(flat, mb))(xx)
        return jnp.sum(out * out)

    (lp_v, gp), (ls_v, gs) = (
        jax.jit(jax.value_and_grad(piped_loss, argnums=(0, 1)))(stacked, x),
        jax.jit(jax.value_and_grad(seq_loss, argnums=(0, 1)))(stacked, x),
    )
    np.testing.assert_allclose(float(lp_v), float(ls_v), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_lm_trains(remat):
    """One PP train step through make_train_step: loss == sequential oracle
    and parameters actually move."""
    import optax

    from unilm_tpu.core.transformer import TransformerConfig
    from unilm_tpu.parallel.pipeline import PipelineLM
    from unilm_tpu.runtime.train import TrainState, cross_entropy_loss, make_train_step

    S = 4
    mesh = make_mesh({"stage": S}, devices=jax.devices()[:S])
    cfg = TransformerConfig(
        vocab_size=64, embed_dim=32, num_layers=4, num_heads=4, ffn_dim=64,
        max_positions=32, xpos_rel_pos=True, use_flash=False,
    )
    lm = PipelineLM(cfg, num_stages=S, mesh=mesh, num_microbatches=2,
                    remat=remat)
    params = jax.jit(lm.init)(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 3, 64)

    def loss_fn(p, batch, rng):
        logits = lm.logits(p, batch)
        s, n = cross_entropy_loss(logits[:, :-1], batch[:, 1:])
        return s / n, {}

    def seq_loss_fn(p, batch):
        logits = lm.sequential_logits(p, batch)
        s, n = cross_entropy_loss(logits[:, :-1], batch[:, 1:])
        return s / n

    tx = optax.adamw(1e-3)
    step = make_train_step(loss_fn, tx, clip_grad_norm=1.0)
    state = TrainState.create(jax.device_get(params), tx)
    state2, metrics = jax.jit(step)(state, tokens, jax.random.PRNGKey(2))
    seq = float(jax.jit(seq_loss_fn)(params, tokens))
    assert abs(float(metrics["loss"]) - seq) < 1e-4, (metrics["loss"], seq)
    assert float(metrics["grad_norm"]) > 0
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state2.params)
    assert max(jax.tree.leaves(moved)) > 0


def test_pipeline_lm_grad_parity():
    """Full grad tree: pipelined loss vs sequential oracle."""
    from unilm_tpu.core.transformer import TransformerConfig
    from unilm_tpu.parallel.pipeline import PipelineLM
    from unilm_tpu.runtime.train import cross_entropy_loss

    S = 2
    mesh = make_mesh({"stage": S}, devices=jax.devices()[:S])
    cfg = TransformerConfig(
        vocab_size=32, embed_dim=16, num_layers=4, num_heads=2, ffn_dim=32,
        max_positions=16, use_flash=False,
    )
    lm = PipelineLM(cfg, num_stages=S, mesh=mesh, num_microbatches=3)
    params = jax.jit(lm.init)(jax.random.PRNGKey(0))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (6, 8), 3, 32)

    def piped(p):
        logits = lm.logits(p, tokens)
        s, n = cross_entropy_loss(logits[:, :-1], tokens[:, 1:])
        return s / n

    def seq(p):
        logits = lm.sequential_logits(p, tokens)
        s, n = cross_entropy_loss(logits[:, :-1], tokens[:, 1:])
        return s / n

    gp = jax.jit(jax.grad(piped))(params)
    gs = jax.jit(jax.grad(seq))(params)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_s = jax.tree.leaves(gs)
    for (path, a), b in zip(flat_p, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-3,
            err_msg=str(path))


@pytest.mark.parametrize("stages", [2, 4])
def test_pipeline_gpt_matches_unigpt(stages):
    """PipelineGPT pipelines the FLAGSHIP model: logits match UniGPT's own
    text-path forward on the same (converted) checkpoint."""
    from unilm_tpu.models.kosmos import UniGPT, UniGPTConfig
    from unilm_tpu.parallel.pipeline import PipelineGPT

    mesh = make_mesh({"stage": stages}, devices=jax.devices()[:stages])
    cfg = UniGPTConfig(
        vocab_size=64, embed_dim=16, num_layers=4, num_heads=2, ffn_dim=32,
        max_positions=32, subln=True, xpos_rel_pos=True, use_flash=False)
    model = UniGPT(cfg)
    # tokens avoid padding_idx: UniGPT masks pads via key_padding_mask,
    # which PP does not thread (documented scope limit)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 4, 64)
    params = model.init(jax.random.PRNGKey(0), tokens)["params"]

    pp = PipelineGPT(cfg, num_stages=stages, mesh=mesh, num_microbatches=2)
    pp_params = pp.from_unigpt(params)
    ref = model.apply({"params": params}, tokens)
    out = jax.jit(pp.logits)(pp_params, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)

    # round trip back to a UniGPT checkpoint
    back = pp.to_unigpt(pp_params, params)
    for (pa, a), b in zip(jax.tree_util.tree_leaves_with_path(params),
                          jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_pipeline_gpt_stage_fsdp_train_step():
    """stage x fsdp composed mesh: PP manual axis + ZeRO-style last-dim
    param sharding in GSPMD auto mode; one train step moves params and the
    loss matches the pure-stage mesh."""
    import optax

    from unilm_tpu.models.kosmos import UniGPT, UniGPTConfig
    from unilm_tpu.parallel.pipeline import PipelineGPT
    from unilm_tpu.runtime.train import (TrainState, cross_entropy_loss,
                                         make_train_step)

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh({"stage": 2, "fsdp": 2}, devices=jax.devices()[:4])
    cfg = UniGPTConfig(
        vocab_size=64, embed_dim=16, num_layers=4, num_heads=2, ffn_dim=32,
        max_positions=32, subln=True, xpos_rel_pos=True, use_flash=False)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 4, 64)
    params = UniGPT(cfg).init(jax.random.PRNGKey(0), tokens)["params"]
    pp = PipelineGPT(cfg, num_stages=2, mesh=mesh, num_microbatches=2,
                     fsdp_axis="fsdp")
    pp_params = pp.from_unigpt(params)
    sharded = jax.device_put(pp_params, pp.shardings(pp_params))

    def loss_fn(p, batch, rng):
        logits = pp.logits(p, batch)
        s, n = cross_entropy_loss(logits[:, :-1], batch[:, 1:])
        return s / n, {"ntok": n}

    tx = optax.adamw(1e-3)
    state = TrainState.create(sharded, tx)
    step = jax.jit(make_train_step(loss_fn, tx, clip_grad_norm=1.0))
    state2, m = step(state, tokens, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))

    # loss parity vs the stage-only mesh
    mesh1 = make_mesh({"stage": 2}, devices=jax.devices()[:2])
    pp1 = PipelineGPT(cfg, num_stages=2, mesh=mesh1, num_microbatches=2)

    def loss_fn1(p, batch, rng):
        logits = pp1.logits(p, batch)
        s, n = cross_entropy_loss(logits[:, :-1], batch[:, 1:])
        return s / n, {"ntok": n}

    state1 = TrainState.create(pp_params, tx)
    step1 = jax.jit(make_train_step(loss_fn1, tx, clip_grad_norm=1.0))
    _, m1 = step1(state1, tokens, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m["loss"]), float(m1["loss"]),
                               rtol=2e-4, atol=2e-5)


def test_train_gpt_cli_pp_smoke(tmp_path):
    """cli/train_gpt.py --pp_stages: the flagship pretraining CLI drives
    PipelineGPT end-to-end (stage + fsdp mesh on the virtual devices),
    including checkpoint save."""
    from unilm_tpu.cli.train_gpt import main

    data = tmp_path / "corpus.txt"
    data.write_text("\n".join(
        " ".join(f"w{i % 17}" for i in range(j, j + 20))
        for j in range(16)))
    main([
        "--data", str(data), "--save_dir", str(tmp_path / "ckpt_pp"),
        "--tokens_per_sample", "16", "--batch_size", "8",
        "--max_steps", "2", "--save_every", "2", "--log_every", "1",
        "--dim", "16", "--layers", "4", "--heads", "2", "--ffn", "32",
        "--vocab", "64", "--pp_stages", "2", "--pp_microbatches", "2",
    ])
