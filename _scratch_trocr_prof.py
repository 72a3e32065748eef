import glob, gzip, json, re
from collections import defaultdict
import numpy as np, jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/unilm_bench_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from unilm_tpu.models.trocr import TrOCRModel, trocr_base
from unilm_tpu.runtime.train import TrainState, cross_entropy_loss, make_train_step
B, T = 32, 128
cfg = trocr_base(dtype=jnp.bfloat16)
model = TrOCRModel(cfg)
rng0 = np.random.RandomState(0)
imgs = jnp.asarray(rng0.rand(B, 384, 384, 3), jnp.bfloat16)
toks = jnp.asarray(rng0.randint(3, 50000, (B, T + 1)), jnp.int32)
params = jax.jit(lambda r: model.init(r, imgs, toks[:, :-1])["params"])(jax.random.PRNGKey(0))
jax.block_until_ready(params)
tx = optax.adamw(1e-5)
def loss_fn(p, batch, rng):
    logits = model.apply({"params": p}, batch["imgs"], batch["tok"][:, :-1],
                         deterministic=True)
    s, n = cross_entropy_loss(logits, batch["tok"][:, 1:], label_smoothing=0.1)
    return s / n, {}
step_fn = jax.jit(make_train_step(loss_fn, tx, clip_grad_norm=1.0))
state = jax.jit(lambda p: TrainState.create(p["params"] if "params" in p else p, tx))(params)
batch = {"imgs": imgs, "tok": toks}
rng = jax.random.PRNGKey(2)
state, m = step_fn(state, batch, rng)
jax.block_until_ready(m["loss"])
with jax.profiler.trace("/tmp/jaxtrocr"):
    state, m = step_fn(state, batch, rng)
    jax.block_until_ready(m["loss"])
f = sorted(glob.glob("/tmp/jaxtrocr/plugins/profile/*/vm.trace.json.gz"))[-1]
d = json.load(gzip.open(f))
pids = {e["pid"]: e["args"].get("name", "") for e in d["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"}
tot = defaultdict(float); cnt = defaultdict(int); src = defaultdict(float)
for e in d["traceEvents"]:
    if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
        nm = e.get("name", "")
        if nm.startswith("jit") or nm == "": continue
        tot[re.sub(r"[.\d]+$", "", nm)] += e["dur"]; cnt[re.sub(r"[.\d]+$", "", nm)] += 1
        sp = e.get("args", {}).get("source", "")
        if sp: src[sp] += e["dur"]
print(f"device total: {sum(tot.values())/1e3:.1f} ms")
for n, t in sorted(tot.items(), key=lambda kv: -kv[1])[:12]:
    print(f"{t/1e3:9.2f} ms  x{cnt[n]:4d}  {n[:55]}")
print("--- by source ---")
for n, t in sorted(src.items(), key=lambda kv: -kv[1])[:10]:
    print(f"{t/1e3:9.2f} ms  {n[-72:]}")
