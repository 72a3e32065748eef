import glob, gzip, json, re, sys
from collections import defaultdict
import numpy as np, jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/unilm_bench_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from unilm_tpu.models.layoutlmv3 import LayoutLMv3ForTokenClassification, layoutlmv3_base
from unilm_tpu.runtime.train import TrainState, cross_entropy_loss, make_train_step
mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
B, T = 32, 512
rng0 = np.random.RandomState(0)
kw = dict(dtype=jnp.bfloat16, num_labels=7)
if mode == "none":
    kw.update(fused_bias=False, has_relative_attention_bias=False, has_spatial_attention_bias=False)
cfg = layoutlmv3_base(**kw)
model = LayoutLMv3ForTokenClassification(cfg)
ids = jnp.asarray(rng0.randint(3, cfg.vocab_size - 1, (B, T)), jnp.int32)
xy = rng0.randint(0, 900, (B, T, 2, 2)); xy.sort(axis=2)
bbox = jnp.asarray(xy.transpose(0, 1, 3, 2).reshape(B, T, 4), jnp.int32)
imgs = jnp.asarray(rng0.rand(B, 224, 224, 3), jnp.bfloat16)
labels = jnp.asarray(rng0.randint(0, 7, (B, T)), jnp.int32)
params = jax.jit(lambda r: model.init(r, ids, bbox, None, imgs))(jax.random.PRNGKey(0))["params"]
jax.block_until_ready(params)
tx = optax.adamw(1e-5, weight_decay=0.01)
def loss_fn(p, batch, rng):
    logits = model.apply({"params": p}, batch["ids"], batch["bbox"], None,
                         batch["imgs"], deterministic=False, rngs={"dropout": rng})
    loss, denom = cross_entropy_loss(logits, batch["y"])
    return loss / denom, {}
step_fn = jax.jit(make_train_step(loss_fn, tx, clip_grad_norm=1.0))
state = jax.jit(lambda p: TrainState.create(p, tx))(params)
batch = {"ids": ids, "bbox": bbox, "imgs": imgs, "y": labels}
rng = jax.random.PRNGKey(2)
state, m = step_fn(state, batch, rng)
jax.block_until_ready(m["loss"])
with jax.profiler.trace("/tmp/jaxtrace2"):
    state, m = step_fn(state, batch, rng)
    jax.block_until_ready(m["loss"])
print("trace done", float(m["loss"]))
f = sorted(glob.glob("/tmp/jaxtrace2/plugins/profile/*/vm.trace.json.gz"))[-1]
d = json.load(gzip.open(f))
pids = {e["pid"]: e["args"].get("name", "") for e in d["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"}
tot = defaultdict(float); cnt = defaultdict(int); src = defaultdict(float)
for e in d["traceEvents"]:
    if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
        nm = e.get("name", "")
        if nm.startswith("jit") or nm == "": continue
        base = re.sub(r"[.\d]+$", "", nm)
        tot[base] += e["dur"]; cnt[base] += 1
        a = e.get("args", {})
        sp = a.get("source", "")
        if sp: src[sp] += e["dur"]
print(f"device total: {sum(tot.values())/1e3:.1f} ms")
for n, t in sorted(tot.items(), key=lambda kv: -kv[1])[:14]:
    print(f"{t/1e3:9.2f} ms  x{cnt[n]:4d}  {n[:55]}")
print("--- by source line ---")
for n, t in sorted(src.items(), key=lambda kv: -kv[1])[:12]:
    print(f"{t/1e3:9.2f} ms  {n[-70:]}")
