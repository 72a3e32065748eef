import glob, gzip, json, re
from collections import defaultdict
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/unilm_bench_jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from unilm_tpu.models.trocr import TrOCRModel, make_generate_fns, trocr_base
from unilm_tpu.runtime.generate import GenerationConfig, generate
cfg = trocr_base(dtype=jnp.bfloat16)
model = TrOCRModel(cfg)
B = 32
cache = 2 + 32
prefill, step = make_generate_fns(model, cache_size=cache)
gcfg = GenerationConfig(beam_size=5, max_new_tokens=32, vocab_size=cfg.vocab_size,
                        pad=1, eos=2, min_new_tokens=32)
imgs = jax.random.normal(jax.random.PRNGKey(0), (B, cfg.img_size, cfg.img_size, 3), jnp.bfloat16)
params = jax.jit(lambda r: model.init(r, imgs, jnp.ones((B, 2), jnp.int32))["params"])(jax.random.PRNGKey(1))
jax.block_until_ready(params)
@jax.jit
def run(params, imgs):
    enc = model.apply({"params": params}, imgs, method=model.encode)
    prompt = jnp.full((B, 1), 0, jnp.int32)
    toks, _ = generate(gcfg, prefill, step, params, prompt, aux=enc)
    return toks[:, 0].astype(jnp.float32).sum()
float(run(params, imgs))
with jax.profiler.trace("/tmp/jaxtrdec"):
    float(run(params, imgs))
f = sorted(glob.glob("/tmp/jaxtrdec/plugins/profile/*/vm.trace.json.gz"))[-1]
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
for n, t in sorted(tot.items(), key=lambda kv: -kv[1])[:14]:
    print(f"{t/1e3:9.2f} ms  x{cnt[n]:5d}  {n[:55]}")
print("--- by source ---")
for n, t in sorted(src.items(), key=lambda kv: -kv[1])[:12]:
    print(f"{t/1e3:9.2f} ms  {n[-75:]}")
