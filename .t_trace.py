import glob, gzip, json, os, time
import jax, jax.numpy as jnp, numpy as np
from rba_tpu.config import load_d2_config
from rba_tpu.models.maskformer import maskformer_init, maskformer_infer_rba
cfg = load_d2_config("/root/reference/ckpts/swin_b_1dl/config.yaml")
params = maskformer_init(jax.random.PRNGKey(0), cfg)
img = jnp.asarray(np.random.RandomState(0).rand(1, 1024, 2048, 3)*255, jnp.float32)
fn = jax.jit(lambda p, x: maskformer_infer_rba(p, cfg, x).sum())
float(fn(params, img))
jax.profiler.start_trace("/tmp/rba_trace")
for _ in range(3):
    float(fn(params, img))
jax.profiler.stop_trace()
print("trace captured", flush=True)
files = glob.glob("/tmp/rba_trace/**/*.trace.json.gz", recursive=True)
print(files)
if files:
    with gzip.open(files[0], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X" and e.get("dur")]
    # aggregate by name
    agg = {}
    for e in events:
        agg[e["name"]] = agg.get(e["name"], 0) + e["dur"]
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:25]
    for name, dur in top:
        print(f"{dur/1000/3:9.2f} ms/iter  {name[:110]}")
