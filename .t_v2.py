import time, os, jax, jax.numpy as jnp, numpy as np
os.environ["RBA_TPU_FUSED_ATTENTION"] = "1"
from rba_tpu.config import load_d2_config
from rba_tpu.models.maskformer import maskformer_init, maskformer_infer_rba
cfg = load_d2_config("/root/reference/ckpts/swin_b_1dl/config.yaml")
params = maskformer_init(jax.random.PRNGKey(0), cfg)
img = jnp.asarray(np.random.RandomState(0).rand(1, 1024, 2048, 3)*255, jnp.float32)
fn = jax.jit(lambda p, x: maskformer_infer_rba(p, cfg, x).sum())
v = float(fn(params, img))
ts = []
for _ in range(5):
    t0=time.perf_counter(); float(fn(params, img)); ts.append(time.perf_counter()-t0)
print(f"v2 fused attn: {min(ts)*1000:.1f} ms -> {1/min(ts):.2f} img/s (checksum {v:.0f})", flush=True)
