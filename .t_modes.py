import time, os, dataclasses, jax, jax.numpy as jnp, numpy as np
from collections import deque
from rba_tpu.config import load_d2_config
from rba_tpu.models.maskformer import maskformer_init, maskformer_infer_rba
base = load_d2_config("/root/reference/ckpts/swin_b_1dl/config.yaml")
params = maskformer_init(jax.random.PRNGKey(0), base)
img = jnp.asarray(np.random.RandomState(0).rand(1, 1024, 2048, 3)*255, jnp.float32)
def bench(cfg, label):
    fn = jax.jit(lambda p, x: maskformer_infer_rba(p, cfg, x).sum())
    float(fn(params, img))
    n = 40
    pending = deque()
    t0 = time.perf_counter()
    for _ in range(n):
        pending.append(fn(params, img))
        if len(pending) > 2:
            float(pending.popleft())
    while pending:
        float(pending.popleft())
    dt = time.perf_counter() - t0
    print(f"{label}: {dt/n*1000:.1f} ms/img -> {n/dt:.2f} img/s", flush=True)
bench(dataclasses.replace(base, pixel_decoder_dtype="bfloat16"), "pd bf16")
os.environ["RBA_TPU_FAST_MATH"] = "1"
bench(dataclasses.replace(base, pixel_decoder_dtype="bfloat16"), "pd bf16 + fast-math")
