import time, jax, jax.numpy as jnp, numpy as np
from rba_tpu.config import load_d2_config
from rba_tpu.models.swin import swin_init, swin_block_apply, _window_attention
from rba_tpu.ops.nn import layer_norm, linear
cfg = load_d2_config("/root/reference/ckpts/swin_b_1dl/config.yaml").swin
params = swin_init(jax.random.PRNGKey(0), cfg)
blk = params["layers"][2]["blocks"][0]
N = 20

def timed(name, fn, x):
    def loop(p, x):
        def body(c, _):
            return fn(p, c), None
        y, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(y.astype(jnp.float32))
    j = jax.jit(loop)
    float(j(blk, x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(j(blk, x)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {(min(ts)-0.026)/N*1000:.2f} ms/iter", flush=True)

x = jnp.asarray(np.random.randn(1, 64, 128, 512).astype(np.float32)).astype(jnp.bfloat16)
timed("full block shift=6", lambda p, c: swin_block_apply(p, c, num_heads=16, ws=12, shift=6, qk_scale=None), x)
timed("full block shift=0", lambda p, c: swin_block_apply(p, c, num_heads=16, ws=12, shift=0, qk_scale=None), x)
def mlp_only(p, c):
    y = layer_norm(p["norm2"], c)
    return c + linear(p["mlp"]["fc2"], jax.nn.gelu(linear(p["mlp"]["fc1"], y), approximate=False))
timed("mlp+ln", mlp_only, x)
xw = jnp.asarray(np.random.randn(1, 6, 11, 144, 512).astype(np.float32)).astype(jnp.bfloat16)
timed("window attn", lambda p, c: _window_attention(p["attn"], c, 16, 12, None, None), xw)
# stage-1 block for comparison (bigger spatial, smaller C)
blk1 = params["layers"][0]["blocks"][0]
x1 = jnp.asarray(np.random.randn(1, 256, 512, 128).astype(np.float32)).astype(jnp.bfloat16)
timed("stage1 block shift=6", lambda p, c: swin_block_apply(blk1, c, num_heads=4, ws=12, shift=6, qk_scale=None), x1)
