import time, jax, jax.numpy as jnp, numpy as np, functools
from rba_tpu.config import load_d2_config
from rba_tpu.models.swin import swin_init, swin_block_apply, _window_attention, relative_position_index
from rba_tpu.ops.nn import layer_norm, linear
cfg = load_d2_config("/root/reference/ckpts/swin_b_1dl/config.yaml").swin
params = swin_init(jax.random.PRNGKey(0), cfg)
blk = params["layers"][2]["blocks"][0]

def timed(name, fn, *args):
    jsum = jax.jit(lambda *a: sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(fn(*a))))
    float(jsum(*args))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); float(jsum(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

x = jnp.asarray(np.random.randn(1, 64, 128, 512).astype(np.float32)).astype(jnp.bfloat16)
# full block (shifted)
timed("block shift=6 x18 (extrapolate)", lambda p, x: swin_block_apply(p, x, num_heads=16, ws=12, shift=6, qk_scale=None), blk, x)
# mlp only
def mlp_only(p, x):
    y = layer_norm(p["norm2"], x)
    return x + linear(p["mlp"]["fc2"], jax.nn.gelu(linear(p["mlp"]["fc1"], y), approximate=False))
timed("mlp+ln only", mlp_only, blk, x)
# window attention only at padded size
xw = jnp.asarray(np.random.randn(1, 6, 11, 144, 512).astype(np.float32)).astype(jnp.bfloat16)
timed("window attn only", lambda p, xw: _window_attention(p["attn"], xw, 16, 12, None, None), blk, xw)
# qkv linear only
timed("qkv linear only", lambda p, xw: linear(p["attn"]["qkv"], xw), blk, xw)
