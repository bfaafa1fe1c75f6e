import time, dataclasses, jax, jax.numpy as jnp, numpy as np
from rba_tpu.config import load_d2_config
from rba_tpu.models.maskformer import maskformer_init
from rba_tpu.models.pixel_decoder import pixel_decoder_apply, pixel_decoder_init
cfg = load_d2_config("/root/reference/ckpts/swin_b_1dl/config.yaml")
pd = cfg.pixel_decoder
feats = {f"res{i+2}": jnp.asarray(np.random.randn(1, 256>>i, 512>>i, 128<<i).astype(np.float32)).astype(jnp.bfloat16) for i in range(4)}
def timed(name, cfg_pd):
    params = pixel_decoder_init(jax.random.PRNGKey(0), cfg_pd, {f"res{i+2}": 128<<i for i in range(4)})
    j = jax.jit(lambda p, f: sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(pixel_decoder_apply(p, cfg_pd, f))))
    float(j(params, feats))
    ts = []
    for _ in range(4):
        t0=time.perf_counter(); float(j(params, feats)); ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)
timed("full (6 enc layers)", pd)
timed("0 enc layers", dataclasses.replace(pd, transformer_enc_layers=0))
timed("1 enc layer", dataclasses.replace(pd, transformer_enc_layers=1))
