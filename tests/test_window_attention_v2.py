import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rba_tpu.models.swin import shifted_window_mask
from rba_tpu.ops.pallas.window_attention import window_attention_fused_v2


def _xla_ref(qkv, rel_bias, mask, nh, scale):
    b, nw, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    q = qkv[..., :c].reshape(b, nw, n, nh, hd)
    k = qkv[..., c : 2 * c].reshape(b, nw, n, nh, hd)
    v = qkv[..., 2 * c :].reshape(b, nw, n, nh, hd)
    attn = jnp.einsum("bwqhd,bwkhd->bwhqk", q * scale, k).astype(jnp.float32)
    attn = attn + rel_bias[None, None]
    if mask is not None:
        attn = attn + jnp.asarray(mask, jnp.float32)[None, :, None]
    p = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bwhqk,bwkhd->bwqhd", p, v)
    return out.reshape(b, nw, n, c)


@pytest.mark.parametrize("with_mask", [False, True])
def test_v2_interpret(rng, with_mask):
    b, nh, ws, hd = 2, 4, 4, 16
    hp, wp, shift = 8, 12, 2
    nw = (hp // ws) * (wp // ws)
    n = ws * ws
    c = nh * hd
    qkv = jnp.asarray(rng.randn(b, nw, n, 3 * c).astype(np.float32))
    rel_bias = jnp.asarray(rng.randn(nh, n, n).astype(np.float32))
    mask = shifted_window_mask(hp, wp, ws, shift) if with_mask else None
    scale = hd**-0.5
    want = np.asarray(_xla_ref(qkv, rel_bias, mask, nh, scale))
    got = np.asarray(window_attention_fused_v2(qkv, rel_bias, mask, nh, scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
