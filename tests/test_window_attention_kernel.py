import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rba_tpu.models.swin import relative_position_index, shifted_window_mask
from rba_tpu.ops.pallas.window_attention import window_attention_fused


def _xla_reference(q, k, v, rel_bias, mask, scale):
    attn = jnp.einsum("bwhqd,bwhkd->bwhqk", q * scale, k).astype(jnp.float32)
    attn = attn + rel_bias[None, None]
    if mask is not None:
        attn = attn + jnp.asarray(mask, jnp.float32)[None, :, None]
    p = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bwhqk,bwhkd->bwhqd", p, v)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_window_attention_interpret(rng, with_mask):
    b, nh, ws, hd = 2, 4, 4, 32
    hp, wp, shift = 8, 12, 2
    nw = (hp // ws) * (wp // ws)
    n = ws * ws
    q = jnp.asarray(rng.randn(b, nw, nh, n, hd).astype(np.float32))
    k = jnp.asarray(rng.randn(b, nw, nh, n, hd).astype(np.float32))
    v = jnp.asarray(rng.randn(b, nw, nh, n, hd).astype(np.float32))
    rel_bias = jnp.asarray(rng.randn(nh, n, n).astype(np.float32))
    mask = shifted_window_mask(hp, wp, ws, shift) if with_mask else None
    scale = hd**-0.5

    want = np.asarray(_xla_reference(q, k, v, rel_bias, mask, scale))
    got = np.asarray(
        window_attention_fused(q, k, v, rel_bias, mask, scale, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
