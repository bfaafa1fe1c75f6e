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


def test_v3_matches_xla_grouped(rng):
    """v3 (grouped windows + batched dot) vs the plain jnp formulation,
    masked and unmasked, at a group size > 1."""
    import jax

    from rba_tpu.ops.pallas.window_attention import window_attention_fused_v3

    nw, nh, n, hd = 8, 4, 144, 32
    q = jnp.asarray(rng.randn(1, nw, nh, n, hd), jnp.float32)
    k = jnp.asarray(rng.randn(1, nw, nh, n, hd), jnp.float32)
    v = jnp.asarray(rng.randn(1, nw, nh, n, hd), jnp.float32)
    bias = jnp.asarray(rng.randn(nh, n, n), jnp.float32)
    mask = ((rng.rand(nw, n, n) > 0.5) * -100.0).astype(np.float32)
    scale = hd**-0.5

    def ref(mask_arr):
        attn = jnp.einsum("bwhqd,bwhkd->bwhqk", q * scale, k)
        attn = attn + bias[None, None]
        if mask_arr is not None:
            attn = attn + jnp.asarray(mask_arr)[None, :, None]
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bwhqk,bwhkd->bwhqd", attn, v)

    got = window_attention_fused_v3(q, k, v, bias, mask, scale, interpret=True, group=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(mask)), rtol=1e-5, atol=1e-5)
    got = window_attention_fused_v3(q, k, v, bias, None, scale, interpret=True, group=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(None)), rtol=1e-5, atol=1e-5)


def test_masked_softmax_kernel_matches_xla(rng):
    """Fused add+softmax kernel: bit-level parity with the jnp formulation
    across head-split grid configurations."""
    import jax

    from rba_tpu.ops.pallas.masked_softmax import masked_softmax_bf16

    for nw, nh in [(12, 4), (6, 16)]:
        n = 144
        s = jnp.asarray(rng.randn(1, nw, nh, n, n) * 3, jnp.float32)
        bias = jnp.asarray(rng.randn(nh, n, n), jnp.float32)
        mask = ((rng.rand(nw, n, n) > 0.5) * -100.0).astype(np.float32)
        want = jax.nn.softmax(
            s + bias[None, None] + jnp.asarray(mask)[None, :, None], -1
        ).astype(jnp.bfloat16)
        got = masked_softmax_bf16(s, bias, mask, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got.astype(jnp.float32)), np.asarray(want.astype(jnp.float32))
        )
        got2 = masked_softmax_bf16(s, bias, None, interpret=True)
        want2 = jax.nn.softmax(s + bias[None, None], -1).astype(jnp.bfloat16)
        np.testing.assert_array_equal(
            np.asarray(got2.astype(jnp.float32)), np.asarray(want2.astype(jnp.float32))
        )
