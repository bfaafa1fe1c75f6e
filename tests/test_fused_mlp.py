"""Parity tests for the fused MLP-block kernel (ops/pallas/fused_mlp.py)
against the unfused XLA chain it replaces (swin_block_apply's norm2+MLP tail,
reference swin.py:293-295)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rba_tpu.ops.nn import layer_norm, linear
from rba_tpu.ops.pallas.fused_mlp import beneficial, fused_mlp_residual, supports


def _xla_ref(x, ln, fc1, fc2):
    y = layer_norm(ln, x)
    y = linear(fc2, jax.nn.gelu(linear(fc1, y), approximate=False))
    return x + y


def _make(t, c, dtype, seed=0):
    rng = np.random.RandomState(seed)
    hid = 4 * c
    x = jnp.asarray(rng.randn(t, c), dtype) * 2.0
    ln = {"scale": jnp.asarray(rng.randn(c), jnp.float32) * 0.2 + 1.0,
          "bias": jnp.asarray(rng.randn(c), jnp.float32) * 0.1}
    fc1 = {"kernel": jnp.asarray(rng.randn(c, hid) * 0.05, jnp.float32),
           "bias": jnp.asarray(rng.randn(hid) * 0.02, jnp.float32)}
    fc2 = {"kernel": jnp.asarray(rng.randn(hid, c) * 0.05, jnp.float32),
           "bias": jnp.asarray(rng.randn(c) * 0.02, jnp.float32)}
    return x, ln, fc1, fc2


@pytest.mark.parametrize("t,c", [(512, 128), (1024, 256), (256, 512)])
def test_fused_mlp_matches_xla_fp32(t, c):
    x, ln, fc1, fc2 = _make(t, c, jnp.float32)
    got = fused_mlp_residual(x, ln, fc1, fc2, interpret=True)
    want = _xla_ref(x, ln, fc1, fc2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_fused_mlp_matches_xla_bf16():
    x, ln, fc1, fc2 = _make(512, 128, jnp.bfloat16, seed=3)
    got = fused_mlp_residual(x, ln, fc1, fc2, interpret=True)
    want = _xla_ref(x, ln, fc1, fc2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )


def test_fused_mlp_leading_dims_and_supports():
    # (B, H, W, C) leading dims flatten; Swin stage shapes supported,
    # stage-3 dims (C=1024) and non-divisible token counts rejected
    x, ln, fc1, fc2 = _make(2 * 8 * 32, 128, jnp.float32, seed=1)
    x4 = x.reshape(2, 8, 32, 128)
    got = fused_mlp_residual(x4, ln, fc1, fc2, interpret=True)
    want = _xla_ref(x4, ln, fc1, fc2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    assert supports(256 * 512, 128)   # Swin-B stage 0 at 1024x2048
    assert supports(128 * 256, 256)   # stage 1
    assert supports(184 * 320, 128)   # stage 0 at the 720p SMIYC bucket
    assert supports(64 * 128, 512)    # stage 2: runnable...
    assert not beneficial(64 * 128, 512)  # ...but measured slower than XLA
    assert beneficial(256 * 512, 128) and beneficial(128 * 256, 256)
    assert not supports(32 * 64, 1024)  # stage 3: weights exceed VMEM budget
    assert not supports(512, 192)       # non-lane-aligned channels


def test_gelu_polynomial_accuracy():
    # the in-kernel erf-from-polynomials gelu (Mosaic has no erf/erfc) must
    # stay sub-bf16-ulp accurate vs the true function everywhere
    from scipy import special

    from rba_tpu.ops.pallas.fused_mlp import _gelu_exact

    # all finite bf16 magnitudes up to 1e30
    bits = (np.arange(65536, dtype=np.uint32) << 16).view(np.float32)
    x = bits[np.isfinite(bits) & (np.abs(bits) < 1e30)].astype(np.float32)
    got = np.asarray(_gelu_exact(jnp.asarray(x)), np.float64)
    # cancellation-free reference: 1 + erf(s) == erfc(-s) (the naive
    # float64 1+erf form itself loses all digits in the negative tail)
    x64 = x.astype(np.float64)
    true = 0.5 * x64 * special.erfc(-x64 * 2**-0.5)
    denom = np.maximum(np.abs(true), 1e-30)
    rel = np.abs(got - true) / denom
    meaningful = np.abs(true) > 1e-25 * np.maximum(np.abs(x), 1.0)
    assert rel[meaningful].max() < 5e-6, rel[meaningful].max()

    # bf16-rounded agreement with the XLA exact-gelu path where XLA's own
    # fp32 1+erf hasn't saturated (x > -5.4: beyond that XLA returns 0 while
    # the kernel's erfc form stays accurate — the kernel is strictly better)
    cmp = meaningful & (x > -5.4)
    xla = np.asarray(
        jax.nn.gelu(jnp.asarray(x), approximate=False), np.float32
    )
    g16 = np.asarray(jnp.asarray(got, jnp.float32).astype(jnp.bfloat16), np.float32)
    x16 = np.asarray(jnp.asarray(xla).astype(jnp.bfloat16), np.float32)
    neq = (g16 != x16) & cmp
    assert neq.mean() < 0.01, neq.mean()
    if neq.any():
        ulp = np.abs(g16[neq] - x16[neq]) / np.maximum(np.abs(x16[neq]), 1e-30)
        assert ulp.max() < 2**-7, ulp.max()  # <= 1 bf16 ulp


def test_fused_mlp_non_divisible_tokens():
    # 1000 % block != 0: ceil grid + masked partial last block
    x, ln, fc1, fc2 = _make(1000, 128, jnp.float32, seed=7)
    assert supports(1000, 128)
    got = fused_mlp_residual(x, ln, fc1, fc2, interpret=True)
    want = _xla_ref(x, ln, fc1, fc2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
