import numpy as np
import pytest
import torch

from tests.torch_refs import torch_ms_deform_attn_core

import jax
import jax.numpy as jnp

from rba_tpu.ops.deform_sampling import ms_deform_attn_core


def _random_inputs(rng, n=2, m=4, d=8, p=3, shapes=((6, 9), (3, 5))):
    s = sum(h * w for h, w in shapes)
    lq = 7
    value = rng.randn(n, s, m, d).astype(np.float32)
    # locations mostly inside [0,1], some outside to test zero padding
    loc = rng.uniform(-0.2, 1.2, size=(n, lq, m, len(shapes), p, 2)).astype(np.float32)
    aw = rng.rand(n, lq, m, len(shapes), p).astype(np.float32)
    aw = aw / aw.sum(axis=(3, 4), keepdims=True)
    return value, loc, aw, shapes


def test_deform_core_matches_grid_sample(rng):
    from tests.torch_refs import torch_ms_deform_attn_core

    value, loc, aw, shapes = _random_inputs(rng)
    want = torch_ms_deform_attn_core(
        torch.from_numpy(value), list(shapes), torch.from_numpy(loc), torch.from_numpy(aw)
    ).numpy()
    got = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deform_core_single_level(rng):
    from tests.torch_refs import torch_ms_deform_attn_core

    value, loc, aw, shapes = _random_inputs(rng, shapes=((8, 16),), p=4)
    want = torch_ms_deform_attn_core(
        torch.from_numpy(value), list(shapes), torch.from_numpy(loc), torch.from_numpy(aw)
    ).numpy()
    got = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_deform_core_grads_finite(rng):
    """The reference needs ~620 LoC of handwritten CUDA backward
    (ms_deform_im2col_cuda.cuh:307-926); here autodiff covers it — check the
    gradients exist and are finite (correctness vs numerics is covered by the
    forward parity + JAX's own grad machinery)."""
    value, loc, aw, shapes = _random_inputs(rng)

    def f(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, a) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_deform_core_grad_value_matches_torch(rng):
    from tests.torch_refs import torch_ms_deform_attn_core

    value, loc, aw, shapes = _random_inputs(rng, n=1, m=2, d=4, p=2, shapes=((5, 7),))
    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    out = torch_ms_deform_attn_core(tv, list(shapes), tl, torch.from_numpy(aw))
    out.pow(2).sum().backward()

    def f(v, l):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, jnp.asarray(aw)) ** 2)

    gv, gl = jax.grad(f, argnums=(0, 1))(jnp.asarray(value), jnp.asarray(loc))
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("d", [30, 32, 64, 71])
def test_deform_core_channel_sizes(rng, d):
    """The reference's kernel parity test sweeps odd/even channel sizes
    (ops/test.py:35-89: {30, 32, 64, 71, 1025, ...}); the large ones only
    probe its im2col_step chunking, which has no analogue here."""
    value, loc, aw, shapes = _random_inputs(rng, n=1, m=2, d=d, p=2)
    want = torch_ms_deform_attn_core(
        torch.from_numpy(value), list(shapes), torch.from_numpy(loc), torch.from_numpy(aw)
    ).numpy()
    got = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("d", [30, 71])
def test_deform_core_grads_odd_channels(rng, d):
    """gradcheck analogue at odd channel sizes: grads w.r.t. value and
    locations match torch autograd (reference gradcheck, ops/test.py:61-89)."""
    value, loc, aw, shapes = _random_inputs(rng, n=1, m=2, d=d, p=2, shapes=((5, 7),))
    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    out = torch_ms_deform_attn_core(tv, list(shapes), tl, torch.from_numpy(aw))
    (out ** 2).sum().backward()

    def f(v, l):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, jnp.asarray(aw)) ** 2)

    gv, gl = jax.grad(f, argnums=(0, 1))(jnp.asarray(value), jnp.asarray(loc))
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_onehot_custom_vjp_matches_gather_grads(rng, monkeypatch):
    """The recompute-A custom VJP of the one-hot lowering must produce the
    same (value, loc, attn) gradients as plain autodiff of the gather path —
    this is what lets the auto dispatch pick onehot at TRAINING shapes
    without saving (N, M, Lq, HW) residuals (reference hand-writes its CUDA
    backward for the same reason, ms_deform_im2col_cuda.cuh:307-926)."""
    n, m, d, p = 2, 3, 8, 4
    shapes = [(6, 9), (3, 5)]
    s = sum(h * w for h, w in shapes)
    lq = 11
    value = jnp.asarray(rng.randn(n, s, m, d), np.float32)
    loc = jnp.asarray(rng.rand(n, lq, m, len(shapes), p, 2) * 1.4 - 0.2, np.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.randn(n, lq, m, len(shapes) * p), np.float32), -1
    ).reshape(n, lq, m, len(shapes), p)
    cot = jnp.asarray(rng.randn(n, lq, m * d), np.float32)

    def f(method, **kw):
        def g(v, l, a):
            return jnp.sum(
                ms_deform_attn_core(v, shapes, l, a, method=method, **kw) * cot
            )
        return jax.grad(g, argnums=(0, 1, 2))(value, loc, aw)

    want = f("gather_scatter")  # plain JAX autodiff of the gather (oracle)

    def check(tag, got):
        for gv, wv in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(gv), np.asarray(wv), rtol=1e-4, atol=1e-5,
                err_msg=tag,
            )

    for method, kw in (
        ("onehot", {}),
        ("gather", {}),  # patch-gather fwd + chunked matmul bwd (1 chunk)
        ("gather", {"onehot_cap": 64}),  # force multi-chunk bwd (Lq split)
    ):
        check(f"{method} {kw}", f(method, **kw))

    # both dwgt formulations of the chunked backward (HW-dispatched: the
    # corner-gather branch only fires at HW >= 4096 in production shapes)
    from rba_tpu.ops import deform_sampling as ds

    monkeypatch.setattr(ds, "_DWGT_CORNER_GATHER_MIN_HW", 1)
    check("gather corner-dwgt", f("gather"))
    check("gather corner-dwgt chunked", f("gather", onehot_cap=64))


def test_onehot_custom_vjp_grad_matches_torch(rng):
    """Leaf-exact onehot grads vs torch autograd of grid_sample (same oracle
    as the gather-path grad tests), including out-of-range corners."""
    value, loc, aw, shapes = _random_inputs(rng, n=1, m=2, d=4, p=2, shapes=((5, 7),))
    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(aw).requires_grad_(True)
    out = torch_ms_deform_attn_core(tv, list(shapes), tl, ta)
    out.pow(2).sum().backward()

    def f(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, a, method="onehot") ** 2)

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)
    )
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_onehot_custom_vjp_no_a_residual():
    """The whole point of the custom VJP: no (N, M, Lq, HW)-shaped tensor may
    survive as a residual between forward and backward.  Inspect the jaxpr of
    value_and_grad — every >1MB intermediate crossing the fwd/bwd boundary
    would show up as a constvar/residual of the custom_vjp call."""
    n, m, d, p, lq = 1, 8, 32, 4, 512
    shapes = [(16, 32)]
    hw = 16 * 32
    s = hw
    value = jnp.zeros((n, s, m, d), jnp.float32)
    loc = jnp.zeros((n, lq, m, 1, p, 2), jnp.float32) + 0.5
    aw = jnp.full((n, lq, m, 1, p), 1.0 / p, jnp.float32)

    def loss(v, l, a):
        return jnp.sum(ms_deform_attn_core(v, shapes, l, a, method="onehot") ** 2)

    # Residuals of the fwd pass appear as outputs of the custom_vjp fwd jaxpr
    # feeding the bwd: check the linearized jaxpr has no (.., Lq, HW) tensor.
    jaxpr = jax.make_jaxpr(lambda v, l, a: jax.grad(loss, argnums=(0,))(v, l, a))(
        value, loc, aw
    )
    bad = [v for eqn in jaxpr.eqns for v in eqn.outvars
           if hasattr(v, "aval") and getattr(v.aval, "shape", ())[-2:] == (lq, hw)
           and eqn.primitive.name == "custom_vjp_call"]
    # the A matrix must not be an output of the custom_vjp call (residual)
    assert not bad, f"A-matrix-shaped residuals leaked from custom_vjp: {bad}"


def test_onehot_matmul_matches_gather(rng):
    """The one-hot-matmul lowering is numerically equivalent to the gather
    path (both fp32; includes out-of-range sampling locations whose corners
    must contribute zero)."""
    import jax.numpy as jnp

    from rba_tpu.ops.deform_sampling import ms_deform_attn_core

    n, m, d, p = 2, 4, 8, 4
    shapes = [(6, 9), (3, 5)]
    s = sum(h * w for h, w in shapes)
    lq = 11
    value = jnp.asarray(rng.randn(n, s, m, d), np.float32)
    # locations straddling the borders: in [-0.2, 1.2]
    loc = jnp.asarray(rng.rand(n, lq, m, len(shapes), p, 2) * 1.4 - 0.2, np.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.randn(n, lq, m, len(shapes) * p), np.float32), -1
    ).reshape(n, lq, m, len(shapes), p)

    ref = ms_deform_attn_core(value, shapes, loc, aw, method="gather")
    got = ms_deform_attn_core(value, shapes, loc, aw, method="onehot")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # "auto" picks onehot at tiny shapes and stays numerically identical
    auto = ms_deform_attn_core(value, shapes, loc, aw, method="auto")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(ref), rtol=1e-5, atol=1e-5)
