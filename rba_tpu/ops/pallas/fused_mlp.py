"""Fused transformer-MLP block kernel (Pallas/TPU).

The Swin block tail ``x + fc2(gelu(fc1(LN(x))))`` (reference swin.py:293-295,
mlp at :174-208) is HBM-bound at the early stages: at Swin-B 1024x2048 the
stage-0 hidden tensor is (131072, 512) — 134 MB bf16 — which the unfused XLA
chain writes and re-reads per block, putting the measured chain at ~2x the
bandwidth roofline (~1.1 ms/block, CLAUDE.md perf log).  This kernel streams
token tiles through VMEM and never materializes the 4C hidden in HBM: per
tile it does LN (fp32 moments), the (tile, C) @ (C, 4C) fc1 matmul, exact
gelu, the (tile, 4C) @ (4C, C) fc2 matmul, and the residual add, so HBM
traffic drops from ~5 reads + 5 writes of token-sized tensors to exactly one
read of x and one write of the output.

Dtype placement matches the XLA path bit-for-bit modulo MXU accumulation
order: LN math in fp32 rounded to the compute dtype, matmuls accumulate fp32
(preferred_element_type) and round to compute dtype BEFORE the bias add
(jnp.dot emits compute-dtype outputs in ops/nn.linear), gelu exact
(erf-based, approximate=False) in compute dtype.

Blocking: the grid walks token tiles of ``block_tokens`` rows (the only
grid axis — weights use a constant index_map so Mosaic keeps them
VMEM-resident across steps); inside a step an unrolled loop processes
``sub_tokens``-row slabs so the fp32 (sub, 4C) gelu temporaries stay inside
the ~16 MB scoped-VMEM budget (CLAUDE.md).  Per-step work is tens of
microseconds (vs the ~30 us Mosaic grid-step overhead), i.e. the
"ms-scale-ish per step" shape that wins on this tunnel, unlike the
window-granular attention kernels that lost.

Weights for dims where they no longer fit VMEM (Swin stage 3: C=1024 means
16.8 MB of bf16 weights alone) are rejected by ``supports``; the XLA path
stays the default there (its stage-3 linears already run at 150-175 TF/s).

MEASURED NEGATIVE IN-MODEL (v5e, Swin-B 1024x2048, parity mode): standalone
the kernel beats the isolated XLA chain at the C<=256 stages (stage 0: 1.11
vs 1.23 ms, stage 1: 0.69 vs 0.89 ms — tools/perf_fused_mlp.py), but the
full model runs 44.36 ms with ``mlp_impl="fused"`` vs 43.6 ms stock
(`devtime --mlp-impl fused`).  The in-model XLA MLP already runs at the
kernel's standalone speed because XLA fuses the LN moments and residual
into the neighboring matmul epilogues ("MLP matmul+epilogue fusions" in the
trace, CLAUDE.md); excising the chain into a pallas_call forfeits those
boundary fusions and adds entry/exit relayouts, a net ~+0.2 ms/block.
Kept opt-in via ``SwinConfig.mlp_impl="fused"`` (default "xla").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_blocking(t: int, c: int):
    """(block_tokens, sub_tokens) keeping in/out blocks + fp32 hidden slab
    within the scoped-VMEM budget; None if the shape is unsupported.

    t need not divide the block: the grid is ceil(t / tb) and Pallas masks
    the partial last block's stores — every output row depends only on its
    own input row (row-wise LN + matmuls), so the garbage rows OOB loads
    produce never contaminate valid rows."""
    if c % 128 or c > 512:
        return None
    # budget per step: 2*(TB*C*2B) double-buffered io + SB*4C*4B hidden
    # (TB=16384 at C=128 measured 16.04M > the 16M scoped-vmem limit)
    if c <= 128:
        tb, sb = 8192, 2048
    elif c <= 256:
        tb, sb = 4096, 1024
    else:  # 512
        tb, sb = 2048, 512
    while tb >= 2 * t and tb > 8:
        tb //= 2
    sb = min(sb, tb)
    return tb, sb


# erf(u)/u = P_A(u^2) on u in [0,1)  (Chebyshev refit, max rel err 1.3e-10)
_ERF_PA = (
    -9.80925651774188e-06, 0.00011313114528407093, -0.0008490195297251833,
    0.005221422912479452, -0.026865558324372117, 0.11283784462386079,
    -0.3761263858069, 1.128379167071956,
)
# erfc(u)*exp(u^2)*u = Q_B(1/u^2) on u in [1, 9.5]  (max rel err 3.8e-6)
_ERF_QB = (
    0.5064512085832366, -2.7460800676956847, 6.516093632845019,
    -8.94738094961009, 7.966414180509666, -4.946874283223197,
    2.3210483764535317, -0.9415825894893013, 0.41725758740173013,
    -0.2819502977567945, 0.5641883923281208,
)


def _horner(coefs, t):
    acc = jnp.float32(coefs[0])
    for c in coefs[1:]:
        acc = acc * t + jnp.float32(c)
    return acc


def _gelu_exact(x):
    """Exact (erf-grade) gelu.  Neither erf nor erfc exists in this Mosaic
    lowering (jax.nn.gelu(approximate=False) -> erfc: NotImplementedError),
    so erf is evaluated from fitted polynomials with exp — the only
    transcendental the kernel needs.  Relative error vs true gelu < 4e-6
    everywhere (validated against scipy.special in tests/test_fused_mlp.py),
    i.e. ~500x below bf16 resolution; the negative tail uses the erfc form
    directly so there is no 1-(1-e) cancellation.  The tanh approximation
    was rejected: 17% relative error at x = -3."""
    x32 = x.astype(jnp.float32)
    t = 0.5 * x32 * x32  # = s^2, s = x/sqrt(2)
    s = jnp.float32(0.7071067811865476) * x32
    u = jnp.abs(s)
    # u < 1: gelu = 0.5 x (1 + s*P_A(s^2))
    small = 0.5 * x32 * (1.0 + s * _horner(_ERF_PA, t))
    # u >= 1: e = erfc(u) = exp(-u^2) * Q_B(1/u^2) / u
    tc = jnp.maximum(t, 1e-6)  # guarded: branch only taken at t >= 0.5
    e = jnp.exp(-tc) * _horner(_ERF_QB, 1.0 / tc) / jnp.sqrt(tc)
    large = jnp.where(s >= 0, x32 - 0.5 * x32 * e, 0.5 * x32 * e)
    y = jnp.where(u < 1.0, small, large)
    return y.astype(x.dtype)


def _kernel(x_ref, g_ref, bet_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, sub: int):
    nsub = x_ref.shape[0] // sub
    gamma = g_ref[:].astype(jnp.float32)  # (1, C)
    beta = bet_ref[:].astype(jnp.float32)
    for s in range(nsub):
        xs = x_ref[s * sub : (s + 1) * sub, :]  # (SB, C) compute dtype
        x32 = xs.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        mean_sq = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        var = jnp.maximum(mean_sq - mean * mean, 0.0)
        y32 = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        y = (y32 * gamma + beta).astype(xs.dtype)
        h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
        h = h.astype(xs.dtype) + b1_ref[:]
        h = _gelu_exact(h)
        o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
        o = o.astype(xs.dtype) + b2_ref[:]
        o_ref[s * sub : (s + 1) * sub, :] = xs + o


def supports(t: int, c: int) -> bool:
    """Capacity: the kernel can run this shape."""
    return _pick_blocking(t, c) is not None


def beneficial(t: int, c: int) -> bool:
    """Policy: the kernel is faster than the XLA chain here.  C = 512 is
    supported but measured SLOWER (0.39 vs 0.25 ms at the Swin-B stage-2
    shape on v5e) — that regime is MXU-bound and XLA's epilogue fusion wins;
    the kernel's edge is the HBM-bound C <= 256 stages (stage 0: 1.11 vs
    1.23 ms, stage 1: 0.69 vs 0.89 ms standalone)."""
    return c <= 256 and supports(t, c)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_mlp_flat(x, gamma, beta, w1, b1, w2, b2, interpret=False):
    t, c = x.shape
    hid = w1.shape[1]
    tb, sb = _pick_blocking(t, c)
    dt = x.dtype
    row = lambda a, n: a.astype(dt).reshape(1, n)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    tok = pl.BlockSpec((tb, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, sub=sb),
        out_shape=jax.ShapeDtypeStruct((t, c), dt),
        grid=((t + tb - 1) // tb,),
        in_specs=[tok, const((1, c)), const((1, c)), const((c, hid)),
                  const((1, hid)), const((hid, c)), const((1, c))],
        out_specs=tok,
        interpret=interpret,
    )(x, row(gamma, c), row(beta, c), w1.astype(dt), row(b1, hid),
      w2.astype(dt), row(b2, c))


def fused_mlp_residual(
    x: jax.Array,  # (..., C) compute-dtype activations
    ln_params,  # {"scale": (C,), "bias": (C,)}
    fc1,  # {"kernel": (C, 4C), "bias": (4C,)}
    fc2,  # {"kernel": (4C, C), "bias": (C,)}
    interpret: bool = False,
) -> jax.Array:
    """x + fc2(gelu(fc1(layer_norm(x)))) with the hidden tensor never
    leaving VMEM.  Caller must check ``supports(prod(leading), C)``."""
    lead = x.shape[:-1]
    c = x.shape[-1]
    t = 1
    for d in lead:
        t *= d
    out = _fused_mlp_flat(
        x.reshape(t, c), ln_params["scale"], ln_params["bias"],
        fc1["kernel"], fc1["bias"], fc2["kernel"], fc2["bias"],
        interpret=interpret,
    )
    return out.reshape(*lead, c)
