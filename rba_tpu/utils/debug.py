"""Numerical debugging helpers.

SURVEY.md §5 "race detection / sanitizers": the reference has only CUDA
contiguity asserts and ad-hoc ``print_stats`` helpers
(/root/reference/mask2former/modeling/pixel_decoder/msdeformattn.py:22-29).
TPU-native equivalents: jax.debug prints that work under jit, a checkify
wrapper that turns NaN/Inf into checked errors, and Pallas interpreter mode
for kernel debugging (see tests/test_fused_rba.py).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def print_stats(x: jax.Array, name: str = "tensor") -> None:
    """(min, max, mean, std) — works inside jit via jax.debug.print;
    mirrors the reference's print_stats helpers."""
    x32 = x.astype(jnp.float32)
    jax.debug.print(
        name + ": (Min, Max, Mean, STD) {a} {b} {c} {d}",
        a=jnp.min(x32), b=jnp.max(x32), c=jnp.mean(x32), d=jnp.std(x32),
    )


def assert_finite(x: jax.Array, name: str = "tensor") -> None:
    """checkify-able finiteness assertion usable under jit."""
    checkify.check(jnp.all(jnp.isfinite(x.astype(jnp.float32))), f"{name} has NaN/Inf")


def checked(fn: Callable) -> Callable:
    """Wrap a jittable function so float errors (NaN/Inf/div) raise on the
    host instead of silently propagating."""
    cf = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        err.throw()
        return out

    return wrapper
