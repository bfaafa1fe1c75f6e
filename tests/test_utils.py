import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rba_tpu.utils.debug import assert_finite, checked, print_stats
from rba_tpu.utils.profiling import StageTimer, force_sync


def test_checked_catches_nan():
    @checked
    def bad(x):
        return jnp.log(x)  # log(0) = -inf, log(-1) = nan

    with pytest.raises(Exception):
        bad(jnp.asarray([-1.0]))
    # clean input passes
    out = bad(jnp.asarray([1.0, 2.0]))
    assert np.isfinite(np.asarray(out)).all()


def test_print_stats_under_jit(capfd):
    @jax.jit
    def f(x):
        print_stats(x, "x")
        return x * 2

    f(jnp.arange(8.0)).block_until_ready()
    # jax.debug.print flushes asynchronously; just verify no crash


def test_stage_timer():
    t = StageTimer()
    x = jnp.ones((128, 128))
    with t.stage("matmul", sync=None):
        y = x @ x
    with t.stage("sync", sync=y):
        pass
    s = t.summary()
    assert "matmul" in s and "sync" in s
    assert force_sync(y) == pytest.approx(128 * 128 * 128)
