"""Regression tests: per-image inference helpers must not retrace/recompile
on a second same-shape image.

Through the real TPU tunnel a compile costs 1-5 minutes, so a jit cache built
inside the per-image function (fresh function identity per call) turns a
60-image TTA sweep into hours of recompilation.  These tests count traces by
monkeypatching the module-global ``maskformer_infer`` with a counter: the
Python body of a jitted function runs only when JAX traces it, so the counter
increments exactly once per (shape, variant) compile.
"""
import numpy as np
import pytest

import jax

from rba_tpu.config import tiny_test_config
from rba_tpu.models.maskformer import maskformer_init


@pytest.fixture()
def model(rng):
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _counting(module, calls):
    orig = module.maskformer_infer

    def counted(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    return counted


def test_tta_no_retrace_second_image(rng, model, monkeypatch):
    import rba_tpu.models.tta as tta_mod

    cfg, params = model
    tta_mod._tta_variant_fn.cache_clear()
    calls = []
    monkeypatch.setattr(tta_mod, "maskformer_infer", _counting(tta_mod, calls))

    img1 = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    img2 = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    tta_mod.tta_inference(params, cfg, img1, min_sizes=(32, 48), flip=True)
    n = len(calls)
    assert n == 4  # 2 scales x 2 flips, traced once each
    tta_mod.tta_inference(params, cfg, img2, min_sizes=(32, 48), flip=True)
    assert len(calls) == n, "second same-shape image must add zero traces"


def test_sliding_window_no_retrace_second_image(rng, model, monkeypatch):
    import rba_tpu.models.sliding_window as sw_mod

    cfg, params = model
    sw_mod._tile_infer_fn.cache_clear()
    calls = []
    monkeypatch.setattr(sw_mod, "maskformer_infer", _counting(sw_mod, calls))

    img1 = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
    img2 = (rng.rand(96, 96, 3) * 255).astype(np.uint8)
    sw_mod.sliding_window_sem_seg(params, cfg, img1, tile_hw=(64, 64), overlap=16)
    n = len(calls)
    assert n == 1  # one tile shape -> one trace, shared across all tiles
    sw_mod.sliding_window_sem_seg(params, cfg, img2, tile_hw=(64, 64), overlap=16)
    assert len(calls) == n, "second same-shape image must add zero traces"


def test_evaluator_score_fn_no_retrace(rng, model, monkeypatch):
    """The sweep's default (non-TTA) path: OODEvaluator's score fn is cached
    per shape (evalx/evaluator.py:74-112)."""
    import rba_tpu.evalx.evaluator as ev_mod

    cfg, params = model
    calls = []
    monkeypatch.setattr(ev_mod, "maskformer_infer", _counting(ev_mod, calls))

    ev = ev_mod.OODEvaluator(cfg, params, score="pebal")
    img1 = (rng.rand(1, 48, 64, 3) * 255).astype(np.uint8)
    img2 = (rng.rand(1, 48, 64, 3) * 255).astype(np.uint8)
    ev.score_fn(img1)
    n = len(calls)
    assert n == 1
    ev.score_fn(img2)
    assert len(calls) == n
