import numpy as np
import pytest

import jax.numpy as jnp

from rba_tpu.evalx.metrics import (
    StreamingOODMetrics,
    exact_ood_metrics,
    metrics_from_histograms,
)

sklearn = pytest.importorskip("sklearn")
from sklearn.metrics import average_precision_score, roc_auc_score, roc_curve


def _sklearn_metrics(scores, labels):
    mask = labels != 255
    s, y = scores[mask], (labels[mask] == 1).astype(int)
    fpr, tpr, _ = roc_curve(y, s)
    # reference support.py:252-255 loops the ROC points and breaks at the
    # first tpr strictly > 0.95
    k = np.searchsorted(tpr, 0.95, side="right")
    return {
        "AUPRC": average_precision_score(y, s),
        "AUROC": roc_auc_score(y, s),
        "FPR@95TPR": fpr[min(k, len(fpr) - 1)],
    }


@pytest.mark.parametrize("sep", [0.5, 2.0])
def test_exact_metrics_match_sklearn(rng, sep):
    n = 20000
    labels = (rng.rand(n) < 0.1).astype(np.int64)
    labels[rng.rand(n) < 0.05] = 255  # ignore region
    scores = rng.randn(n) + sep * (labels == 1)
    want = _sklearn_metrics(scores, labels)
    got = exact_ood_metrics(scores, labels)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-6, err_msg=k)


def test_streaming_histogram_close_to_sklearn(rng):
    n = 200000
    labels = (rng.rand(n) < 0.03).astype(np.int64)
    scores = np.tanh(rng.randn(n)) * 19  # RbA-like bounded scores
    scores += 6.0 * (labels == 1)
    m = StreamingOODMetrics()
    # stream in chunks like per-image updates
    for i in range(0, n, 50000):
        m.update(jnp.asarray(scores[i : i + 50000]), jnp.asarray(labels[i : i + 50000]))
    got = m.compute()
    want = _sklearn_metrics(scores, labels)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=2e-3, err_msg=k)


def test_fpr95_tie_matches_reference_loop():
    """An ROC point landing exactly on tpr == 0.95 must be skipped (the
    reference breaks only on tpr > 0.95)."""
    # 19 high-scoring positives put tpr exactly at 0.95 with fpr = 0; all
    # negatives rank next; the 20th positive ranks last.  "first tpr >= .95"
    # would report fpr = 0, the reference's "first tpr > .95" reports 1.0.
    scores = np.concatenate(
        [np.linspace(20, 30, 19), [5.0], np.linspace(8, 15, 80)]
    )
    labels = np.concatenate([np.ones(20, np.int64), np.zeros(80, np.int64)])
    want = _sklearn_metrics(scores, labels)
    assert want["FPR@95TPR"] == 1.0  # the discriminating case

    got = exact_ood_metrics(scores, labels)
    np.testing.assert_allclose(got["FPR@95TPR"], want["FPR@95TPR"], atol=1e-12)

    m = StreamingOODMetrics()
    m.update(jnp.asarray(scores), jnp.asarray(labels))
    np.testing.assert_allclose(m.compute()["FPR@95TPR"], want["FPR@95TPR"], atol=1e-9)


def test_streaming_clip_detection(rng):
    m = StreamingOODMetrics(score_range=(-4.0, 4.0))
    scores = np.array([0.0, 1.0, 100.0])  # out of range
    labels = np.array([0, 1, 1])
    m.update(jnp.asarray(scores), jnp.asarray(labels))
    assert m.clipped
    with pytest.warns(UserWarning, match="exceed the histogram range"):
        m.compute()


def test_streaming_respects_ignore(rng):
    scores = rng.randn(1000)
    labels = np.zeros(1000, np.int64)
    labels[:100] = 1
    labels[500:] = 255  # ignored — metrics must not change when flipped
    m1 = StreamingOODMetrics()
    m1.update(jnp.asarray(scores), jnp.asarray(labels))
    m2 = StreamingOODMetrics()
    s2 = scores.copy()
    s2[500:] += 100.0  # wildly different ignored scores
    m2.update(jnp.asarray(s2), jnp.asarray(labels))
    a, b = m1.compute(), m2.compute()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-9)


def test_streaming_flush_preserves_counts(rng):
    """The int32→int64 host-flush (overflow guard for multi-billion-pixel
    sweeps) must be invisible to the metrics: forcing a flush after every
    update gives identical results to no flush at all."""
    from rba_tpu.evalx.metrics import StreamingOODMetrics

    scores = rng.randn(6, 500).astype(np.float32)
    labels = (rng.rand(6, 500) > 0.8).astype(np.int32)
    labels[0, :50] = 255

    a = StreamingOODMetrics(bins=4096, score_range=(-8, 8))
    b = StreamingOODMetrics(bins=4096, score_range=(-8, 8))
    b._flush_px = 1  # flush to the host int64 totals after every update
    for s, l in zip(scores, labels):
        a.update(jnp.asarray(s), l)
        b.update(jnp.asarray(s), l)
    ma, mb = a.compute(), b.compute()
    for k in ma:
        np.testing.assert_allclose(ma[k], mb[k], rtol=0, atol=0)


def test_exact_metrics_all_ignore_returns_nan():
    from rba_tpu.evalx.metrics import exact_ood_metrics

    m = exact_ood_metrics(np.zeros(100, np.float32), np.full(100, 255, np.int32))
    assert all(np.isnan(v) for v in m.values())


def test_asinh_streaming_matches_exact_on_unbounded_scores(rng):
    """Unbounded (energy-like) scores spanning 9 orders of magnitude: the
    asinh-binned streaming histogram must agree with the exact metrics
    (<1e-3) where the linear default would saturate its edge bins
    (VERDICT r3 item 7)."""
    n = 200000
    labels = (rng.rand(n) < 0.05).astype(np.int64)
    labels[rng.rand(n) < 0.02] = 255
    # heavy-tailed: lognormal magnitudes up to ~1e9, signed
    scores = np.sign(rng.randn(n)) * np.exp(rng.randn(n) * 4 + 2)
    scores += 500.0 * (labels == 1)  # separability

    m = StreamingOODMetrics(transform="asinh")
    for i in range(0, n, 50000):
        m.update(jnp.asarray(scores[i : i + 50000]), jnp.asarray(labels[i : i + 50000]))
    assert not m.clipped  # asinh covers all finite fp32 — cannot saturate
    got = m.compute()
    want = exact_ood_metrics(scores.astype(np.float32), labels)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-3, err_msg=k)


def test_asinh_streaming_matches_linear_on_bounded_scores(rng):
    """On bounded RbA-like scores the asinh binning is a pure refinement —
    same metrics as the validated linear default."""
    n = 100000
    labels = (rng.rand(n) < 0.05).astype(np.int64)
    scores = np.tanh(rng.randn(n)) * 19 + 6.0 * (labels == 1)
    lin, ash = StreamingOODMetrics(), StreamingOODMetrics(transform="asinh")
    lin.update(jnp.asarray(scores), jnp.asarray(labels))
    ash.update(jnp.asarray(scores), jnp.asarray(labels))
    a, b = lin.compute(), ash.compute()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=2e-3, err_msg=k)


def _saturated_rba_scores(rng, n=200000, anomaly_rate=0.03, k_classes=19):
    """Trained-like RbA scores: per-pixel score = -Σ_k tanh(logit_k) with
    logits deep in tanh saturation (|logit| ~ U[2, 8], residuals 1e-7…4e-2),
    so the mass piles into a narrow band near ±(K-2) — the regime where
    ABLATION.json caught the r4 streaming default losing 0.088 AUPRC pts."""
    labels = (rng.rand(n) < anomaly_rate).astype(np.int64)
    mag = rng.uniform(2.0, 8.0, size=(n, k_classes))
    sign = -np.ones((n, k_classes))
    winner = rng.randint(0, k_classes, n)
    sign[np.arange(n), winner] = 1.0  # inliers: one confident class
    # anomalies: no confident winner, logits nearer zero (less saturated)
    anom = labels == 1
    sign[anom, winner[anom]] = -1.0
    mag[anom] *= rng.uniform(0.1, 0.6, size=(anom.sum(), 1))
    scores = -np.tanh(sign * mag).sum(-1).astype(np.float32)
    return scores, labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_histogram_bounds_bracket_exact(seed):
    """The within-bin-ordering bounds are CERTIFIED: for any binning —
    including absurdly coarse ones with heavy artificial ties — the exact
    all-pixel metric must lie in [lo, hi], and the reported (grouped-tie)
    value must too."""
    r = np.random.RandomState(seed)
    n = 50000
    labels = (r.rand(n) < 0.1).astype(np.int64)
    scores = (np.tanh(r.randn(n)) * 19 + 4.0 * (labels == 1)).astype(np.float32)
    exact = exact_ood_metrics(scores, labels)
    for bins in (256, 4096, 1 << 16):
        m = StreamingOODMetrics(bins=bins)
        import warnings as _w
        with _w.catch_warnings():
            _w.simplefilter("ignore")  # coarse bins may exceed QERR_TOL
            m.update(jnp.asarray(scores), jnp.asarray(labels))
            got = m.compute(with_bounds=True)
        for k in ("AUPRC", "AUROC", "FPR@95TPR"):
            assert got[f"{k}_lo"] - 1e-12 <= exact[k] <= got[f"{k}_hi"] + 1e-12, (
                f"{k} exact={exact[k]} outside [{got[f'{k}_lo']}, {got[f'{k}_hi']}] "
                f"at {bins} bins"
            )
            assert got[f"{k}_lo"] - 1e-9 <= got[k] <= got[f"{k}_hi"] + 1e-9


def test_saturated_rba_streaming_certified_and_accurate(rng):
    """The r5 default binning must hold the streaming error under 0.01 pts
    on tanh-SATURATED score distributions (the case that falsified the r4
    '<1e-3 with 2^16 bins' claim), and certify it via the bounds."""
    scores, labels = _saturated_rba_scores(rng)
    exact = exact_ood_metrics(scores, labels)
    m = StreamingOODMetrics()
    m.update(jnp.asarray(scores), jnp.asarray(labels))
    got = m.compute(with_bounds=True)
    assert m.certified(), StreamingOODMetrics.quantization_error(got)
    for k in ("AUPRC", "AUROC", "FPR@95TPR"):
        assert abs(got[k] - exact[k]) < 1e-4, (k, got[k], exact[k])


def test_saturated_rba_coarse_bins_flagged_not_silent(rng):
    """With the r4-era 2^16 binning the same saturated distribution must be
    FLAGGED (certification fails, compute warns) rather than silently
    reporting a distorted number — the exact failure mode of ABLATION r4."""
    scores, labels = _saturated_rba_scores(rng)
    m = StreamingOODMetrics(bins=1 << 12)  # coarse enough to provably fail
    m.update(jnp.asarray(scores), jnp.asarray(labels))
    assert not m.certified()
    with pytest.warns(UserWarning, match="certified quantization error"):
        m.compute()


def test_evaluate_dataset_falls_back_to_exact_on_saturation():
    """A saturated linear histogram must trigger the exact all-pixel
    fallback (not silently-distorted metrics): the streamed result must
    EQUAL the exact metrics bit-for-bit because it re-ran that path."""
    from dataclasses import dataclass

    from rba_tpu.evalx.evaluator import OODEvaluator

    @dataclass
    class Sample:
        image: np.ndarray
        label: np.ndarray

    r = np.random.RandomState(0)
    samples = []
    for _ in range(3):
        lab = (r.rand(16, 16) < 0.3).astype(np.uint8)
        samples.append(Sample(r.randint(0, 255, (16, 16, 3), np.uint8), lab))

    def huge_score(images):
        # deterministic per-pixel scores way outside [-64, 64]
        g = images.mean(-1).astype(np.float32)
        return jnp.asarray(g[None] if g.ndim == 2 else g) * 1e6

    ev = OODEvaluator.__new__(OODEvaluator)
    ev.cfg, ev.params, ev.score_name = None, None, None
    ev.score_fn = lambda imgs: huge_score(imgs[0])[None]

    with pytest.warns(UserWarning, match="re-running the exact"):
        streamed = ev.evaluate_dataset(samples)
    scores, gts = ev.compute_anomaly_scores(samples)
    exact = ev.evaluate_ood(scores, gts)
    assert streamed == exact
