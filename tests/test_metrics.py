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
    k = np.searchsorted(tpr, 0.95, side="left")
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
