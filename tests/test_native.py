import numpy as np
import pytest

from rba_tpu.native import bindings


@pytest.fixture(scope="module")
def native_lib():
    try:
        from rba_tpu.native.build import build

        build()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    if not bindings.available():
        pytest.skip("native library failed to load")
    return True


def test_native_metrics_match_sklearn(native_lib, rng):
    from sklearn.metrics import average_precision_score, roc_auc_score, roc_curve

    n = 100000
    labels = (rng.rand(n) < 0.07).astype(np.int32)
    labels[rng.rand(n) < 0.02] = 255
    scores = (rng.randn(n) + 2.0 * (labels == 1)).astype(np.float32)

    got = bindings.exact_ood_metrics_native(scores, labels)
    mask = labels != 255
    y = (labels[mask] == 1).astype(int)
    s = scores[mask]
    fpr, tpr, _ = roc_curve(y, s)
    k = np.searchsorted(tpr, 0.95, side="left")
    np.testing.assert_allclose(got["AUPRC"], average_precision_score(y, s), atol=1e-6)
    np.testing.assert_allclose(got["AUROC"], roc_auc_score(y, s), atol=1e-6)
    np.testing.assert_allclose(got["FPR@95TPR"], fpr[min(k, len(fpr) - 1)], atol=1e-9)


def test_native_metrics_tie_handling(native_lib):
    # heavy ties: quantized scores (the RbA map has large equal-score areas)
    scores = np.repeat(np.arange(5, dtype=np.float32), 200)
    labels = np.zeros(1000, np.int32)
    labels[-300:] = 1
    from sklearn.metrics import average_precision_score, roc_auc_score

    got = bindings.exact_ood_metrics_native(scores, labels)
    np.testing.assert_allclose(got["AUPRC"], average_precision_score(labels, scores), atol=1e-9)
    np.testing.assert_allclose(got["AUROC"], roc_auc_score(labels, scores), atol=1e-9)


def test_native_lsap_matches_scipy(native_lib, rng):
    from scipy.optimize import linear_sum_assignment as scipy_lsa

    for _ in range(20):
        r = rng.randint(1, 30)
        c = rng.randint(r, 50)
        cost = rng.randn(r, c) * 10
        cols = bindings.lsap_native(cost)
        rows_s, cols_s = scipy_lsa(cost)
        np.testing.assert_allclose(
            cost[np.arange(r), cols].sum(), cost[rows_s, cols_s].sum(), rtol=1e-9
        )


def test_exact_metrics_dispatches_native(native_lib, rng):
    from rba_tpu.evalx.metrics import exact_ood_metrics

    n = 5000
    labels = (rng.rand(n) < 0.1).astype(np.int64)
    scores = rng.randn(n) + labels
    m = exact_ood_metrics(scores.astype(np.float32), labels)
    assert 0.0 <= m["AUPRC"] <= 1.0
