"""OOD segmentation metrics: AUPRC (average precision), AUROC, FPR@95TPR.

Behavioral spec: /root/reference/support.py:247-303 (OODEvaluator.evaluate_ood
— flattens all pixels, sklearn ``average_precision_score`` + ``roc_curve``
with FPR at the first tpr >= 0.95) and :305-351 (bootstrapped mean±std).

TPU-native design: instead of hauling every pixel score to the host and
sorting ~60×2M floats in sklearn (the reference's second hot spot,
SURVEY.md §3.1), scores are accumulated into fixed-width histograms on
device (a pure jnp reduction that runs per-image inside jit and sums across
chips with psum).  AUPRC/AUROC/FPR95 are then computed from the histogram
counts on the host in O(bins).

Quantization honesty (r5): binning error depends on how much probability
mass shares a bin, NOT on a blanket bin-count claim — r4's "< 1e-3 with
2^16 bins" was falsified by ABLATION.json's own full-scale rows (streaming
AUPR 3.3004 vs exact 3.2127, a 0.088-pt gap: random-init RbA scores pile
into a narrow band, and trained scores saturate tanh near ±K the same way).
Therefore (a) the linear default is now 2^22 bins and (b) every streaming
result carries CERTIFIED bounds from the within-bin-ordering argument
(``metrics_from_histograms(with_bounds=True)``); ``StreamingOODMetrics``
warns — and the evaluator falls back to the exact path — whenever the
certified error exceeds 0.01 pts.  Exact sklearn-equivalent computation is
also provided (native radix-sort engine) for official numbers and parity
testing.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# RbA scores are bounded: -Σ_k tanh ∈ [-K, K]; leave headroom for energy etc.
DEFAULT_RANGE = (-64.0, 64.0)
# 2^22 bins (16 MiB int32 per histogram): RbA scores concentrate in a narrow
# band (tanh saturation near ±K for trained weights; tiny spread around 0 for
# random init), so the 2^16 default used through r4 was locally coarse
# exactly where the mass is — ABLATION.json measured a 0.088-AUPRC-pt
# streaming-vs-exact gap at full scale, ~90% of the total parity budget.
# At 2^22 the bin width is 3.05e-5 and the certified within-bin-ordering
# bounds (metrics_from_histograms(with_bounds=True)) shrink accordingly;
# StreamingOODMetrics warns whenever the certified error exceeds 0.01 pts.
DEFAULT_BINS = 1 << 22
# asinh-space range covering every finite fp32 magnitude
# (asinh(3.4e38) ≈ 88.7): unbounded score functions can never saturate
ASINH_RANGE = (-90.0, 90.0)
# the asinh transform trades resolution for range (bin width grows ∝ |s|),
# so the asinh histogram uses 64× more bins — still only 16 MiB of int32
# (validated <1e-3 vs exact on 9-decade heavy-tailed scores in
# tests/test_metrics.py)
ASINH_BINS = 1 << 22


def histogram_update(
    scores: jax.Array,  # (…,) anomaly scores
    labels: jax.Array,  # (…,) int: 0 inlier, 1 anomaly, 255 ignore
    bins: int = DEFAULT_BINS,
    score_range: Tuple[float, float] = DEFAULT_RANGE,
    transform: str = "linear",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (pos_hist, neg_hist) int32 histograms of anomaly/inlier pixel
    scores.  Jit-friendly; sum histograms across images/chips.

    ``transform="asinh"`` bins asinh(score) instead of the raw score —
    asinh is strictly monotone, and AUPRC/AUROC/FPR95 depend only on the
    score *ordering*, so ``metrics_from_histograms`` is unchanged; the
    benefit is log-spaced resolution that covers all finite fp32 scores
    (``score_range`` is then interpreted in asinh space)."""
    lo, hi = score_range
    s = scores.reshape(-1).astype(jnp.float32)
    if transform == "asinh":
        s = jnp.arcsinh(s)
    s = jnp.clip(s, lo, hi)
    idx = ((s - lo) * (bins / (hi - lo))).astype(jnp.int32)
    idx = jnp.clip(idx, 0, bins - 1)
    lab = labels.reshape(-1)
    pos = jnp.zeros((bins,), jnp.int32).at[idx].add((lab == 1).astype(jnp.int32))
    neg = jnp.zeros((bins,), jnp.int32).at[idx].add((lab == 0).astype(jnp.int32))
    return pos, neg


def _harmonic_diff(a: np.ndarray, p: np.ndarray) -> np.ndarray:
    """H(a+p) − H(a) = Σ_{j=1..p} 1/(a+j), vectorized (a ≥ 0, p ≥ 0)."""
    try:
        from scipy.special import digamma
    except ImportError:  # asymptotic ψ with recurrence below x=16
        def digamma(x):
            x = np.asarray(x, np.float64).copy()
            acc = np.zeros_like(x)
            while np.any(small := x < 16.0):
                acc[small] -= 1.0 / x[small]
                x[small] += 1.0
            inv2 = 1.0 / (x * x)
            return acc + np.log(x) - 0.5 / x - inv2 * (1.0 / 12 - inv2 / 120)
    a = np.asarray(a, np.float64)
    p = np.asarray(p, np.float64)
    return digamma(a + p + 1.0) - digamma(a + 1.0)


def metrics_from_histograms(
    pos_hist: np.ndarray, neg_hist: np.ndarray, with_bounds: bool = False
) -> Dict[str, float]:
    """AUPRC / AUROC / FPR@95TPR from score histograms (host, O(bins)).

    Matches sklearn conventions: thresholds descend (high score = anomaly),
    average_precision = Σ (R_i − R_{i−1})·P_i, FPR95 = fpr at the first
    tpr >= 0.95 on the ROC curve (support.py:295-303).

    ``with_bounds=True`` additionally returns CERTIFIED lower/upper bounds
    (keys ``<metric>_lo`` / ``<metric>_hi``) on the exact all-pixel metric:
    binning only loses the ordering *within* each bin, and every metric here
    is extremal when a bin's positives all rank above (or below) its
    negatives, so the exact value — whatever the true within-bin ordering or
    tie structure — provably lies in [lo, hi].  hi − lo is the streaming
    path's quantization error, reported instead of the former (falsified)
    blanket "< 1e-3" claim.
    """
    pos = np.asarray(pos_hist, np.float64)
    neg = np.asarray(neg_hist, np.float64)
    p_total = pos.sum()
    n_total = neg.sum()
    if p_total == 0 or n_total == 0:
        out = {"AUPRC": float("nan"), "AUROC": float("nan"), "FPR@95TPR": float("nan")}
        if with_bounds:
            for k in list(out):
                out[f"{k}_lo"] = out[f"{k}_hi"] = float("nan")
        return out

    # descending score order: reverse cumulative sums
    tp = np.cumsum(pos[::-1])
    fp = np.cumsum(neg[::-1])
    # keep only bins where threshold changes matter (nonzero counts)
    nz = (pos[::-1] + neg[::-1]) > 0
    p_i, n_i = pos[::-1][nz], neg[::-1][nz]
    tp, fp = tp[nz], fp[nz]

    tpr = tp / p_total
    fpr = fp / n_total
    precision = tp / np.maximum(tp + fp, 1)
    recall = tpr

    # average precision: sum over recall increments
    r_prev = np.concatenate([[0.0], recall[:-1]])
    auprc = float(np.sum((recall - r_prev) * precision))

    # AUROC: trapezoid over (fpr, tpr) with (0,0) prepended
    fpr_full = np.concatenate([[0.0], fpr])
    tpr_full = np.concatenate([[0.0], tpr])
    auroc = float(np.trapezoid(tpr_full, fpr_full))

    # FPR at the first tpr strictly > 0.95 (reference support.py:252-255
    # breaks on `if i > 0.95`)
    k = np.searchsorted(tpr, 0.95, side="right")
    k = min(k, len(fpr) - 1)
    fpr95 = float(fpr[k])
    out = {"AUPRC": auprc, "AUROC": auroc, "FPR@95TPR": fpr95}
    if not with_bounds:
        return out

    t_before = tp - p_i  # cumulative TP/FP from strictly higher bins
    f_before = fp - n_i
    has_p = p_i > 0

    # AP upper bound: all of a bin's positives tie in ONE group ranked above
    # its negatives — contribution (p/P)·(T+p)/(T+p+F), which dominates both
    # the distinct pos-first ordering and any finer grouping.
    ap_hi = float(np.sum(np.where(has_p, p_i * tp / np.maximum(tp + f_before, 1), 0.0)) / p_total)
    # AP lower bound: negatives first, positives distinct —
    # Σ_{j=1..p} (T+j)/(T+j+c) = p − c·(H(T+c+p) − H(T+c)), c = F + n.
    c = f_before + n_i
    ap_lo_terms = np.where(
        has_p, p_i - c * _harmonic_diff(t_before + c, np.where(has_p, p_i, 0.0)), 0.0
    )
    ap_lo = float(np.sum(ap_lo_terms) / p_total)

    # AUROC = P(pos > neg) + ½·P(tie): cross-bin pairs are fixed, within-bin
    # p·n pairs contribute 0 (neg-first) … p·n (pos-first).
    base = float(np.sum(p_i * (n_total - fp)) / (p_total * n_total))
    tie_mass = float(np.sum(p_i * n_i) / (p_total * n_total))
    auroc_lo, auroc_hi = base, base + tie_mass

    # FPR95: the 0.95-TPR crossing lands inside bin k (computed above on the
    # grouped curve, identical crossing bin for any within-bin ordering);
    # pos-first reaches it before any of that bin's negatives, neg-first
    # after all of them.
    fpr95_lo = float(f_before[k] / n_total)
    fpr95_hi = float((f_before[k] + n_i[k]) / n_total)

    out.update({
        "AUPRC_lo": ap_lo, "AUPRC_hi": ap_hi,
        "AUROC_lo": auroc_lo, "AUROC_hi": auroc_hi,
        "FPR@95TPR_lo": fpr95_lo, "FPR@95TPR_hi": fpr95_hi,
    })
    return out


def exact_ood_metrics(scores: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    """Exact (sklearn-equivalent) metrics from raw flattened pixels — the
    reference's computation (support.py:270-303), used for parity tests and
    small datasets.  Uses the native radix-sort engine
    (rba_tpu/native/metrics.cc) when built; numpy otherwise."""
    try:
        from ..native.bindings import exact_ood_metrics_native

        native = exact_ood_metrics_native(scores, labels)
        if native is not None:
            return native
    except Exception:
        pass
    mask = labels != 255
    s = scores[mask].astype(np.float64)
    y = (labels[mask] == 1).astype(np.int64)
    if s.size == 0:  # every pixel ignored — guard before any indexing
        return {"AUPRC": float("nan"), "AUROC": float("nan"), "FPR@95TPR": float("nan")}
    order = np.argsort(-s, kind="mergesort")
    s, y = s[order], y[order]
    distinct = np.where(np.diff(s))[0]
    idxs = np.concatenate([distinct, [len(s) - 1]])

    tp = np.cumsum(y)[idxs]
    fp = (idxs + 1) - tp
    p_total = y.sum()
    n_total = len(y) - p_total
    if p_total == 0 or n_total == 0:
        return {"AUPRC": float("nan"), "AUROC": float("nan"), "FPR@95TPR": float("nan")}
    tpr = tp / p_total
    fpr = fp / n_total
    precision = tp / (tp + fp)
    r_prev = np.concatenate([[0.0], tpr[:-1]])
    auprc = float(np.sum((tpr - r_prev) * precision))
    auroc = float(np.trapezoid(np.concatenate([[0.0], tpr]), np.concatenate([[0.0], fpr])))
    # first tpr strictly > 0.95, matching support.py:252-255
    k = np.searchsorted(tpr, 0.95, side="right")
    k = min(k, len(fpr) - 1)
    return {"AUPRC": auprc, "AUROC": auroc, "FPR@95TPR": float(fpr[k])}


class StreamingOODMetrics:
    """Accumulate per-image histograms on device; one host transfer at the
    end.  Updates are async-dispatched, so the evaluation loop never blocks
    on a device→host sync per image (the chip stays busy while the host
    decodes the next image)."""

    def __init__(self, bins: Optional[int] = None, score_range=None,
                 transform: str = "linear"):
        """``transform="asinh"`` switches to log-spaced binning that covers
        every finite fp32 score (for unbounded score functions like the
        PEBAL energy); defaults then become ASINH_BINS/ASINH_RANGE and
        saturation is impossible.  Linear mode keeps the validated
        2^16-bin [-64, 64] default for bounded RbA scores."""
        if transform not in ("linear", "asinh"):
            raise ValueError(f"unknown transform {transform!r}")
        self.transform = transform
        if bins is None:
            bins = ASINH_BINS if transform == "asinh" else DEFAULT_BINS
        if score_range is None:
            score_range = ASINH_RANGE if transform == "asinh" else DEFAULT_RANGE
        self.bins = bins
        self.range = score_range
        self.pos = jnp.zeros((bins,), jnp.int32)
        self.neg = jnp.zeros((bins,), jnp.int32)
        # int64 needs jax x64 mode, so the device accumulators are int32;
        # they are flushed into host int64 totals before a single bin could
        # ever reach 2^31 (worst case: every scored pixel lands in one bin)
        self._pos_host = np.zeros((bins,), np.int64)
        self._neg_host = np.zeros((bins,), np.int64)
        self._px_since_flush = 0
        self._flush_px = 2**31 - 2**26
        # running observed min/max over scored (non-ignore) pixels, so
        # unbounded scores (e.g. energy logsumexp) that saturate the edge
        # bins are detected instead of silently distorting the metrics
        self.smin = jnp.asarray(jnp.inf, jnp.float32)
        self.smax = jnp.asarray(-jnp.inf, jnp.float32)

        def _upd(p, n, lo, hi, s, l):
            dp, dn = histogram_update(
                s, l, bins=bins, score_range=score_range, transform=transform
            )
            sf = s.reshape(-1).astype(jnp.float32)
            scored = l.reshape(-1) != 255
            lo = jnp.minimum(lo, jnp.min(jnp.where(scored, sf, jnp.inf)))
            hi = jnp.maximum(hi, jnp.max(jnp.where(scored, sf, -jnp.inf)))
            return p + dp, n + dn, lo, hi

        self._update = jax.jit(_upd)

    def update(self, scores, labels):
        self.pos, self.neg, self.smin, self.smax = self._update(
            self.pos, self.neg, self.smin, self.smax, scores, jnp.asarray(labels)
        )
        self._px_since_flush += int(np.prod(np.shape(scores)))
        if self._px_since_flush >= self._flush_px:
            self._flush()

    def absorb(self, dpos, dneg, smin, smax, n_pixels: int):
        """Merge device-computed histogram deltas — e.g. from a fused
        cohort scan (evaluator.make_cohort_fn) that scored k images and
        histogrammed them in one dispatch.  The deltas must have been
        computed with this instance's bins/range/transform."""
        self.pos = self.pos + dpos
        self.neg = self.neg + dneg
        self.smin = jnp.minimum(self.smin, smin)
        self.smax = jnp.maximum(self.smax, smax)
        self._px_since_flush += int(n_pixels)
        if self._px_since_flush >= self._flush_px:
            self._flush()

    def _flush(self):
        """Move the device int32 partial histograms into the host int64
        totals (one device→host sync; called every ~2e9 scored pixels)."""
        self._pos_host += np.asarray(self.pos, np.int64)
        self._neg_host += np.asarray(self.neg, np.int64)
        self.pos = jnp.zeros((self.bins,), jnp.int32)
        self.neg = jnp.zeros((self.bins,), jnp.int32)
        self._px_since_flush = 0

    @property
    def clipped(self) -> bool:
        lo, hi = self.range
        smin, smax = float(self.smin), float(self.smax)
        if self.transform == "asinh":
            smin, smax = np.arcsinh(smin), np.arcsinh(smax)
        return bool(smin < lo) or bool(smax > hi)

    # certified quantization error above this (in metric units; 1e-4 =
    # 0.01 percentage points) triggers a warning here and the exact-path
    # fallback in evaluator.evaluate_dataset
    QERR_TOL = 1e-4

    def compute(self, with_bounds: bool = True) -> Dict[str, float]:
        if self.clipped:
            import warnings

            warnings.warn(
                f"StreamingOODMetrics: observed scores "
                f"[{float(self.smin):.3g}, {float(self.smax):.3g}] exceed the "
                f"histogram range {self.range}; edge bins are saturated — "
                f"re-run with a wider score_range or the exact path",
                stacklevel=2,
            )
        self._flush()
        m = metrics_from_histograms(self._pos_host, self._neg_host,
                                    with_bounds=with_bounds)
        if with_bounds:
            qerr = self.quantization_error(m)
            if any(v > self.QERR_TOL for v in qerr.values()):
                import warnings

                warnings.warn(
                    f"StreamingOODMetrics: certified quantization error "
                    f"{ {k: round(v, 6) for k, v in qerr.items()} } exceeds "
                    f"{self.QERR_TOL} ({self.QERR_TOL * 100:.2g} pts) — use "
                    f"the exact path for official numbers",
                    stacklevel=2,
                )
        return m

    @staticmethod
    def quantization_error(m: Dict[str, float]) -> Dict[str, float]:
        """Certified |exact − streaming| ceiling per metric (hi − lo of the
        within-bin-ordering bounds), from a compute(with_bounds=True) dict."""
        return {
            k: m[f"{k}_hi"] - m[f"{k}_lo"]
            for k in ("AUPRC", "AUROC", "FPR@95TPR")
            if f"{k}_hi" in m and np.isfinite(m[f"{k}_hi"])
        }

    def certified(self, tol: Optional[float] = None) -> bool:
        """True when every metric's certified quantization error is within
        ``tol`` (default QERR_TOL) and no scores were clipped."""
        if self.clipped:
            return False
        self._flush()
        m = metrics_from_histograms(self._pos_host, self._neg_host, with_bounds=True)
        qerr = self.quantization_error(m)
        t = self.QERR_TOL if tol is None else tol
        return all(v <= t for v in qerr.values())
