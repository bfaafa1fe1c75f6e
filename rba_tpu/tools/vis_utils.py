"""Query-embedding analysis utilities: clustering + 2-D projection plots.

Behavioral spec: /root/reference/tools/vis_utils.py:16-407 — kmeans /
meanshift / dbscan / optics / hdbscan clustering of decoder query
embeddings and t-SNE / PCA scatter plots, used to analyze what the 100
object queries specialize to.  sklearn-backed where available, with a
pure-numpy kmeans fallback.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def kmeans_numpy(x: np.ndarray, k: int, iters: int = 100, seed: int = 0):
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        new = np.stack([
            x[assign == i].mean(0) if (assign == i).any() else centers[i] for i in range(k)
        ])
        if np.allclose(new, centers):
            break
        centers = new
    return assign, centers


def cluster(x: np.ndarray, method: str = "kmeans", **kwargs) -> np.ndarray:
    """Cluster (N, D) embeddings; returns integer labels."""
    try:
        from sklearn import cluster as skc

        if method == "kmeans":
            return skc.KMeans(n_clusters=kwargs.get("k", 8), n_init=10).fit_predict(x)
        if method == "meanshift":
            return skc.MeanShift().fit_predict(x)
        if method == "dbscan":
            return skc.DBSCAN(eps=kwargs.get("eps", 0.5)).fit_predict(x)
        if method == "optics":
            return skc.OPTICS().fit_predict(x)
        if method == "hdbscan":
            return skc.HDBSCAN().fit_predict(x)
    except ImportError:
        pass
    assign, _ = kmeans_numpy(x, kwargs.get("k", 8))
    return assign


def project_2d(x: np.ndarray, method: str = "tsne", seed: int = 0) -> np.ndarray:
    """(N, D) → (N, 2) via t-SNE or PCA."""
    if method == "pca":
        xc = x - x.mean(0)
        _, _, vt = np.linalg.svd(xc, full_matrices=False)
        return xc @ vt[:2].T
    from sklearn.manifold import TSNE

    return TSNE(n_components=2, random_state=seed, init="pca").fit_transform(x)


def plot_embeddings(
    x: np.ndarray,
    labels: Optional[np.ndarray] = None,
    method: str = "pca",
    out_path: str = "embeddings.png",
):
    coords = project_2d(x, method)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        sc = ax.scatter(coords[:, 0], coords[:, 1], c=labels, cmap="tab20", s=18)
        if labels is not None:
            fig.colorbar(sc)
        ax.set_title(f"query embeddings ({method})")
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
    except ImportError:
        np.save(out_path + ".npy", coords)
    return coords


def extract_query_embeddings(params) -> Dict[str, np.ndarray]:
    """Pull the decoder's learnable query tensors for analysis."""
    pred = params["sem_seg_head"]["predictor"]
    return {
        "query_feat": np.asarray(pred["query_feat"]),
        "query_embed": np.asarray(pred["query_embed"]),
    }
