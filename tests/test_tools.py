import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rba_tpu.config import tiny_test_config
from rba_tpu.models.maskformer import maskformer_init


def test_parameter_count():
    from rba_tpu.tools.analyze_model import parameter_count, structure_string

    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    counts = parameter_count(params)
    total = counts[""]
    assert total == sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert counts["backbone"] + counts["sem_seg_head"] == total
    s = structure_string(params, depth=2)
    assert "backbone" in s


def test_flop_count():
    from rba_tpu.tools.analyze_model import flop_count

    def f(x):
        return x @ x

    flops = flop_count(f, jnp.zeros((64, 64)))
    # 64³ × 2 = 524288 FLOPs (XLA counts fused multiply-add as 2)
    assert flops == pytest.approx(2 * 64**3, rel=0.1)


def test_vis_cluster_and_project(rng):
    from rba_tpu.tools.vis_utils import cluster, kmeans_numpy, project_2d

    x = np.concatenate([rng.randn(30, 8) + 5, rng.randn(30, 8) - 5]).astype(np.float32)
    labels = cluster(x, "kmeans", k=2)
    # two well-separated blobs must split cleanly
    assert len(set(labels[:30])) == 1 and len(set(labels[30:])) == 1
    assert labels[0] != labels[-1]

    coords = project_2d(x, "pca")
    assert coords.shape == (60, 2)

    a, c = kmeans_numpy(x, 2)
    assert c.shape == (2, 8)


def test_pq_semseg_tool(rng):
    from rba_tpu.tools.evaluate_pq_semseg import evaluate, semseg_to_panoptic

    gt = np.zeros((20, 20), np.int32)
    gt[:, 10:] = 3
    gt[:2, :] = 255  # ignore
    pan, segs = semseg_to_panoptic(gt)
    assert {s["category_id"] for s in segs} == {0, 3}

    res = evaluate([gt.copy()], [gt])
    assert res["All"]["pq"] == 1.0

    pred = gt.copy()
    pred[:, :5] = 3  # corrupt
    res2 = evaluate([pred], [gt])
    assert res2["All"]["pq"] < 1.0


def test_timm_swin_converter(rng):
    import torch

    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.swin import swin_apply
    from rba_tpu.tools.convert_checkpoint import convert_timm_swin

    cfg = tiny_test_config()
    s = cfg.swin
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[prefix + ".weight"] = rng.randn(dout, din).astype(np.float32) * 0.02
        if bias:
            sd[prefix + ".bias"] = np.zeros(dout, np.float32)

    sd["patch_embed.proj.weight"] = rng.randn(s.embed_dim, 3, 4, 4).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(s.embed_dim, np.float32)
    sd["patch_embed.norm.weight"] = np.ones(s.embed_dim, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(s.embed_dim, np.float32)
    for i in range(s.num_layers):
        dim = s.stage_dim(i)
        for j in range(s.depths[i]):
            pre = f"layers.{i}.blocks.{j}"
            for n in ("norm1", "norm2"):
                sd[pre + f".{n}.weight"] = np.ones(dim, np.float32)
                sd[pre + f".{n}.bias"] = np.zeros(dim, np.float32)
            sd[pre + ".attn.relative_position_bias_table"] = rng.randn(
                (2 * s.window_size - 1) ** 2, s.num_heads[i]
            ).astype(np.float32)
            sd[pre + ".attn.relative_position_index"] = np.zeros(
                (s.window_size**2, s.window_size**2), np.int64
            )
            lin(pre + ".attn.qkv", dim, 3 * dim)
            lin(pre + ".attn.proj", dim, dim)
            lin(pre + ".mlp.fc1", dim, int(dim * s.mlp_ratio))
            lin(pre + ".mlp.fc2", int(dim * s.mlp_ratio), dim)
        if i < s.num_layers - 1:
            sd[f"layers.{i}.downsample.norm.weight"] = np.ones(4 * dim, np.float32)
            sd[f"layers.{i}.downsample.norm.bias"] = np.zeros(4 * dim, np.float32)
            lin(f"layers.{i}.downsample.reduction", 4 * dim, 2 * dim, bias=False)
    sd["head.weight"] = rng.randn(1000, 64).astype(np.float32)  # dropped
    sd["norm.weight"] = np.ones(64, np.float32)  # dropped

    params = jax.tree.map(jnp.asarray, convert_timm_swin(sd, cfg))
    outs = swin_apply(params, cfg.swin, jnp.zeros((1, 64, 64, 3)), compute_dtype=jnp.float32)
    assert set(outs) == set(cfg.swin.out_features)


def test_clustering_methods_full_surface(rng):
    """Reference vis_utils parity surface: all five clustering methods,
    PCA variance threshold, elbow + silhouette model selection."""
    from rba_tpu.tools.vis_utils import (
        apply_kmeans,
        cluster_with_dbscan,
        cluster_with_hdbscan,
        cluster_with_meanshift,
        cluster_with_optics,
        find_n_clusters_elbow_method,
        find_pca_n_components_for_variance_threshold,
        pca_explained_variance,
        plot_clusters,
        silhouette_scores,
    )

    x = np.concatenate([rng.randn(30, 6) + 4, rng.randn(30, 6) - 4])
    labels, centers = apply_kmeans(x, 2)
    assert len(np.unique(labels)) == 2 and centers.shape == (2, 6)
    labels, _ = cluster_with_meanshift(x)
    assert len(np.unique(labels)) >= 1
    assert cluster_with_dbscan(x, eps=3.0).shape == (60,)
    assert cluster_with_optics(x, min_samples=5).shape == (60,)
    assert cluster_with_hdbscan(x).shape == (60,)

    vr = pca_explained_variance(x)
    assert find_pca_n_components_for_variance_threshold(vr, 0.99) >= 1
    ks, inertias = find_n_clusters_elbow_method(x, 1, 3)
    assert inertias[0] > inertias[-1]  # inertia decreases with k
    ks, scores = silhouette_scores(x, 2, 3)
    assert scores[0] > 0.5  # well-separated blobs

    labels, coords = plot_clusters(x, method="kmeans", cluster_mode="pca", k=2)
    assert labels.shape == (60,) and coords.shape == (60, 2)


def test_analyze_model_activation_and_flop_table():
    import jax
    import jax.numpy as jnp

    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.maskformer import maskformer_infer_rba, maskformer_init
    from rba_tpu.tools.analyze_model import activation_count, flop_table

    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    fn = lambda p, x: maskformer_infer_rba(p, cfg, x)
    table = flop_table(fn, params, img)
    assert table.get("dot_general", 0) > 0 and table.get("conv", 0) > 0
    assert activation_count(fn, params, img) > 0


def test_devtime_tool_smoke(tmp_path, capsys, monkeypatch):
    """The device-time probe runs end-to-end on CPU at a tiny config and
    prints one well-formed JSON line (the tool is a documented interface:
    README/MODEL_ZOO point users at it for perf measurement)."""
    import json

    import yaml

    from rba_tpu.tools import devtime

    d2yaml = {
        "MODEL": {
            "BACKBONE": {"NAME": "D2SwinTransformer"},
            "SWIN": {
                "EMBED_DIM": 32, "DEPTHS": [2, 2], "NUM_HEADS": [2, 4],
                "WINDOW_SIZE": 4, "OUT_FEATURES": ["res2", "res3"],
            },
            "SEM_SEG_HEAD": {
                "CONVS_DIM": 64, "MASK_DIM": 64, "NUM_CLASSES": 7,
                "DEFORMABLE_TRANSFORMER_ENCODER_IN_FEATURES": ["res3"],
                "IN_FEATURES": ["res2", "res3"], "TRANSFORMER_ENC_LAYERS": 2,
            },
            "MASK_FORMER": {
                "HIDDEN_DIM": 64, "NUM_OBJECT_QUERIES": 10, "NHEADS": 4,
                "DIM_FEEDFORWARD": 128, "DEC_LAYERS": 3,
            },
        }
    }
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(d2yaml, f)
    devtime.main(
        ["--config", str(cfg_path), "--hw", "32x64", "--iters", "2", "--reps", "2"]
    )
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["mode"] == "parity" and rec["device_ms_per_img"] > 0
    assert rec["hw"] == "32x64" and rec["backend"] == "cpu"
