import json
import os

import numpy as np

import jax

from rba_tpu.config import tiny_test_config
from rba_tpu.data.ood_datasets import SyntheticAnomaly
from rba_tpu.evalx.evaluator import OODEvaluator, miou
from rba_tpu.models.maskformer import maskformer_init


def test_evaluator_end_to_end():
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ds = SyntheticAnomaly(n=3, hw=(64, 96))
    ev = OODEvaluator(cfg, params, score="rba")

    scores, gts = ev.compute_anomaly_scores(ds)
    assert scores.shape == (3, 64, 96)
    assert gts.shape == (3, 64, 96)

    exact = ev.evaluate_ood(scores, gts)
    stream = ev.evaluate_dataset(ds)
    for k in ("auroc", "aupr", "fpr95"):
        assert 0.0 <= exact[k] <= 1.0
        np.testing.assert_allclose(stream[k], exact[k], atol=5e-3, err_msg=k)


def test_evaluator_upper_limit_and_bootstrap():
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ds = SyntheticAnomaly(n=4, hw=(32, 32))
    ev = OODEvaluator(cfg, params)
    scores, _ = ev.compute_anomaly_scores(ds, upper_limit=2)
    assert scores.shape[0] == 2
    means, stds = ev.evaluate_ood_bootstrapped(ds, ratio=0.5, trials=3)
    assert set(means) == {"auroc", "aupr", "fpr95"}
    assert all(np.isfinite(v) for v in means.values())


def test_energy_score_function():
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ds = SyntheticAnomaly(n=1, hw=(32, 32))
    ev = OODEvaluator(cfg, params, score="pebal")
    scores, _ = ev.compute_anomaly_scores(ds)
    assert np.isfinite(scores).all()


def test_miou():
    gt = np.array([[0, 0, 1, 1, 255]])
    pred = np.array([[0, 1, 1, 1, 0]])
    # class0: inter 1, union 2 -> 0.5; class1: inter 2, union 3 -> 2/3
    np.testing.assert_allclose(miou(pred, gt, num_classes=2), (0.5 + 2 / 3) / 2)


def test_sweep_cli_on_synthetic(tmp_path, monkeypatch):
    """Drive the sweep CLI end-to-end with a fabricated model dir and a
    monkeypatched dataset registry."""
    import yaml

    from rba_tpu.convert.checkpoint import save_params
    from rba_tpu.evalx import sweep

    cfg = tiny_test_config()
    model_dir = tmp_path / "models" / "tiny"
    model_dir.mkdir(parents=True)
    # minimal D2-style yaml the config loader can ingest
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
    with open(model_dir / "config.yaml", "w") as f:
        yaml.safe_dump(d2yaml, f)
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    save_params(str(model_dir / "params.npz"), params)

    monkeypatch.setattr(
        sweep, "load_model", lambda d, precision="fast": (cfg, params)
    )
    import rba_tpu.data.ood_datasets as od

    monkeypatch.setattr(od, "SyntheticAnomaly", lambda: SyntheticAnomaly(n=2, hw=(32, 32)))
    out = str(tmp_path / "results")
    # reference-style selected mode exercises the first-class synthetic
    # injection (no dataset folder needed) + --selected_datasets parsing
    sweep.main(
        [
            "--models_folder", str(tmp_path / "models"),
            "--datasets_folder", str(tmp_path / "nodata"),
            "--dataset_mode", "selected",
            "--selected_datasets", "synthetic",
            "--out_path", out,
        ]
    )
    with open(os.path.join(out, "tiny", "results.json")) as f:
        res = json.load(f)
    assert "synthetic" in res and "aupr" in res["synthetic"]

    # save_results merges into the existing per-model dict (concurrent
    # shards of one model must not clobber each other's datasets) ...
    sweep.save_results(out, "tiny", {"other_ds": {"aupr": 1.0}}, False)
    merged = sweep.load_results(out, "tiny")
    assert set(merged) == {"synthetic", "other_ds"}
    # ... and a re-run skips per finished (model, dataset) pair without
    # touching the stored metrics
    sweep.main(
        [
            "--models_folder", str(tmp_path / "models"),
            "--datasets_folder", str(tmp_path / "nodata"),
            "--dataset_mode", "selected",
            "--selected_datasets", "synthetic",
            "--out_path", out,
        ]
    )
    assert sweep.load_results(out, "tiny") == merged


def test_support_surface(rng):
    """support.py helper parity: score-fn variants, logistic, colormap,
    proc_img, resize_mask (reference support.py:27-226)."""
    import jax
    import jax.numpy as jnp

    from rba_tpu.config import tiny_test_config
    from rba_tpu.evalx.support import (
        get_logits,
        get_logits_plus,
        get_neg_logit_sum,
        get_RbA,
        get_seg_colormap,
        logistic,
        proc_img,
        resize_mask,
    )
    from rba_tpu.models.maskformer import maskformer_init

    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    img = rng.rand(1, 32, 32, 3).astype(np.float32) * 255

    logits = get_logits(params, cfg, img)
    assert logits.shape == (1, cfg.num_classes, 32, 32)
    l2, aux = get_logits_plus(params, cfg, img, return_aux=True)
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(logits))
    assert "rba" in aux
    np.testing.assert_allclose(
        np.asarray(get_RbA(params, cfg, img)),
        -np.tanh(np.asarray(logits)).sum(1), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(get_neg_logit_sum(params, cfg, img)),
        -np.asarray(logits).sum(1), rtol=1e-6)

    np.testing.assert_allclose(float(logistic(0.0)), 0.5)
    assert proc_img(rng.rand(3, 8, 9)).shape == (8, 9, 3)
    cm = get_seg_colormap(np.array([[0, 1], [1, 0]]), [(255, 0, 0), (0, 255, 0)])
    np.testing.assert_array_equal(cm[0, 0], [255, 0, 0])
    assert resize_mask(rng.rand(1, 1, 8, 8).astype(np.float32), (16, 16)).shape == (1, 1, 16, 16)


def test_evaluate_dataset_cohort_matches_per_image():
    """The fused cohort path (one packed upload + one scan dispatch per k
    images, padded last cohort with ignored labels) must produce exactly
    the per-image streaming metrics — including a non-divisible dataset
    length (5 images, cohort 2 → one padded cohort)."""
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ds = SyntheticAnomaly(n=5, hw=(64, 96))
    ev = OODEvaluator(cfg, params, score="rba")

    per_image = ev.evaluate_dataset(ds)
    cohort = ev.evaluate_dataset(ds, cohort=2)
    for k in per_image:
        np.testing.assert_allclose(cohort[k], per_image[k], atol=1e-9, err_msg=k)

    # upper_limit respected in cohort mode too
    lim_pi = ev.evaluate_dataset(ds, upper_limit=3)
    lim_co = ev.evaluate_dataset(ds, upper_limit=3, cohort=2)
    for k in lim_pi:
        np.testing.assert_allclose(lim_co[k], lim_pi[k], atol=1e-9, err_msg=k)


def test_fused_models_sweep_matches_per_model(tmp_path, monkeypatch):
    """--fuse_models (one upload scored by every model) must produce the
    same per-model metrics as the plain model-outer sweep."""
    import yaml

    from rba_tpu.convert.checkpoint import save_params
    from rba_tpu.evalx import sweep
    from rba_tpu.evalx.evaluator import evaluate_dataset_multi

    cfg = tiny_test_config()
    params_by_name = {}
    for i, name in enumerate(("m_a", "m_b")):
        model_dir = tmp_path / "models" / name
        model_dir.mkdir(parents=True)
        with open(model_dir / "config.yaml", "w") as f:
            yaml.safe_dump({"MODEL": {"BACKBONE": {"NAME": "D2SwinTransformer"}}}, f)
        params = maskformer_init(jax.random.PRNGKey(i), cfg)
        save_params(str(model_dir / "params.npz"), params)
        params_by_name[name] = params

    def fake_load(d, precision="fast"):
        return cfg, params_by_name[os.path.basename(d.rstrip("/"))]

    monkeypatch.setattr(sweep, "load_model", fake_load)
    import rba_tpu.data.ood_datasets as od

    monkeypatch.setattr(od, "SyntheticAnomaly", lambda: SyntheticAnomaly(n=3, hw=(32, 48)))

    out_fused = str(tmp_path / "fused")
    sweep.main([
        "--models_folder", str(tmp_path / "models"),
        "--datasets_folder", str(tmp_path / "nodata"),
        "--dataset_mode", "selected", "--selected_datasets", "synthetic",
        "--out_path", out_fused, "--fuse_models",
    ])
    out_plain = str(tmp_path / "plain")
    sweep.main([
        "--models_folder", str(tmp_path / "models"),
        "--datasets_folder", str(tmp_path / "nodata"),
        "--dataset_mode", "selected", "--selected_datasets", "synthetic",
        "--out_path", out_plain,
    ])
    for name in ("m_a", "m_b"):
        rf = sweep.load_results(out_fused, name)["synthetic"]
        rp = sweep.load_results(out_plain, name)["synthetic"]
        for k in rp:
            assert abs(rf[k] - rp[k]) < 1e-6, (name, k, rf, rp)

    # direct API: saturation fallback path stays exact-equal per model
    evs = {
        n: OODEvaluator(cfg, p) for n, p in params_by_name.items()
    }
    res = evaluate_dataset_multi(evs, SyntheticAnomaly(n=2, hw=(32, 48)))
    assert set(res) == {"m_a", "m_b"}
    for m in res.values():
        assert all(np.isfinite(v) for v in m.values())
