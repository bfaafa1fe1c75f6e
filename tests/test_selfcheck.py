"""Suite smoke for the turnkey parity selfcheck (rba_tpu/tools/selfcheck.py):
export a real D2-format model_final.pth, load it back through the production
config-ingestion + conversion + scoring pipeline, and assert per-pixel RbA
score parity with the source torch model (VERDICT r2 task 6)."""
import tempfile


def test_selfcheck_tiny_pipeline():
    from rba_tpu.tools.selfcheck import run_selfcheck

    with tempfile.TemporaryDirectory() as d:
        result = run_selfcheck(d, "tiny", n_images=2, hw=(64, 96), tol=1e-3)
    assert result["pass"], result
    assert result["max_score_delta"] <= 1e-3
    for k, v in result["metric_deltas"].items():
        assert v < 1e-3, (k, v)


def test_selfcheck_swin_l_full_arch():
    """The released Swin-L architecture (embed 192, depths 2/2/18/2, heads
    6/12/24/48, window 12) through the full export→ingest→convert→score
    parity pipeline at reduced input — the VERDICT r3 gap was that only
    swin_b_1dl had selfcheck coverage (reference ckpts/swin_l_1dl)."""
    from rba_tpu.tools.selfcheck import run_selfcheck

    with tempfile.TemporaryDirectory() as d:
        result = run_selfcheck(d, "swin_l_1dl", n_images=1, hw=(64, 128), tol=1e-3)
    assert result["pass"], result


def test_selfcheck_metrics_mode_runs_sweep_cli_end_to_end():
    """--metrics (VERDICT r4 item 8): the FULL sweep CLI over synthetic
    RoadAnomaly/Fishyscapes-LAF/SMIYC dataset trees with the exported
    real-format .pth must produce a results.pkl with finite metrics for all
    three suites — the literal command path of the eventual real run."""
    from rba_tpu.tools.selfcheck import run_metrics_check

    with tempfile.TemporaryDirectory() as d:
        result = run_metrics_check(d, "tiny", n_images=2, hw=(96, 128))
    assert result["pass"], result
    assert set(result["rows"]) == {"road_anomaly", "fishyscapes_laf",
                                   "road_anomaly_21"}
    for row in result["rows"].values():
        assert set(row) == {"auroc", "aupr", "fpr95"}
