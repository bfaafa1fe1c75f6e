"""Suite smoke for the numerics-ablation tool (rba_tpu/tools/ablation.py):
tiny arch, CPU, one mode — exercises the export→convert→score→metrics loop
and the delta bookkeeping end-to-end (VERDICT r2 task 4 tooling)."""
import tempfile


def test_ablation_tiny_parity_mode():
    from rba_tpu.tools import ablation

    with tempfile.TemporaryDirectory() as d:
        out = ablation.main(
            ["--tiny", "--cpu", "--images", "2", "--hw", "64x96",
             "--modes", "fp32", "--workdir", d]
        )
    assert out["arch"] == "tiny"
    res = out["results"]
    assert "reference_torch_fp32" in res and "fp32" in res
    fp32 = res["fp32"]
    # exact and streaming metric paths both reported, with deltas vs torch
    for key in ("exact", "streaming", "delta_vs_torch_pts"):
        assert set(fp32[key]) == set(res["reference_torch_fp32"]), key
    # fp32 mode on CPU is parity arithmetic end-to-end: score maps must agree
    # with the torch reference to float tolerance, metrics to ~0
    assert fp32["score_map_max_abs_delta"] < 1e-3
    for k, v in fp32["delta_vs_torch_pts"].items():
        assert abs(v) < 0.1, (k, v)
