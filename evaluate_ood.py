#!/usr/bin/env python
"""Drop-in equivalent of the reference's root-level evaluate_ood.py
(/root/reference/evaluate_ood.py): model-zoo OOD sweep over the standard
datasets.  Thin alias for ``python -m rba_tpu.evalx.sweep`` — same flags
(--models_folder, --datasets_folder, --model_mode, --dataset_mode,
--score_func, --store_anomaly_scores, ...).

``--selfcheck`` instead runs the turnkey parity pre-validation
(rba_tpu/tools/selfcheck.py): export golden torch weights to a real
D2-format model_final.pth, convert through the production pipeline, and
assert score-map parity <= 1e-3 — so evaluating real released checkpoints
the moment they are available is a single already-validated command.
"""
import sys

if __name__ == "__main__":
    if "--selfcheck" in sys.argv:
        sys.argv.remove("--selfcheck")
        from rba_tpu.tools.selfcheck import main as selfcheck_main

        selfcheck_main()
    else:
        from rba_tpu.evalx.sweep import main

        main()
