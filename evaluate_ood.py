#!/usr/bin/env python
"""Drop-in equivalent of the reference's root-level evaluate_ood.py
(/root/reference/evaluate_ood.py): model-zoo OOD sweep over the standard
datasets.  Thin alias for ``python -m rba_tpu.evalx.sweep`` — same flags
(--models_folder, --datasets_folder, --model_mode, --dataset_mode,
--score_func, --store_anomaly_scores, ...).
"""
from rba_tpu.evalx.sweep import main

if __name__ == "__main__":
    main()
