"""rba-tpu: TPU-native anomaly ("rejected by all") segmentation framework.

Public API surface (see README.md):
    rba_tpu.config.load_d2_config          — ingest released D2 config.yaml
    rba_tpu.models.maskformer              — init / forward / infer / RbA score
    rba_tpu.convert.checkpoint             — D2 ↔ native checkpoint IO
    rba_tpu.evalx                          — metrics, evaluators, sweep CLI
    rba_tpu.train                          — criterion, matcher, train step, CLI
    rba_tpu.parallel                       — mesh + sharded evaluation
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
