import numpy as np

import jax

from rba_tpu.config import tiny_test_config
from rba_tpu.data.ood_datasets import SyntheticAnomaly
from rba_tpu.evalx.evaluator import OODEvaluator
from rba_tpu.models.maskformer import maskformer_init
from rba_tpu.parallel.mesh import make_mesh
from rba_tpu.parallel.sharded_eval import evaluate_dataset_sharded


def test_sharded_eval_matches_single_device():
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ds = SyntheticAnomaly(n=6, hw=(32, 64))

    mesh = make_mesh(4)
    sharded = evaluate_dataset_sharded(cfg, params, ds, mesh)

    single = OODEvaluator(cfg, params).evaluate_dataset(ds)
    for k in ("auroc", "aupr", "fpr95"):
        np.testing.assert_allclose(sharded[k], single[k], atol=2e-3, err_msg=k)


def test_sharded_eval_tail_padding():
    """Dataset size not divisible by the mesh: the padded duplicates carry
    all-ignore labels and must not change the metrics."""
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    ds5 = SyntheticAnomaly(n=5, hw=(32, 64))
    mesh = make_mesh(4)
    m5 = evaluate_dataset_sharded(cfg, params, ds5, mesh)
    single = OODEvaluator(cfg, params).evaluate_dataset(ds5)
    for k in ("auroc", "aupr", "fpr95"):
        np.testing.assert_allclose(m5[k], single[k], atol=2e-3, err_msg=k)
