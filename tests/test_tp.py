"""Tensor-parallel (data × model mesh) sharding tests.

The reference has no model parallelism (DDP only, train_net.py:393-403);
parallel/tp.py is TPU-native new capability.  These tests prove on the
8-virtual-device CPU mesh that (a) the Megatron-style specs land on the
MLP weights and actually split the arrays, (b) a DP×TP train step
produces the same losses as the pure-DP step, and (c) TP inference
matches replicated inference.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rba_tpu.config import tiny_test_config
from rba_tpu.models.maskformer import maskformer_infer_rba, maskformer_init
from rba_tpu.parallel.mesh import make_mesh
from rba_tpu.parallel.tp import shard_params_tp, tp_shardings
from rba_tpu.train.train_step import make_train_state, make_train_step


def _batch(batch, h=32, w=64, t=4):
    r = np.random.RandomState(0)
    return {
        "images": jnp.asarray(r.rand(batch, h, w, 3) * 255, jnp.float32),
        "gt_labels": jnp.asarray(r.randint(0, 8, (batch, t)), jnp.int32),
        "gt_masks": jnp.asarray((r.rand(batch, t, h, w) > 0.5).astype(np.float32)),
        "gt_valid": jnp.asarray([[1, 1, 1, 0]] * batch, jnp.float32),
    }


def test_tp_specs_split_mlp_weights():
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(4, model_axis=2)  # (data=2, model=2)
    sh = tp_shardings(params, mesh)

    blk = sh["backbone"]["layers"][0]["blocks"][0]
    assert blk["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert blk["mlp"]["fc1"]["bias"].spec == P("model")
    assert blk["mlp"]["fc2"]["kernel"].spec == P("model", None)
    assert blk["mlp"]["fc2"]["bias"].spec == P()
    # packed qkv stays replicated (q/k/v group boundaries don't shard cleanly)
    assert blk["attn"]["qkv"]["kernel"].spec == P()
    enc = sh["sem_seg_head"]["pixel_decoder"]["transformer"]["encoder"]["layers"][0]
    assert enc["linear1"]["kernel"].spec == P(None, "model")
    assert enc["linear2"]["kernel"].spec == P("model", None)

    sharded = shard_params_tp(params, mesh)
    k = sharded["backbone"]["layers"][0]["blocks"][0]["mlp"]["fc1"]["kernel"]
    full = params["backbone"]["layers"][0]["blocks"][0]["mlp"]["fc1"]["kernel"]
    # each shard holds half the hidden dim
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(full.shape[0], full.shape[1] // 2)}


def test_tp_train_step_matches_dp():
    # same rng seed → identical drop-path/point-sampling draws in both runs
    # (jax threefry is sharding-independent), so losses differ only by fp
    # reduction/contraction order
    cfg = tiny_test_config()
    batch = _batch(4)

    mesh_dp = make_mesh(4)
    state_dp = make_train_state(jax.random.PRNGKey(0), cfg, mesh_dp)
    step_dp = make_train_step(cfg, mesh_dp)
    _, m_dp = step_dp(state_dp, batch)

    mesh_tp = make_mesh(4, model_axis=2)
    state_tp = make_train_state(jax.random.PRNGKey(0), cfg, mesh_tp, tp=True)
    # the MLP weights really are distributed
    k = state_tp.params["backbone"]["layers"][0]["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    # tp=True derives the same sharding tree as make_train_state(tp=True)
    step_tp = make_train_step(cfg, mesh_tp, tp=True)
    state_tp2, m_tp = step_tp(state_tp, batch)

    # same math, different contraction/reduction splits: fp32 tolerance
    for key in m_dp:
        np.testing.assert_allclose(
            float(m_tp[key]), float(m_dp[key]), rtol=2e-4, atol=1e-5, err_msg=key
        )
    # the updated state keeps the TP layout (no creeping resharding)
    k2 = state_tp2.params["backbone"]["layers"][0]["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert k2.sharding.spec == P(None, "model")


def test_make_mesh_rejects_indivisible_model_axis():
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        make_mesh(8, model_axis=3)


def test_tp_shardings_warns_when_nothing_sharded():
    # hidden dims not divisible by the model axis → full replication + warning
    import warnings

    mesh = make_mesh(8, model_axis=4)
    tree = {"mlp": {"fc1": {"kernel": jnp.zeros((6, 6)), "bias": jnp.zeros((6,))}}}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sh = tp_shardings(tree, mesh)
    assert any("no parameter matched" in str(x.message) for x in w)
    assert all(s.spec == P() for s in jax.tree.leaves(sh))


def test_tp_inference_matches_replicated():
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(np.random.RandomState(1).rand(1, 32, 64, 3) * 255, jnp.float32)
    ref = np.asarray(maskformer_infer_rba(params, cfg, img))

    mesh = make_mesh(8, model_axis=4)  # (data=2, model=4)
    sharded = shard_params_tp(params, mesh)
    fn = jax.jit(
        lambda p, x: maskformer_infer_rba(p, cfg, x),
        in_shardings=(tp_shardings(params, mesh), NamedSharding(mesh, P())),
        out_shardings=NamedSharding(mesh, P()),
    )
    out = np.asarray(fn(sharded, img))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
