"""Worker process for tests/test_multiprocess.py — NOT a test module.

Joins a 2-process × 4-device CPU jax.distributed cluster (the TPU-native
stand-in for the reference's D2 ``launch``/``comm`` multi-process bootstrap,
train_net.py:393-403), then drives the real multi-host paths:

  1. two DP train steps over the GLOBAL (8, 1) mesh with per-process input
     sharding (jax.make_array_from_process_local_data — each host feeds only
     its local batch rows, as a real multi-host input pipeline would),
  2. an orbax save + restore of the sharded train state (multi-host
     checkpoint coordination),
  3. one sharded-eval histogram reduction (replicated psum output).

Prints ONE JSON line the parent test compares across processes and against
its own single-process 8-device run.

Usage: python mp_worker.py <pid> <nprocs> <port> <workdir>
"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nprocs, port, workdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nprocs, process_id=pid
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rba_tpu.config import tiny_test_config  # noqa: E402
from rba_tpu.convert.checkpoint import (  # noqa: E402
    restore_train_state,
    save_train_state,
)
from rba_tpu.parallel.mesh import make_mesh  # noqa: E402
from rba_tpu.train.train_step import make_train_state, make_train_step  # noqa: E402
from tests.mp_common import global_batch  # noqa: E402


def main():
    assert len(jax.devices()) == 4 * nprocs, jax.devices()
    assert len(jax.local_devices()) == 4

    cfg = tiny_test_config()
    mesh = make_mesh()  # all 8 GLOBAL devices
    state = make_train_state(jax.random.PRNGKey(0), cfg, mesh)
    step = make_train_step(cfg, mesh)

    data_sh = NamedSharding(mesh, P("data"))
    losses = []
    for i in range(2):
        full = global_batch(cfg, seed=i, b=8)
        rows = slice(pid * 4, (pid + 1) * 4)
        batch = {
            k: jax.make_array_from_process_local_data(data_sh, v[rows], v.shape)
            for k, v in full.items()
        }
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))

    # multi-host orbax checkpoint round-trip
    ckpt_dir = os.path.join(workdir, "ckpts")
    save_train_state(ckpt_dir, state, int(state.step))
    restored = restore_train_state(ckpt_dir, state)
    assert int(np.asarray(restored.step)) == 2
    leaf = jax.tree.leaves(state.params)[0]
    rleaf = jax.tree.leaves(restored.params)[0]
    ckpt_leaf_equal = bool(jnp.array_equal(leaf, rleaf))

    # sharded-eval histogram reduction (replicated output, host fetch)
    from rba_tpu.parallel.sharded_eval import make_sharded_rba_hist_fn

    hist_fn = make_sharded_rba_hist_fn(cfg, mesh, bins=4096)
    full = global_batch(cfg, seed=7, b=8)
    imgs = jax.make_array_from_process_local_data(
        data_sh, full["images"][pid * 4 : (pid + 1) * 4], full["images"].shape
    )
    labels_np = (full["gt_masks"][:, 0] > 0.5).astype(np.int32)
    labels = jax.make_array_from_process_local_data(
        data_sh, labels_np[pid * 4 : (pid + 1) * 4], labels_np.shape
    )
    pos, neg = hist_fn(state.params, imgs, labels)
    print(json.dumps({
        "pid": pid,
        "losses": losses,
        "ckpt_leaf_equal": ckpt_leaf_equal,
        "pos_sum": int(np.asarray(pos).sum()),
        "neg_sum": int(np.asarray(neg).sum()),
        "pos_head": np.asarray(pos, np.int64)[:8].tolist(),
    }), flush=True)


if __name__ == "__main__":
    main()
