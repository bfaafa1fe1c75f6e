"""Checkpoint IO: D2 ``.pth``/``.pkl`` readers + native serialization.

Replaces Detectron2's ``DetectionCheckpointer`` (SURVEY.md §5): load the
released RbA checkpoints (torch-zip ``.pth`` state dicts or D2 ``.pkl``
numpy dicts), convert to our pytree, and serialize natively (flat ``.npz``
for portability; orbax for sharded training state).
"""
from __future__ import annotations

import io
import os
import pickle
import zipfile
from typing import Any, Dict, Optional

import jax
import numpy as np


def read_d2_pickle(path: str) -> Dict[str, np.ndarray]:
    """D2 ``.pkl`` files are plain pickles: {"model": {name: ndarray}, ...}
    (the format written by /root/reference/tools/convert-pretrained-swin-
    model-to-d2.py)."""
    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    model = data.get("model", data)
    return {k: np.asarray(v) for k, v in model.items() if isinstance(v, np.ndarray)}


def read_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` zip checkpoint into numpy arrays.

    Uses torch when importable (always true in this image — torch-cpu is
    baked in); the converter is the only component that touches torch."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
        elif isinstance(v, np.ndarray):
            out[k] = v
    return out


def read_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pkl"):
        return read_d2_pickle(path)
    return read_torch_checkpoint(path)


# ---------------------------------------------------------------------------
# native flat-npz serialization of param pytrees
# ---------------------------------------------------------------------------

_SEP = "|"


def _flatten(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = _SEP.join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        cur = root
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    # convert {"0": .., "1": ..} dicts into lists
    def listify(node):
        if isinstance(node, dict):
            node = {k: listify(v) for k, v in node.items()}
            if node and all(k.isdigit() for k in node):
                return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def save_params(path: str, params) -> None:
    np.savez(path, **_flatten(params))


def load_params(path: str):
    with np.load(path, allow_pickle=False) as z:
        return _unflatten({k: z[k] for k in z.files})


def convert_d2_checkpoint(ckpt_path: str, cfg, out_path: Optional[str] = None):
    """D2 checkpoint file → rba_tpu param tree (optionally persisted)."""
    from .d2_mapping import convert_d2_state_dict

    sd = read_state_dict(ckpt_path)
    params = convert_d2_state_dict(sd, cfg)
    if out_path:
        save_params(out_path, params)
    return params


def load_checkpoint_params(model_dir: str, cfg):
    """Resolve weights for a model dir: native .npz preferred, else convert
    a D2 ``model_final.pth``/``.pkl`` on the fly (and cache the .npz)."""
    npz = os.path.join(model_dir, "params.npz")
    if os.path.exists(npz):
        return load_params(npz)
    for cand in ("model_final.pth", "model_final.pkl"):
        p = os.path.join(model_dir, cand)
        if os.path.exists(p):
            params = convert_d2_checkpoint(p, cfg)
            try:
                save_params(npz, params)
            except OSError:
                pass
            return params
    raise FileNotFoundError(f"no checkpoint (params.npz / model_final.pth) in {model_dir}")


# ---------------------------------------------------------------------------
# training-state checkpointing (save/resume) via orbax when available
# ---------------------------------------------------------------------------

def save_train_state(ckpt_dir: str, state, step: int) -> None:
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state)
        ckptr.wait_until_finished()
    except ImportError:
        os.makedirs(ckpt_dir, exist_ok=True)
        save_params(os.path.join(ckpt_dir, f"step_{step}.npz"), state.params)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        if d.startswith("step_"):
            steps.append(int(d[len("step_") :].split(".")[0]))
    return max(steps) if steps else None


def restore_train_state(ckpt_dir: str, template, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        return None
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
