"""SetCriterion cross-validation against HF transformers' Mask2FormerLoss.

tests/test_criterion_golden.py pins each loss against torch math the test
itself writes; this file instead compares the full training criterion —
Hungarian matching + weighted CE + point-sampled mask/dice + deep
supervision + num_masks normalization — against the independently written
`transformers.models.mask2former.modeling_mask2former.Mask2FormerLoss`
oracle (which itself mirrors the reference criterion,
/root/reference/mask2former/modeling/criterion.py:104-266 and
matcher.py:96-156).

Randomness alignment: both sides' point samplers draw uniform coords
(the matcher's shared per-image set, then the oversample + random-fill
pair in `sample_points_using_uncertainty` / `uncertain_point_coords`).
The test patches `torch.rand` and `jax.random.uniform` with queue-backed
fakes fed from the SAME per-(layer, image, target) base streams:

* matcher coords are per (layer, image) — HF draws (1, P, 2) inside a
  per-image python loop, we draw one (B, P, 2) batch; same arrays.
* per-mask sampling streams are keyed by (layer, image, TARGET index):
  HF flattens matched masks in (image, ascending matched query) order,
  we keep the padded (B, T) layout — the matcher assignment (computed
  first, deterministically) maps one ordering onto the other.  Invalid
  padded slots on our side get constant coords; their losses are masked.

With identical inputs the uncertainty top-k then selects identical points
on both sides (fp32 sampling noise ~1e-7 vs uncertainty gaps ~1e-3 at
these point counts), so every loss must agree to fp tolerance — including
the exact num_masks, eos-weighted CE mean, and per-aux-layer values.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from rba_tpu.config import LossConfig, tiny_test_config  # noqa: E402
from rba_tpu.train.criterion import criterion  # noqa: E402
from rba_tpu.train.matcher import hungarian_match  # noqa: E402


class _QueueRand:
    """Shape-checked queue of preplanned 'random' arrays."""

    def __init__(self, arrays):
        self.q = list(arrays)

    def pop(self, shape):
        arr = self.q.pop(0)
        assert tuple(shape) == arr.shape, (tuple(shape), arr.shape)
        return arr

    def torch_rand(self, *size, device=None, dtype=None, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        return torch.from_numpy(self.pop(size).astype(np.float32))

    def jax_uniform(self, key, shape=(), dtype=float, minval=0.0, maxval=1.0):
        return jnp.asarray(self.pop(shape), jnp.float32)


def _hf_loss_module(k, num_points):
    from transformers import Mask2FormerConfig
    from transformers.models.mask2former.modeling_mask2former import (
        Mask2FormerLoss,
    )

    hf_cfg = Mask2FormerConfig(
        num_labels=k,
        train_num_points=num_points,
        oversample_ratio=3.0,
        importance_sample_ratio=0.75,
        class_weight=2.0,
        mask_weight=5.0,
        dice_weight=5.0,
        no_object_weight=0.1,
    )
    return Mask2FormerLoss(hf_cfg, weight_dict={})


def test_uncertainty_sampler_matches_hf(monkeypatch):
    """Unit crossval of the oversample→top-k-uncertainty→fill logic."""
    n, h, w, p = 4, 16, 24, 16
    n_over, n_unc, n_fill = 3 * p, 12, 4
    rs = np.random.RandomState(0)
    logits = rs.randn(n, 1, h, w).astype(np.float32) * 2

    over = rs.rand(n, n_over, 2)
    fill = rs.rand(n, n_fill, 2)

    loss_mod = _hf_loss_module(7, p)
    monkeypatch.setattr(torch, "rand", _QueueRand([over, fill]).torch_rand)
    want = loss_mod.sample_points_using_uncertainty(
        torch.from_numpy(logits),
        lambda lg: -torch.abs(lg),
        p,
        3.0,
        0.75,
    ).numpy()

    from rba_tpu.ops import point_sample as ps_mod

    monkeypatch.setattr(
        ps_mod.jax.random, "uniform", _QueueRand([over, fill]).jax_uniform
    )
    got = np.asarray(
        ps_mod.uncertain_point_coords(
            jax.random.PRNGKey(0), jnp.asarray(logits), p, 3.0, 0.75
        )
    )
    assert (n_unc + n_fill) == p
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_criterion_matches_hf_mask2former_loss(monkeypatch):
    b, q, k, t = 2, 10, 7, 5
    h, w = 16, 24  # pred mask resolution
    gh, gw = 64, 96  # gt resolution
    p = 32  # train_num_points
    n_over, n_fill = 3 * p, p - int(0.75 * p)
    n_aux = 2
    n_layers = 1 + n_aux
    n_tgts = [3, 5]

    rs = np.random.RandomState(1)
    layers = [
        {
            "pred_logits": rs.randn(b, q, k + 1).astype(np.float32),
            "pred_masks": (rs.randn(b, q, h, w) * 2).astype(np.float32),
        }
        for _ in range(n_layers)
    ]
    gt_labels = rs.randint(0, k, (b, t)).astype(np.int32)
    gt_masks = (rs.rand(b, t, gh, gw) > 0.7).astype(np.float32)
    gt_valid = np.zeros((b, t), np.float32)
    for i, n_i in enumerate(n_tgts):
        gt_valid[i, :n_i] = 1.0
        gt_masks[i, n_i:] = 0.0

    # ---- base streams, keyed by (layer, image[, target]) ----
    match_coords = rs.rand(n_layers, b, p, 2)
    over = rs.rand(n_layers, b, t, n_over, 2)
    fill = rs.rand(n_layers, b, t, n_fill, 2)

    loss_mod = _hf_loss_module(k, p)
    mask_labels = [torch.from_numpy(gt_masks[i, : n_tgts[i]]) for i in range(b)]
    class_labels = [
        torch.from_numpy(gt_labels[i, : n_tgts[i]].astype(np.int64)) for i in range(b)
    ]

    # ---- pass 1: per-layer HF matcher assignments (deterministic) ----
    indices = []
    for li in range(n_layers):
        qr = _QueueRand([match_coords[li, i, None] for i in range(b)])
        monkeypatch.setattr(torch, "rand", qr.torch_rand)
        indices.append(
            loss_mod.matcher(
                torch.from_numpy(layers[li]["pred_masks"]),
                torch.from_numpy(layers[li]["pred_logits"]),
                mask_labels,
                class_labels,
            )
        )

    # ---- pass 2: full HF loss with the aligned stream queue ----
    hf_queue = []
    for li in range(n_layers):
        for i in range(b):
            hf_queue.append(match_coords[li, i, None])
        n_pairs = sum(len(src) for src, _ in indices[li])
        for blocks, width in ((over, n_over), (fill, n_fill)):
            stacked = np.zeros((n_pairs, width, 2))
            row = 0
            for i, (src, tgt) in enumerate(indices[li]):
                for j in tgt.numpy():  # HF order: ascending matched query
                    stacked[row] = blocks[li, i, j]
                    row += 1
            hf_queue.append(stacked)
    monkeypatch.setattr(torch, "rand", _QueueRand(hf_queue).torch_rand)
    hf_losses = loss_mod(
        torch.from_numpy(layers[0]["pred_masks"]),
        torch.from_numpy(layers[0]["pred_logits"]),
        mask_labels,
        class_labels,
        auxiliary_predictions=[
            {
                "masks_queries_logits": torch.from_numpy(layers[1 + i]["pred_masks"]),
                "class_queries_logits": torch.from_numpy(layers[1 + i]["pred_logits"]),
            }
            for i in range(n_aux)
        ],
    )
    hf_losses = {kk: float(v) for kk, v in hf_losses.items()}

    # ---- our criterion with the same streams in the (B, T) layout ----
    jax_queue = []
    for li in range(n_layers):
        jax_queue.append(match_coords[li])
        for blocks, width in ((over, n_over), (fill, n_fill)):
            arr = np.full((b * t, width, 2), 0.5)
            for i in range(b):
                for j in range(n_tgts[i]):
                    arr[i * t + j] = blocks[li, i, j]
            jax_queue.append(arr)
    qr = _QueueRand(jax_queue)
    from rba_tpu.ops import point_sample as ps_mod
    from rba_tpu.train import matcher as matcher_mod

    monkeypatch.setattr(ps_mod.jax.random, "uniform", qr.jax_uniform)

    cfg = dataclasses.replace(
        tiny_test_config(),
        num_classes=k,
        loss=LossConfig(train_num_points=p, deep_supervision=True),
    )
    outputs = {
        "pred_logits": jnp.asarray(layers[0]["pred_logits"]),
        "pred_masks": jnp.asarray(layers[0]["pred_masks"]),
        "aux_outputs": [
            {
                "pred_logits": jnp.asarray(layers[1 + i]["pred_logits"]),
                "pred_masks": jnp.asarray(layers[1 + i]["pred_masks"]),
            }
            for i in range(n_aux)
        ],
    }
    targets = {
        "gt_labels": jnp.asarray(gt_labels),
        "gt_masks": jnp.asarray(gt_masks),
        "gt_valid": jnp.asarray(gt_valid),
    }
    got = {
        kk: float(v)
        for kk, v in criterion(cfg, jax.random.PRNGKey(0), outputs, targets).items()
    }
    assert not qr.q  # every preplanned draw was consumed

    # ---- matcher assignment equality (main layer) ----
    monkeypatch.setattr(
        ps_mod.jax.random, "uniform", _QueueRand([match_coords[0]]).jax_uniform
    )
    a = np.asarray(
        hungarian_match(
            jax.random.PRNGKey(0),
            cfg.loss,
            jnp.asarray(layers[0]["pred_logits"]),
            jnp.asarray(layers[0]["pred_masks"]),
            jnp.asarray(gt_labels),
            jnp.asarray(gt_masks),
            jnp.asarray(gt_valid),
        )
    )
    for i, (src, tgt) in enumerate(indices[0]):
        for qq, jj in zip(src.numpy(), tgt.numpy()):
            assert a[i, jj] == qq, (i, jj, qq, a[i, jj])

    # ---- loss values: ours are pre-weighted, HF's raw ----
    pairs = [
        ("loss_ce", "loss_cross_entropy", cfg.loss.class_weight),
        ("loss_mask", "loss_mask", cfg.loss.mask_weight),
        ("loss_dice", "loss_dice", cfg.loss.dice_weight),
    ]
    for li in range(n_layers):
        sfx_ours = "" if li == 0 else f"_{li - 1}"
        sfx_hf = "" if li == 0 else f"_{li - 1}"
        for ours, hf, weight in pairs:
            np.testing.assert_allclose(
                got[f"{ours}{sfx_ours}"] / weight,
                hf_losses[f"{hf}{sfx_hf}"],
                rtol=2e-5,
                err_msg=f"{ours}{sfx_ours} (layer {li})",
            )
    assert matcher_mod is not None
