import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rba_tpu.ops.pallas.fused_rba import fused_rba_score, fused_rba_score_reference


def _torch_rba(mask_cls, mask_pred):
    up = F.interpolate(
        torch.from_numpy(mask_pred), scale_factor=4, mode="bilinear", align_corners=False
    )
    probs = torch.softmax(torch.from_numpy(mask_cls), dim=-1)[..., :-1]
    sem = torch.einsum("bqc,bqhw->bchw", probs, up.sigmoid())
    return (-sem.tanh().sum(1)).numpy()


def test_reference_matches_torch(rng):
    mask_cls = rng.randn(2, 10, 8).astype(np.float32)
    mask_pred = rng.randn(2, 10, 16, 32).astype(np.float32)
    want = _torch_rba(mask_cls, mask_pred)
    got = np.asarray(fused_rba_score_reference(jnp.asarray(mask_cls), jnp.asarray(mask_pred)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("hw", [(32, 128), (64, 256), (40, 130)])
def test_pallas_kernel_matches_reference(rng, hw):
    """Interpret-mode kernel vs the jnp reference (and thus vs torch),
    including non-tile-divisible shapes."""
    h, w = hw
    mask_cls = rng.randn(1, 100, 20).astype(np.float32)
    mask_pred = (rng.randn(1, 100, h, w) * 2).astype(np.float32)
    want = np.asarray(
        fused_rba_score_reference(jnp.asarray(mask_cls), jnp.asarray(mask_pred))
    )
    got = np.asarray(
        fused_rba_score(jnp.asarray(mask_cls), jnp.asarray(mask_pred), interpret=True)
    )
    assert got.shape == (1, 4 * h, 4 * w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_batch(rng):
    mask_cls = rng.randn(2, 100, 20).astype(np.float32)
    mask_pred = rng.randn(2, 100, 32, 128).astype(np.float32)
    want = np.asarray(
        fused_rba_score_reference(jnp.asarray(mask_cls), jnp.asarray(mask_pred))
    )
    got = np.asarray(
        fused_rba_score(jnp.asarray(mask_cls), jnp.asarray(mask_pred), interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
