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


def test_bhwq_layout_matches(rng):
    mask_cls = rng.randn(1, 100, 20).astype(np.float32)
    mask_pred = rng.randn(1, 100, 32, 128).astype(np.float32)
    want = np.asarray(
        fused_rba_score(jnp.asarray(mask_cls), jnp.asarray(mask_pred), interpret=True)
    )
    got = np.asarray(
        fused_rba_score(
            jnp.asarray(mask_cls), jnp.asarray(mask_pred.transpose(0, 2, 3, 1)),
            interpret=True, masks_layout="bhwq",
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_decoder_bhwq_final_layout(rng):
    """decoder_apply(final_mask_layout='bhwq') matches the bqhw path
    transposed, with identical class logits and aux outputs."""
    import jax

    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.transformer_decoder import decoder_apply, decoder_init

    cfg = tiny_test_config().decoder
    params = decoder_init(jax.random.PRNGKey(0), cfg, 7, 64)
    feats = [jnp.asarray(rng.randn(1, 8, 12, 64).astype(np.float32))]
    mf = jnp.asarray(rng.randn(1, 16, 24, 64).astype(np.float32))
    a = decoder_apply(params, cfg, feats, mf)
    b = decoder_apply(params, cfg, feats, mf, final_mask_layout="bhwq")
    np.testing.assert_allclose(np.asarray(a["pred_logits"]), np.asarray(b["pred_logits"]),
                               rtol=1e-5, atol=1e-6)
    # bqhw vs bhwq einsum contraction orders differ in fp32 rounding
    np.testing.assert_allclose(
        np.asarray(a["pred_masks"]), np.asarray(b["pred_masks"]).transpose(0, 3, 1, 2),
        rtol=1e-4, atol=1e-5,
    )
    assert len(a["aux_outputs"]) == len(b["aux_outputs"])
    np.testing.assert_allclose(
        np.asarray(a["aux_outputs"][0]["pred_masks"]),
        np.asarray(b["aux_outputs"][0]["pred_masks"]), rtol=1e-5, atol=1e-6,
    )
