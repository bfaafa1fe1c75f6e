import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rba_tpu.ops.resize import (
    resize_bicubic,
    resize_bicubic_nhwc,
    resize_bilinear,
    resize_bilinear_nhwc,
)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((32, 64), (128, 256)),  # 4x upsample (mask upsample path)
        ((100, 50), (25, 13)),  # downsample, non-divisible
        ((7, 9), (7, 9)),  # identity
        ((1, 5), (4, 10)),  # degenerate row
        ((64, 128), (96, 192)),  # 1.5x
        ((13, 17), (256, 512)),  # strong upsample
    ],
)
def test_resize_matches_torch(align_corners, in_hw, out_hw, rng):
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners
    ).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners))
    # separable (H then W) vs torch's per-pixel 2-D lerp: identical math,
    # different fp32 rounding order — compare with absolute tolerance.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_nhwc_matches_torch(rng):
    x = rng.randn(2, 17, 23, 5).astype(np.float32)
    want = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(34, 46), mode="bilinear",
            align_corners=False,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    got = np.asarray(resize_bilinear_nhwc(jnp.asarray(x), (34, 46)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((14, 14), (32, 64)),  # APE upsample (pretrain grid -> feature grid)
        ((23, 23), (7, 9)),  # downsample
        ((5, 5), (5, 5)),  # identity
        ((1, 6), (3, 12)),  # degenerate row
    ],
)
def test_bicubic_matches_torch(align_corners, in_hw, out_hw, rng):
    x = rng.randn(2, 3, *in_hw).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bicubic", align_corners=align_corners
    ).numpy()
    got = np.asarray(resize_bicubic(jnp.asarray(x), out_hw, align_corners=align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bicubic_nhwc_matches_torch(rng):
    x = rng.randn(1, 14, 14, 8).astype(np.float32)
    want = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(20, 36), mode="bicubic",
            align_corners=False,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    got = np.asarray(resize_bicubic_nhwc(jnp.asarray(x), (20, 36)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sine_pos_embed_matches_reference_formula(rng):
    from rba_tpu.models.position_encoding import sine_pos_embed
    from tests.torch_refs import torch_sine_pos_embed

    want = torch_sine_pos_embed(12, 20, num_pos_feats=64).numpy()[0]  # (C, H, W)
    got = np.asarray(sine_pos_embed(12, 20, 128)).transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
