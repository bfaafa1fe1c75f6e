"""Literal expected values for the trickiest cross-framework semantics —
hand-computed from the reference formulas, NOT re-derived through a second
implementation (addresses the shared-misreading risk of two-sided goldens).

Sources:
  * ResizeShortestEdge — detectron2 augmentation_impl.get_transform: pin the
    short side to `size`, rescale both if max side exceeds max_size, round
    with int(x + 0.5).
  * ColorAugSSDTransform — point_rend color_augmentation: cv2 HSV (H in
    [0,180)), integer hue delta mod 180, S-channel scaling.
  * MSDeformAttn sampling — ms_deform_im2col_cuda.cuh:275-300: sample at
    loc·(W,H) − 0.5 with zero padding outside.
"""
import random

import numpy as np

import jax.numpy as jnp


def test_resize_shortest_edge_literal_rounding():
    from rba_tpu.data.mappers import resize_shortest_edge

    img = np.zeros((1080, 1920, 3), np.uint8)
    seg = np.zeros((1080, 1920), np.uint8)
    out_img, out_seg = resize_shortest_edge(img, seg, 720, 4096)
    assert out_img.shape[:2] == (720, 1280)  # short side pinned, 1920·(2/3)

    # non-divisible: 501×1000 at 334 → long side 1000·(334/501)=666.67 → 667
    img = np.zeros((501, 1000, 3), np.uint8)
    seg = np.zeros((501, 1000), np.uint8)
    out_img, _ = resize_shortest_edge(img, seg, 334, 4096)
    assert out_img.shape[:2] == (334, 667)

    # max_size clamp: 512×4100 at 512/max 2048 → scale 2048/4100,
    # 512·0.49951…=255.75… → 256
    img = np.zeros((512, 4100, 3), np.uint8)
    seg = np.zeros((512, 4100), np.uint8)
    out_img, _ = resize_shortest_edge(img, seg, 512, 2048)
    assert out_img.shape[:2] == (256, 2048)


def test_cv2_hsv_conversion_literals():
    """Hand-computed cv2 HSV values (H = degrees/2, S,V in 0..255)."""
    from rba_tpu.data.mappers import _hsv_to_rgb_cv2, _rgb_to_hsv_cv2

    rgb = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255],
          [0, 0, 0], [128, 128, 0]]], np.uint8,
    )
    hsv = _rgb_to_hsv_cv2(rgb)
    # red: H 0, S 255, V 255; green: H 120°/2=60; blue: H 240°/2=120
    np.testing.assert_array_equal(hsv[0, 0], [0, 255, 255])
    np.testing.assert_array_equal(hsv[0, 1], [60, 255, 255])
    np.testing.assert_array_equal(hsv[0, 2], [120, 255, 255])
    np.testing.assert_array_equal(hsv[0, 3], [0, 0, 255])  # white: S 0
    np.testing.assert_array_equal(hsv[0, 4], [0, 0, 0])
    # olive 128,128,0: H 60°/2=30, S 255, V 128
    np.testing.assert_array_equal(hsv[0, 5], [30, 255, 128])

    # roundtrip on arbitrary colors is near-lossless (quantization ±2)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    back = _hsv_to_rgb_cv2(_rgb_to_hsv_cv2(x))
    assert np.abs(back.astype(int) - x.astype(int)).max() <= 3


def test_hue_shift_is_mod_180():
    """A +90 H-shift (180°) on pure red must land on cyan — only true on
    the cv2 0..180 hue wheel; a 0..255 wheel (PIL) would give a different
    color."""
    from rba_tpu.data.mappers import _hsv_to_rgb_cv2, _rgb_to_hsv_cv2

    red = np.full((2, 2, 3), [255, 0, 0], np.uint8)
    hsv = _rgb_to_hsv_cv2(red)
    hsv[..., 0] = (hsv[..., 0].astype(np.int32) + 90) % 180
    out = _hsv_to_rgb_cv2(hsv)
    np.testing.assert_array_equal(out[0, 0], [0, 255, 255])  # cyan


def test_deform_sampling_minus_half_offset_literal():
    """CUDA kernel semantics (ms_deform_im2col_cuda.cuh:275-300): pixel
    coords = loc·(W,H) − 0.5, bilinear, zero padding outside.  On a 2×2
    value map with values [[1,2],[3,4]]:
      loc (0.5, 0.5) → coords (0.5, 0.5) → mean of all four = 2.5
      loc (0.25, 0.25) → coords (0, 0) → exactly value 1
      loc (0, 0) → coords (−0.5, −0.5) → only v[0,0] with weight 0.25
      loc (1, 0.25) → coords (1.5, 0) → half in-bounds: 0.5·v[0,1] = 1
    """
    from rba_tpu.ops.deform_sampling import ms_deform_attn_core

    value = jnp.asarray([1.0, 2.0, 3.0, 4.0]).reshape(1, 4, 1, 1)  # (B, H*W, M, D)
    shapes = [(2, 2)]
    locs = np.array(
        [[0.5, 0.5], [0.25, 0.25], [0.0, 0.0], [1.0, 0.25]], np.float32
    ).reshape(1, 4, 1, 1, 1, 2)  # (B, Lq, M, L, P, 2) — (x, y)
    weights = np.ones((1, 4, 1, 1, 1), np.float32)
    out = ms_deform_attn_core(
        value, shapes, jnp.asarray(locs), jnp.asarray(weights)
    )  # (B, Lq, M*D)
    got = np.asarray(out).reshape(4)
    np.testing.assert_allclose(got, [2.5, 1.0, 0.25, 1.0], atol=1e-6)
