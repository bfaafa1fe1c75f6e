import numpy as np

import jax

from rba_tpu.config import tiny_test_config
from rba_tpu.data.taxonomies import mapillary_to_cityscapes_lut
from rba_tpu.models.maskformer import maskformer_init
from rba_tpu.models.sliding_window import sliding_window_rba, sliding_window_sem_seg


def test_sliding_window_covers_and_blends(rng):
    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(0), cfg)
    img = (rng.rand(96, 160, 3) * 255).astype(np.uint8)
    sem = sliding_window_sem_seg(params, cfg, img, tile_hw=(64, 64), overlap=16)
    assert sem.shape == (cfg.num_classes, 96, 160)
    s = np.asarray(sem)
    assert np.isfinite(s).all()
    assert s.min() >= 0.0  # blended probabilities stay nonnegative

    rba = sliding_window_rba(params, cfg, img, tile_hw=(64, 64), overlap=16)
    assert rba.shape == (96, 160)


def test_sliding_window_single_tile_matches_direct(rng):
    """When one tile covers the image the result equals direct inference."""
    from rba_tpu.models.maskformer import maskformer_infer

    cfg = tiny_test_config()
    params = maskformer_init(jax.random.PRNGKey(1), cfg)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    sem_tiled = np.asarray(sliding_window_sem_seg(params, cfg, img, tile_hw=(64, 64)))
    import jax.numpy as jnp

    sem_direct = np.asarray(
        maskformer_infer(params, cfg, jnp.asarray(img[None], jnp.float32))["sem_seg"][0]
    )
    np.testing.assert_allclose(sem_tiled, sem_direct, rtol=1e-4, atol=1e-5)


def test_mapillary_lut():
    lut = mapillary_to_cityscapes_lut()
    assert lut.shape == (256,)
    assert lut[13] == 0  # road-ish class maps to road (trainId 0)
    assert lut[65] == 255  # Mapillary ignore id
    assert lut[200] == 255
    assert set(np.unique(lut)) <= set(range(19)) | {255}
