import numpy as np
import torch

import jax.numpy as jnp

from rba_tpu.models.swin import (
    _patch_merging,
    _window_attention,
    shifted_window_mask,
    swin_block_apply,
)


def t2j_linear(mod):
    p = {"kernel": jnp.asarray(mod.weight.detach().numpy().T)}
    if mod.bias is not None:
        p["bias"] = jnp.asarray(mod.bias.detach().numpy())
    return p


def t2j_ln(mod):
    return {
        "scale": jnp.asarray(mod.weight.detach().numpy()),
        "bias": jnp.asarray(mod.bias.detach().numpy()),
    }


def _attn_params(tattn):
    return {
        "relative_position_bias_table": jnp.asarray(
            tattn.relative_position_bias_table.detach().numpy()
        ),
        "qkv": t2j_linear(tattn.qkv),
        "proj": t2j_linear(tattn.proj),
    }


def test_window_attention_parity(rng):
    from tests.torch_refs import TorchWindowAttention

    dim, ws, nh = 32, 4, 4
    tattn = TorchWindowAttention(dim, ws, nh)
    with torch.no_grad():
        tattn.relative_position_bias_table.normal_(0, 0.5)
    n_windows, n = 6, ws * ws
    x = rng.randn(n_windows, n, dim).astype(np.float32)
    want = tattn(torch.from_numpy(x)).detach().numpy()

    # our layout: (B, nHw, nWw, N, C); use B=1 grid 2x3 => 6 windows
    xj = jnp.asarray(x).reshape(1, 2, 3, n, dim)
    got = _window_attention(_attn_params(tattn), xj, nh, ws, None, None)
    got = np.asarray(got).reshape(n_windows, n, dim)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_attention_parity_with_mask(rng):
    from tests.torch_refs import TorchWindowAttention, torch_sw_mask

    dim, ws, nh = 16, 4, 2
    hp, wp, shift = 8, 12, 2
    tattn = TorchWindowAttention(dim, ws, nh)
    with torch.no_grad():
        tattn.relative_position_bias_table.normal_(0, 0.5)
    mask_t = torch_sw_mask(hp, wp, ws, shift)
    n_windows = (hp // ws) * (wp // ws)
    x = rng.randn(2 * n_windows, ws * ws, dim).astype(np.float32)
    want = tattn(torch.from_numpy(x), mask_t).detach().numpy()

    mask_np = shifted_window_mask(hp, wp, ws, shift)
    np.testing.assert_allclose(mask_np, mask_t.numpy(), atol=0)

    xj = jnp.asarray(x).reshape(2, hp // ws, wp // ws, ws * ws, dim)
    got = _window_attention(_attn_params(tattn), xj, nh, ws, mask_np, None)
    got = np.asarray(got).reshape(2 * n_windows, ws * ws, dim)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _block_params(tb):
    return {
        "norm1": t2j_ln(tb.norm1),
        "attn": _attn_params(tb.attn),
        "norm2": t2j_ln(tb.norm2),
        "mlp": {"fc1": t2j_linear(tb.fc1), "fc2": t2j_linear(tb.fc2)},
    }


def test_swin_block_parity_shifted_padded(rng):
    """Shifted block on a non-window-divisible map (pad + roll + mask path)."""
    from tests.torch_refs import TorchSwinBlock, torch_sw_mask

    dim, ws, nh, shift = 32, 4, 4, 2
    h, w = 10, 14  # pads to 12x16
    tb = TorchSwinBlock(dim, nh, ws, shift)
    with torch.no_grad():
        tb.attn.relative_position_bias_table.normal_(0, 0.5)
    hp = (h + ws - 1) // ws * ws
    wp = (w + ws - 1) // ws * ws
    mask = torch_sw_mask(hp, wp, ws, shift)
    x = rng.randn(2, h * w, dim).astype(np.float32)
    want = tb(torch.from_numpy(x), h, w, mask).detach().numpy().reshape(2, h, w, dim)

    xj = jnp.asarray(x).reshape(2, h, w, dim)
    got = swin_block_apply(_block_params(tb), xj, num_heads=nh, ws=ws, shift=shift, qk_scale=None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_swin_block_parity_unshifted(rng):
    from tests.torch_refs import TorchSwinBlock

    dim, ws, nh = 32, 4, 4
    h, w = 8, 8
    tb = TorchSwinBlock(dim, nh, ws, 0)
    with torch.no_grad():
        tb.attn.relative_position_bias_table.normal_(0, 0.5)
    x = rng.randn(1, h * w, dim).astype(np.float32)
    want = tb(torch.from_numpy(x), h, w, None).detach().numpy().reshape(1, h, w, dim)
    got = swin_block_apply(
        _block_params(tb), jnp.asarray(x).reshape(1, h, w, dim), num_heads=nh, ws=ws, shift=0,
        qk_scale=None,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_patch_merging_parity_odd(rng):
    from tests.torch_refs import TorchPatchMerging

    dim = 16
    h, w = 7, 9
    tm = TorchPatchMerging(dim)
    x = rng.randn(2, h * w, dim).astype(np.float32)
    want = tm(torch.from_numpy(x), h, w).detach().numpy()
    params = {"norm": t2j_ln(tm.norm), "reduction": t2j_linear(tm.reduction)}
    got = _patch_merging(params, jnp.asarray(x).reshape(2, h, w, dim))
    got = np.asarray(got).reshape(2, -1, 2 * dim)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_full_swin_smoke():
    import jax

    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.swin import swin_apply, swin_init

    cfg = tiny_test_config().swin
    params = swin_init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 64, 96, 3))
    outs = swin_apply(params, cfg, x, compute_dtype=jnp.float32)
    assert set(outs) == {"res2", "res3"}
    assert outs["res2"].shape == (1, 16, 24, 32)
    assert outs["res3"].shape == (1, 8, 12, 64)


def test_nested_attn_layout_matches_partition(rng):
    """attn_layout="nested" (transpose-free window einsums) is numerically
    the same model as the reference partition layout."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.swin import swin_apply, swin_init

    cfg = tiny_test_config().swin
    params = swin_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(2, 40, 56, 3), jnp.float32)  # non-divisible: pads
    a = swin_apply(params, cfg, x, compute_dtype=jnp.float32)
    b = swin_apply(params, dataclasses.replace(cfg, attn_layout="nested"), x,
                   compute_dtype=jnp.float32)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-5, atol=1e-5)


def test_qkv_canvas_attn_layout_matches_partition(rng):
    """attn_layout="qkv_canvas" (qkv projection on the un-partitioned canvas,
    ONE window partition of the 3C output) is bit-identical to the partition
    layout — the row-wise projection commutes with the token permutation."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.swin import swin_apply, swin_init

    cfg = tiny_test_config().swin
    params = swin_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(2, 40, 56, 3), jnp.float32)  # non-divisible: pads
    a = swin_apply(params, cfg, x, compute_dtype=jnp.float32)
    b = swin_apply(params, dataclasses.replace(cfg, attn_layout="qkv_canvas"),
                   x, compute_dtype=jnp.float32)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_resident_attn_layout_matches_partition(rng):
    """attn_layout="resident" (stage-resident window layout, pad re-zeroed
    after norm1) equals the reference partition layout at real tokens —
    including shifted blocks on a padded, non-divisible input."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.swin import swin_apply, swin_init

    cfg = tiny_test_config().swin
    params = swin_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(2, 40, 56, 3), jnp.float32)  # non-divisible: pads
    a = swin_apply(params, cfg, x, compute_dtype=jnp.float32)
    b = swin_apply(params, dataclasses.replace(cfg, attn_layout="resident"), x,
                   compute_dtype=jnp.float32)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-5, atol=1e-5)


def test_resident_attn_layout_grad_and_remat(rng):
    """Resident layout trains: gradients match the partition layout and the
    per-block remat wrapper composes with it."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.swin import swin_apply, swin_init

    cfg = tiny_test_config().swin
    params = swin_init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.randn(1, 24, 40, 3), jnp.float32)

    def loss(p, layout, remat):
        c = dataclasses.replace(cfg, attn_layout=layout, use_checkpoint=remat)
        outs = swin_apply(p, c, x, compute_dtype=jnp.float32)
        return sum(jnp.sum(v**2) for v in outs.values())

    ga = jax.grad(loss)(params, "partition", False)
    gb = jax.grad(loss)(params, "resident", True)
    flat_a = jax.tree.leaves(ga)
    flat_b = jax.tree.leaves(gb)
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=2e-5)


def test_per_stage_resident_layout_matches_partition(rng):
    """attn_layout="resident:0,2" (per-stage hybrid: resident window layout
    on the listed stages only) equals the partition layout at real tokens,
    including the patch-merging handoff between differently-laid-out
    stages."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rba_tpu.config import tiny_test_config
    from rba_tpu.models.swin import swin_apply, swin_init

    cfg = tiny_test_config().swin
    params = swin_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(1, 40, 56, 3), jnp.float32)
    a = swin_apply(params, cfg, x, compute_dtype=jnp.float32)
    b = swin_apply(params, dataclasses.replace(cfg, attn_layout="resident:0,2"),
                   x, compute_dtype=jnp.float32)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-5, atol=1e-5)
