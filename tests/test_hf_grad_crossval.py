"""Whole-stack GRADIENT cross-validation against HF Mask2Former.

tests/test_hf_crossval.py proves forward parity with an implementation
independent of this repo's torch reference builders; this file proves the
same for the backward pass.  The trick: the HF→D2 key mapping and the D2
converter are LINEAR maps on the leaf arrays (renames, q/k/v row-concats,
layout transposes), so applying them to a torch *gradient* state dict
produces the gradient pytree in our parameter layout exactly — and JAX
autodiff of the same scalar loss must match leaf by leaf.

This covers in one test the pieces whose backward the reference hand-writes
or relies on library autograd for: the MSDeformAttn sampling backward (6
CUDA kernels in the reference, reference ops/src/cuda/*.cu — here JAX
autodiff of the gather/one-hot lowerings), window attention with shifted
masks, patch merging, the masked-attention decoder (whose attention-mask
threshold is non-differentiable in BOTH implementations), and both heads.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from rba_tpu.convert.d2_mapping import convert_d2_state_dict  # noqa: E402
from rba_tpu.convert.hf_mapping import (  # noqa: E402
    convert_hf_checkpoint,
    hf_mask2former_to_d2,
)
from tests.test_hf_crossval import _image, _tiny_hf_model  # noqa: E402


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, prefix + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _leaf_paths(v, prefix + (i,))
    else:
        yield prefix, tree


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _assert_grad_trees_close(jax_grads, grad_tree, min_leaves):
    checked = 0
    for path, want in _leaf_paths(grad_tree):
        got = np.asarray(_get(jax_grads, path), np.float64)
        want = np.asarray(want, np.float64)
        # atol floor 5e-5: leaves whose true gradient nearly cancels (e.g.
        # input_proj / norm biases under a zero-mean random projection loss,
        # |g| ~ 1e-6..1e-4) carry fp32 reduction-order noise (up to ~3e-5
        # observed) — still 4+ orders below any real-bug signal (O(1))
        scale = max(np.abs(want).max(), 1e-1)
        np.testing.assert_allclose(
            got, want, atol=5e-4 * scale, rtol=2e-3,
            err_msg=f"grad mismatch at {'/'.join(map(str, path))}",
        )
        checked += 1
    # every converted leaf was compared
    assert checked >= min_leaves, checked


def test_full_model_grads_match_hf():
    m = _tiny_hf_model()
    # Mask2Former's deform-attn init (zero sampling_offsets weight +
    # directional bias) puts EVERY sampling point exactly on a bilinear
    # cell boundary, where the location-gradient is discontinuous — a
    # 1-ulp difference between torch grid_sample's coordinate arithmetic
    # and ours flips the cell and yields a legitimate O(1) subgradient
    # difference (observed: ~17/96 offset slots).  Perturb to generic
    # positions; the forward is continuous there so fwd parity is
    # unaffected, and flips now need an ~1e-7 coincidence.
    rs0 = np.random.RandomState(11)
    with torch.no_grad():
        for name, p in m.named_parameters():
            if "sampling_offsets" in name:
                p.add_(torch.from_numpy(rs0.normal(0, 0.05, tuple(p.shape)).astype(np.float32)))
    params, cfg = convert_hf_checkpoint(m)
    img = _image(64, 96, seed=2)

    # fixed projection tensors make the scalar loss sensitive to every output
    rs = np.random.RandomState(7)
    with torch.no_grad():
        hf_probe = m(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
    wl = rs.normal(size=hf_probe.class_queries_logits.shape).astype(np.float32)
    wm = rs.normal(size=hf_probe.masks_queries_logits.shape).astype(np.float32)

    # ---- torch backward ----
    m.zero_grad(set_to_none=True)
    out = m(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
    loss = (out.class_queries_logits * torch.from_numpy(wl)).sum() + (
        out.masks_queries_logits * torch.from_numpy(wm)
    ).sum()
    loss.backward()
    grad_sd = {
        k: p.grad if p.grad is not None else torch.zeros_like(p)
        for k, p in m.named_parameters()
    }
    # the converters are linear maps on the leaves → they convert gradient
    # dicts exactly like weight dicts
    grad_tree = convert_d2_state_dict(hf_mask2former_to_d2(grad_sd), cfg)

    # ---- JAX backward of the same scalar ----
    from rba_tpu.models.maskformer import maskformer_forward

    def scalar_loss(p):
        o = maskformer_forward(p, cfg, jnp.asarray(img), need_aux=False)
        return (o["pred_logits"] * wl).sum() + (o["pred_masks"] * wm).sum()

    jax_grads = jax.grad(scalar_loss)(params)

    loss_val = float(scalar_loss(params))
    np.testing.assert_allclose(loss_val, float(loss.detach()), rtol=1e-4)

    _assert_grad_trees_close(jax_grads, grad_tree, min_leaves=100)
    # the deformable-attention sampling path specifically must carry gradient
    so = grad_tree["sem_seg_head"]["pixel_decoder"]["transformer"]["encoder"][
        "layers"
    ][0]["self_attn"]["sampling_offsets"]["kernel"]
    assert np.abs(np.asarray(so)).max() > 0


def test_maskformer_v1_grads_match_hf():
    """v1 path backward: pad-style Swin (incl. sub-window stages whose pad
    tokens participate as unmasked keys) -> FPN BasePixelDecoder -> DETR
    StandardTransformerDecoder, vs HF MaskFormerForInstanceSegmentation."""
    from rba_tpu.convert.hf_mapping import hf_maskformer_v1_to_d2
    from tests.test_hf_crossval import _tiny_hf_maskformer_v1

    m, params, cfg = _tiny_hf_maskformer_v1()
    img = _image(64, 96, seed=4)

    rs = np.random.RandomState(9)
    with torch.no_grad():
        probe = m(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
    wl = rs.normal(size=probe.class_queries_logits.shape).astype(np.float32)
    wm = rs.normal(size=probe.masks_queries_logits.shape).astype(np.float32)

    m.zero_grad(set_to_none=True)
    out = m(pixel_values=torch.from_numpy(img.transpose(0, 3, 1, 2)))
    loss = (out.class_queries_logits * torch.from_numpy(wl)).sum() + (
        out.masks_queries_logits * torch.from_numpy(wm)
    ).sum()
    loss.backward()
    grad_sd = {
        k: p.grad if p.grad is not None else torch.zeros_like(p)
        for k, p in m.named_parameters()
    }
    grad_tree = convert_d2_state_dict(hf_maskformer_v1_to_d2(grad_sd), cfg)

    from rba_tpu.models.maskformer import maskformer_forward

    def scalar_loss(p):
        o = maskformer_forward(p, cfg, jnp.asarray(img), need_aux=False)
        return (o["pred_logits"] * wl).sum() + (o["pred_masks"] * wm).sum()

    np.testing.assert_allclose(
        float(scalar_loss(params)), float(loss.detach()), rtol=1e-4
    )
    _assert_grad_trees_close(jax.grad(scalar_loss)(params), grad_tree, min_leaves=80)


def test_mix_transformer_grads_match_hf_segformer():
    """MiT backbone backward (overlapping patch embeds, SR-attention with
    the HF k/v split fused back to kv, dwconv MLPs) vs HF Segformer."""
    from transformers import SegformerConfig, SegformerModel

    from rba_tpu.convert.d2_mapping import convert_mit_backbone
    from rba_tpu.convert.hf_mapping import hf_segformer_to_d2
    from rba_tpu.models.mix_transformer import MIT_VARIANTS, mit_apply

    torch.manual_seed(0)
    c = SegformerConfig(
        num_encoder_blocks=4,
        depths=[2, 2, 2, 2],
        sr_ratios=[8, 4, 2, 1],
        hidden_sizes=[32, 64, 160, 256],
        patch_sizes=[7, 3, 3, 3],
        strides=[4, 2, 2, 2],
        num_attention_heads=[1, 2, 5, 8],
        mlp_ratios=[4, 4, 4, 4],
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0,
        reshape_last_stage=True,
    )
    m = SegformerModel(c).eval()
    params = convert_mit_backbone(hf_segformer_to_d2(m.state_dict()))
    img = _image(64, 96, seed=5)

    rs = np.random.RandomState(10)
    with torch.no_grad():
        probe = m(torch.from_numpy(img.transpose(0, 3, 1, 2)), output_hidden_states=True)
    ws = [
        rs.normal(size=h.shape).astype(np.float32) for h in probe.hidden_states
    ]

    m.zero_grad(set_to_none=True)
    out = m(torch.from_numpy(img.transpose(0, 3, 1, 2)), output_hidden_states=True)
    loss = sum(
        (h * torch.from_numpy(w)).sum() for h, w in zip(out.hidden_states, ws)
    )
    loss.backward()
    grad_sd = {
        k: p.grad if p.grad is not None else torch.zeros_like(p)
        for k, p in m.named_parameters()
    }
    grad_tree = convert_mit_backbone(hf_segformer_to_d2(grad_sd))

    def scalar_loss(p):
        feats = mit_apply(
            p, MIT_VARIANTS["mit_b0"], jnp.asarray(img), compute_dtype=jnp.float32
        )
        return sum(
            (feats[k] * w.transpose(0, 2, 3, 1)).sum()
            for k, w in zip(["res2", "res3", "res4", "res5"], ws)
        )

    np.testing.assert_allclose(
        float(scalar_loss(params)), float(loss.detach()), rtol=1e-4
    )
    _assert_grad_trees_close(jax.grad(scalar_loss)(params), grad_tree, min_leaves=60)


def test_vitdet_grads_match_hf():
    """ViTDet backbone backward vs HF VitDetModel: decomposed rel-pos
    attention (incl. the in-model linear rel-pos table resample), bicubic
    abs-pos resample, window partition/unpartition on a padded 3x3 grid,
    and the residual bottleneck block.  The reference relies on torch
    autograd here (backbone/vit.py, backbone/utils.py); both sides'
    gradients must agree leaf by leaf after the linear key mapping."""
    from rba_tpu.convert.d2_mapping import convert_vit_backbone
    from rba_tpu.convert.hf_mapping import hf_vitdet_to_d2
    from rba_tpu.models.vit import ViTConfig, vit_apply
    from tests.test_hf_crossval import _tiny_hf_vitdet

    m = _tiny_hf_vitdet(seed=6)
    params = convert_vit_backbone(hf_vitdet_to_d2(m.state_dict()))
    cfg = ViTConfig(
        patch_size=16,
        embed_dim=32,
        depth=4,
        num_heads=4,
        window_size=2,
        window_block_indexes=(0, 2),
        residual_block_indexes=(1,),
        pretrain_img_size=32,
        pretrain_use_cls_token=True,
    )
    img = _image(48, 48, seed=16)

    rs = np.random.RandomState(12)
    with torch.no_grad():
        probe = m(torch.from_numpy(img.transpose(0, 3, 1, 2))).last_hidden_state
    w = rs.normal(size=tuple(probe.shape)).astype(np.float32)

    m.zero_grad(set_to_none=True)
    out = m(torch.from_numpy(img.transpose(0, 3, 1, 2))).last_hidden_state
    (out * torch.from_numpy(w)).sum().backward()
    grad_sd = {
        k: p.grad if p.grad is not None else torch.zeros_like(p)
        for k, p in m.named_parameters()
    }
    grad_tree = convert_vit_backbone(hf_vitdet_to_d2(grad_sd))

    def scalar_loss(p):
        feats = vit_apply(p, cfg, jnp.asarray(img), compute_dtype=jnp.float32)
        # HF last_hidden_state is NCHW
        return (feats["last_feat"] * w.transpose(0, 2, 3, 1)).sum()

    torch_loss = float((out * torch.from_numpy(w)).sum().detach())
    np.testing.assert_allclose(float(scalar_loss(params)), torch_loss, rtol=1e-4)
    _assert_grad_trees_close(jax.grad(scalar_loss)(params), grad_tree, min_leaves=40)
