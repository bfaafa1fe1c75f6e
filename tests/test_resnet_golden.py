"""D2 ResNet backbone: torchvision-ckpt → D2-name mapping → converter →
forward golden vs the torch reference (reference backbones:
configs/**/Base-*.yaml build_resnet_backbone + tools/convert-torchvision-to-d2.py)."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from rba_tpu.config import ResNetConfig
from rba_tpu.convert.d2_mapping import (
    convert_resnet_backbone,
    torchvision_resnet_to_d2,
)
from rba_tpu.models.resnet import resnet_apply, resnet_init


class _Cfg:
    pass


def test_resnet50_forward_matches_torch(rng):
    from tests.torch_refs import TorchResNet

    torch.manual_seed(0)
    tm = TorchResNet(stage_blocks=(2, 2, 2, 2)).eval()
    # randomize BN running stats so the folding actually gets tested
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = rng.rand(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    d2 = torchvision_resnet_to_d2(sd)
    assert "backbone.stem.conv1.weight" in d2
    assert "backbone.res2.0.shortcut.weight" in d2
    assert not any("fc." in k or "num_batches" in k for k in d2)

    cfg = ResNetConfig(depth=18)  # stage_blocks (2,2,2,2)
    rcfg = _Cfg()
    rcfg.resnet = cfg
    params = jax.tree.map(jnp.asarray, convert_resnet_backbone(d2, rcfg))
    out = resnet_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       compute_dtype=jnp.float32)
    for f in ("res2", "res3", "res4", "res5"):
        np.testing.assert_allclose(
            np.asarray(out[f]).transpose(0, 3, 1, 2),
            want[f].numpy(),
            rtol=1e-3, atol=1e-3, err_msg=f,
        )


def test_resnet_converter_structure(rng):
    from tests.torch_refs import TorchResNet

    tm = TorchResNet(stage_blocks=(3, 4, 6, 3))
    d2 = torchvision_resnet_to_d2({k: v.detach().numpy() for k, v in tm.state_dict().items()})
    cfg = ResNetConfig(depth=50)
    rcfg = _Cfg()
    rcfg.resnet = cfg
    p = convert_resnet_backbone(d2, rcfg)
    ref = resnet_init(jax.random.PRNGKey(0), cfg)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(ref)
    assert [np.shape(a) for a in jax.tree.leaves(p)] == [
        np.shape(a) for a in jax.tree.leaves(ref)
    ]


def test_torchvision_cli_mode(tmp_path):
    """`convert_checkpoint torchvision` end-to-end: torchvision-named .pth →
    native backbone npz (reference tools/convert-torchvision-to-d2.py +
    DetectionCheckpointer load, composed into one command)."""
    from tests.torch_refs import TorchResNet

    from rba_tpu.convert.checkpoint import load_params
    from rba_tpu.models.resnet import resnet_init
    from rba_tpu.tools.convert_checkpoint import main as convert_main

    torch.manual_seed(1)
    tm = TorchResNet(stage_blocks=(2, 2, 2, 2))
    ckpt = tmp_path / "resnet18.pth"
    torch.save(tm.state_dict(), str(ckpt))
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        "MODEL:\n"
        "  BACKBONE: {NAME: build_resnet_backbone}\n"
        "  RESNETS: {DEPTH: 18, STRIDE_IN_1X1: false}\n"
    )
    out = tmp_path / "backbone.npz"
    convert_main([
        "torchvision", "--config", str(cfg_path),
        "--checkpoint", str(ckpt), "--out", str(out),
    ])
    p = load_params(str(out))
    ref = resnet_init(jax.random.PRNGKey(0), ResNetConfig(depth=18))
    assert jax.tree_util.tree_structure(jax.tree.map(np.asarray, p)) == \
        jax.tree_util.tree_structure(ref)
    np.testing.assert_allclose(
        p["stem"]["conv1"]["kernel"],
        tm.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
    )
