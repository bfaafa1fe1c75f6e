"""Numerical golden test of the WiderResNet identity-residual block vs a
direct torch pre-activation construction."""
import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from rba_tpu.models.wideresnet import _block_apply


class TorchPreactBlock(nn.Module):
    """Pre-activation wide block: BN+ReLU → conv3 (stride) → BN+ReLU → conv3,
    with projection shortcut when shape changes (WiderResNet A2 semantics)."""

    def __init__(self, cin, c0, c1, stride=1, dilation=1):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(cin)
        self.conv1 = nn.Conv2d(cin, c0, 3, stride=stride, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(c0)
        self.conv2 = nn.Conv2d(c0, c1, 3, padding=dilation, dilation=dilation, bias=False)
        self.proj = (
            nn.Conv2d(cin, c1, 1, stride=stride, bias=False)
            if (stride != 1 or cin != c1) else None
        )

    def forward(self, x):
        y = torch.relu(self.bn1(x))
        shortcut = self.proj(y) if self.proj is not None else x
        z = self.conv1(y)
        z = torch.relu(self.bn2(z))
        z = self.conv2(z)
        return shortcut + z


def _bn_params(bn):
    return {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "mean": jnp.asarray(bn.running_mean.detach().numpy()),
        "var": jnp.asarray(bn.running_var.detach().numpy()),
    }


def _conv_params(conv):
    return {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))}


def test_wide_block_parity(rng):
    cin, c0, c1 = 32, 64, 64
    tb = TorchPreactBlock(cin, c0, c1, stride=2, dilation=1).eval()
    with torch.no_grad():
        tb.bn1.running_mean.normal_(0, 0.1)
        tb.bn1.running_var.uniform_(0.5, 1.5)
        tb.bn2.running_mean.normal_(0, 0.1)
        tb.bn2.running_var.uniform_(0.5, 1.5)

    x = rng.randn(1, 16, 16, cin).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    params = {
        "bn1": _bn_params(tb.bn1),
        "conv1": _conv_params(tb.conv1),
        "bn2": _bn_params(tb.bn2),
        "conv2": _conv_params(tb.conv2),
        "proj_conv": _conv_params(tb.proj),
    }
    got = _block_apply(params, jnp.asarray(x), stride=2, dilation=1, bottleneck=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_wide_block_dilated_parity(rng):
    cin = c0 = c1 = 32
    tb = TorchPreactBlock(cin, c0, c1, stride=1, dilation=2).eval()
    x = rng.randn(1, 12, 12, cin).astype(np.float32)
    with torch.no_grad():
        want = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    params = {
        "bn1": _bn_params(tb.bn1),
        "conv1": _conv_params(tb.conv1),
        "bn2": _bn_params(tb.bn2),
        "conv2": _conv_params(tb.conv2),
    }
    got = _block_apply(params, jnp.asarray(x), stride=1, dilation=2, bottleneck=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
