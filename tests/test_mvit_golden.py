"""Numerical golden test of MViT's pooling attention vs a direct torch
construction of the MViTv2 math (depthwise-pooled q/k/v + residual pooling,
reference mvit.py:42-183)."""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from rba_tpu.models.mvit import MViTConfig, _ms_attention


class TorchPoolAttn(nn.Module):
    def __init__(self, dim, dim_out, heads, stride_q=1, stride_kv=2, pool_k=3):
        super().__init__()
        self.heads = heads
        self.hd = dim_out // heads
        self.qkv = nn.Linear(dim, 3 * dim_out, bias=True)
        self.proj = nn.Linear(dim_out, dim_out)
        pad = pool_k // 2
        self.pool_q = nn.Conv2d(self.hd, self.hd, pool_k, stride=stride_q, padding=pad,
                                groups=self.hd, bias=False)
        self.norm_q = nn.LayerNorm(self.hd, eps=1e-6)
        self.pool_k = nn.Conv2d(self.hd, self.hd, pool_k, stride=stride_kv, padding=pad,
                                groups=self.hd, bias=False)
        self.norm_k = nn.LayerNorm(self.hd, eps=1e-6)
        self.pool_v = nn.Conv2d(self.hd, self.hd, pool_k, stride=stride_kv, padding=pad,
                                groups=self.hd, bias=False)
        self.norm_v = nn.LayerNorm(self.hd, eps=1e-6)
        self.stride_q = stride_q
        self.stride_kv = stride_kv

    def _pool(self, x, pool, norm):
        # x: (B*nh, H, W, hd) -> conv NCHW -> back, then LN
        y = pool(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        return norm(y)

    def forward(self, x):
        B, H, W, _ = x.shape
        qkv = self.qkv(x).reshape(B, H, W, 3, self.heads, self.hd)
        qkv = qkv.permute(3, 0, 4, 1, 2, 5).reshape(3, B * self.heads, H, W, self.hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = self._pool(q, self.pool_q, self.norm_q)
        k = self._pool(k, self.pool_k, self.norm_k)
        v = self._pool(v, self.pool_v, self.norm_v)
        ori_q = q
        qh, qw = q.shape[1:3]
        kh, kw = k.shape[1:3]
        qf = q.reshape(-1, qh * qw, self.hd)
        kf = k.reshape(-1, kh * kw, self.hd)
        vf = v.reshape(-1, kh * kw, self.hd)
        attn = (qf * self.hd**-0.5) @ kf.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        out = (attn @ vf).reshape(-1, qh, qw, self.hd)
        out = out + ori_q  # residual pooling
        out = out.reshape(B, self.heads, qh, qw, self.hd).permute(0, 2, 3, 1, 4)
        out = out.reshape(B, qh, qw, self.heads * self.hd)
        return self.proj(out)


def test_mvit_pool_attention_parity(rng):
    dim = dim_out = 32
    heads, stride_q, stride_kv = 2, 1, 2
    tm = TorchPoolAttn(dim, dim_out, heads, stride_q, stride_kv).eval()
    with torch.no_grad():
        for m in (tm.pool_q, tm.pool_k, tm.pool_v):
            m.weight.normal_(0, 0.2)

    h = w = 8
    x = rng.randn(2, h, w, dim).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    def conv_p(m):
        # torch depthwise (hd, 1, k, k) -> HWIO (k, k, 1, hd)
        return {"kernel": jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0))}

    def ln_p(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy()),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    def lin_p(m):
        return {"kernel": jnp.asarray(m.weight.detach().numpy().T),
                "bias": jnp.asarray(m.bias.detach().numpy())}

    p = {
        "qkv": lin_p(tm.qkv),
        "proj": lin_p(tm.proj),
        "pool_q": conv_p(tm.pool_q), "norm_q": ln_p(tm.norm_q),
        "pool_k": conv_p(tm.pool_k), "norm_k": ln_p(tm.norm_k),
        "pool_v": conv_p(tm.pool_v), "norm_v": ln_p(tm.norm_v),
    }
    cfg = MViTConfig(use_rel_pos=False, residual_pooling=True)
    s = dict(dim=dim, dim_out=dim_out, heads=heads, stride_q=stride_q,
             stride_kv=stride_kv, window=0, input_size=h)
    got = _ms_attention(p, jnp.asarray(x), s, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
