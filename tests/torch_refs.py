"""Independent PyTorch reference implementations used ONLY for golden tests.

These are written from the public papers / framework primitives (Swin
Transformer, Deformable DETR, DETR) using torch building blocks
(nn.MultiheadAttention, F.grid_sample, F.interpolate).  They define the
numerical contract our JAX/TPU implementation must match; they are not part
of the shipped framework.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Swin pieces
# ---------------------------------------------------------------------------

class TorchWindowAttention(nn.Module):
    def __init__(self, dim, window_size, num_heads, qkv_bias=True):
        super().__init__()
        self.dim = dim
        self.ws = window_size
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window_size - 1) ** 2, num_heads)
        )
        coords = torch.stack(
            torch.meshgrid(torch.arange(window_size), torch.arange(window_size), indexing="ij")
        )
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window_size - 1
        rel[:, :, 1] += window_size - 1
        rel[:, :, 0] *= 2 * window_size - 1
        self.register_buffer("rpi", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(B_, N, 3, self.num_heads, C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rpi.view(-1)].view(N, N, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.num_heads, N, N) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


def torch_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, C)


def torch_window_reverse(w, ws, H, W):
    B = int(w.shape[0] / (H * W / ws / ws))
    x = w.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, H, W, -1)


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, num_heads, window_size, shift_size, mlp_ratio=4.0, qkv_bias=True):
        super().__init__()
        self.ws = window_size
        self.shift = shift_size
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, window_size, num_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W, attn_mask):
        B, L, C = x.shape
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        pad_r = (self.ws - W % self.ws) % self.ws
        pad_b = (self.ws - H % self.ws) % self.ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        _, Hp, Wp, _ = x.shape
        if self.shift > 0:
            x = torch.roll(x, shifts=(-self.shift, -self.shift), dims=(1, 2))
            m = attn_mask
        else:
            m = None
        xw = torch_window_partition(x, self.ws).view(-1, self.ws * self.ws, C)
        xw = self.attn(xw, m)
        x = torch_window_reverse(xw.view(-1, self.ws, self.ws, C), self.ws, Hp, Wp)
        if self.shift > 0:
            x = torch.roll(x, shifts=(self.shift, self.shift), dims=(1, 2))
        x = x[:, :H, :W, :].contiguous().view(B, H * W, C)
        x = shortcut + x
        x = x + self.fc2(F.gelu(self.fc1(self.norm2(x))))
        return x


def torch_sw_mask(Hp, Wp, ws, shift):
    img_mask = torch.zeros((1, Hp, Wp, 1))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = torch_window_partition(img_mask, ws).view(-1, ws * ws)
    am = mw.unsqueeze(1) - mw.unsqueeze(2)
    return am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)


class TorchPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        if H % 2 or W % 2:
            x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


# ---------------------------------------------------------------------------
# Deformable attention core (grid_sample formulation, Deformable-DETR math)
# ---------------------------------------------------------------------------

def torch_ms_deform_attn_core(value, spatial_shapes, sampling_locations, attention_weights):
    """value: (N, S, M, D); sampling_locations: (N, Lq, M, L, P, 2) in [0,1];
    attention_weights: (N, Lq, M, L, P).  Returns (N, Lq, M*D)."""
    N_, S_, M_, D_ = value.shape
    _, Lq, M_, L_, P_, _ = sampling_locations.shape
    value_list = value.split([H * W for H, W in spatial_shapes], dim=1)
    grids = 2 * sampling_locations - 1
    out_list = []
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N_ * M_, D_, H, W)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (N*M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        out_list.append(s)  # (N*M, D, Lq, P)
    aw = attention_weights.transpose(1, 2).reshape(N_ * M_, 1, Lq, L_ * P_)
    out = (torch.stack(out_list, dim=-2).flatten(-2) * aw).sum(-1).view(N_, M_ * D_, Lq)
    return out.transpose(1, 2).contiguous()


# ---------------------------------------------------------------------------
# Sine position embedding (DETR formula, cumsum form)
# ---------------------------------------------------------------------------

def torch_sine_pos_embed(h, w, num_pos_feats=128, temperature=10000):
    not_mask = torch.ones((1, h, w))
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)  # (1, C, H, W)


# ---------------------------------------------------------------------------
# Mask2Former-style decoder assembly (post-norm residual blocks, masked
# cross-attention with sigmoid<0.5 threshold + full-row unmask)
# ---------------------------------------------------------------------------

class TorchMiniMaskedDecoder(nn.Module):
    def __init__(self, hidden_dim, nheads, dim_ff, num_layers, num_queries,
                 num_classes, mask_dim, num_levels=1):
        super().__init__()
        self.nheads = nheads
        self.num_layers = num_layers
        self.num_levels = num_levels
        self.query_feat = nn.Embedding(num_queries, hidden_dim)
        self.query_embed = nn.Embedding(num_queries, hidden_dim)
        self.level_embed = nn.Embedding(num_levels, hidden_dim)
        self.cross_attn = nn.ModuleList(
            [nn.MultiheadAttention(hidden_dim, nheads) for _ in range(num_layers)])
        self.cross_norm = nn.ModuleList([nn.LayerNorm(hidden_dim) for _ in range(num_layers)])
        self.self_attn = nn.ModuleList(
            [nn.MultiheadAttention(hidden_dim, nheads) for _ in range(num_layers)])
        self.self_norm = nn.ModuleList([nn.LayerNorm(hidden_dim) for _ in range(num_layers)])
        self.ffn1 = nn.ModuleList([nn.Linear(hidden_dim, dim_ff) for _ in range(num_layers)])
        self.ffn2 = nn.ModuleList([nn.Linear(dim_ff, hidden_dim) for _ in range(num_layers)])
        self.ffn_norm = nn.ModuleList([nn.LayerNorm(hidden_dim) for _ in range(num_layers)])
        self.decoder_norm = nn.LayerNorm(hidden_dim)
        self.class_embed = nn.Linear(hidden_dim, num_classes + 1)
        self.mask_mlp = nn.ModuleList([
            nn.Linear(hidden_dim, hidden_dim), nn.Linear(hidden_dim, hidden_dim),
            nn.Linear(hidden_dim, mask_dim)])

    def mask_embed(self, x):
        x = F.relu(self.mask_mlp[0](x))
        x = F.relu(self.mask_mlp[1](x))
        return self.mask_mlp[2](x)

    def pred_heads(self, output, mask_features, size):
        dec = self.decoder_norm(output).transpose(0, 1)  # (B, Q, C)
        cls = self.class_embed(dec)
        me = self.mask_embed(dec)
        masks = torch.einsum("bqc,bchw->bqhw", me, mask_features)
        am = F.interpolate(masks, size=size, mode="bilinear", align_corners=False)
        am = (am.sigmoid().flatten(2).unsqueeze(1).repeat(1, self.nheads, 1, 1)
              .flatten(0, 1) < 0.5).bool().detach()
        return cls, masks, am

    def forward(self, feats, pos_embeds, mask_features):
        # feats: list of (B, C, h, w); mask_features: (B, C_mask, H, W)
        srcs, poss, sizes = [], [], []
        for i, (f, pe) in enumerate(zip(feats, pos_embeds)):
            sizes.append(f.shape[-2:])
            poss.append(pe.flatten(2).permute(2, 0, 1))
            srcs.append(f.flatten(2).permute(2, 0, 1) + self.level_embed.weight[i][None, None])
        bs = feats[0].shape[0]
        qe = self.query_embed.weight.unsqueeze(1).repeat(1, bs, 1)
        out = self.query_feat.weight.unsqueeze(1).repeat(1, bs, 1)
        cls_list, mask_list = [], []
        cls, masks, am = self.pred_heads(out, mask_features, sizes[0])
        cls_list.append(cls); mask_list.append(masks)
        for i in range(self.num_layers):
            lvl = i % self.num_levels
            am[torch.where(am.sum(-1) == am.shape[-1])] = False
            y = self.cross_attn[i](query=out + qe, key=srcs[lvl] + poss[lvl],
                                   value=srcs[lvl], attn_mask=am)[0]
            out = self.cross_norm[i](out + y)
            q = out + qe
            y = self.self_attn[i](query=q, key=q, value=out)[0]
            out = self.self_norm[i](out + y)
            y = self.ffn2[i](F.relu(self.ffn1[i](out)))
            out = self.ffn_norm[i](out + y)
            cls, masks, am = self.pred_heads(out, mask_features, sizes[(i + 1) % self.num_levels])
            cls_list.append(cls); mask_list.append(masks)
        return cls_list, mask_list


# ---------------------------------------------------------------------------
# Deformable encoder layer + pixel-decoder pieces
# ---------------------------------------------------------------------------

class TorchDeformAttnModule(nn.Module):
    """Deformable-DETR attention module: offsets/weights from query, bilinear
    sample of per-head value maps (uses torch_ms_deform_attn_core)."""

    def __init__(self, d_model, n_levels, n_heads, n_points):
        super().__init__()
        self.d = d_model; self.L = n_levels; self.M = n_heads; self.P = n_points
        self.sampling_offsets = nn.Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = nn.Linear(d_model, n_heads * n_levels * n_points)
        self.value_proj = nn.Linear(d_model, d_model)
        self.output_proj = nn.Linear(d_model, d_model)

    def forward(self, query, reference_points, src, spatial_shapes):
        N, Lq, C = query.shape
        value = self.value_proj(src).view(N, -1, self.M, C // self.M)
        off = self.sampling_offsets(query).view(N, Lq, self.M, self.L, self.P, 2)
        aw = self.attention_weights(query).view(N, Lq, self.M, self.L * self.P)
        aw = aw.softmax(-1).view(N, Lq, self.M, self.L, self.P)
        normalizer = torch.tensor([[w, h] for (h, w) in spatial_shapes], dtype=torch.float32)
        loc = reference_points[:, :, None, :, None, :] + off / normalizer[None, None, None, :, None, :]
        out = torch_ms_deform_attn_core(value, spatial_shapes, loc, aw)
        return self.output_proj(out)


class TorchDeformEncoderLayer(nn.Module):
    def __init__(self, d_model, d_ffn, n_levels, n_heads, n_points):
        super().__init__()
        self.attn = TorchDeformAttnModule(d_model, n_levels, n_heads, n_points)
        self.norm1 = nn.LayerNorm(d_model)
        self.linear1 = nn.Linear(d_model, d_ffn)
        self.linear2 = nn.Linear(d_ffn, d_model)
        self.norm2 = nn.LayerNorm(d_model)

    def forward(self, src, pos, ref, spatial_shapes):
        y = self.attn(src + pos, ref, src, spatial_shapes)
        src = self.norm1(src + y)
        y = self.linear2(F.relu(self.linear1(src)))
        return self.norm2(src + y)


# ---------------------------------------------------------------------------
# Full-stack mini model (Swin + deformable pixel decoder + masked decoder)
# used for the end-to-end converter/golden test.
# ---------------------------------------------------------------------------

class TorchSwinFull(nn.Module):
    def __init__(self, embed_dim=32, depths=(2, 2), num_heads=(2, 4), window=4,
                 patch=4, mlp_ratio=4.0):
        super().__init__()
        self.patch = patch
        self.window = window
        self.depths = depths
        self.num_heads = num_heads
        self.proj = nn.Conv2d(3, embed_dim, patch, stride=patch)
        self.patch_norm = nn.LayerNorm(embed_dim)
        self.blocks = nn.ModuleList()
        self.downsamples = nn.ModuleList()
        dims = [embed_dim * 2**i for i in range(len(depths))]
        for i, d in enumerate(depths):
            stage = nn.ModuleList([
                TorchSwinBlock(dims[i], num_heads[i], window,
                               0 if j % 2 == 0 else window // 2, mlp_ratio)
                for j in range(d)
            ])
            self.blocks.append(stage)
            if i < len(depths) - 1:
                self.downsamples.append(TorchPatchMerging(dims[i]))
        self.out_norms = nn.ModuleList([nn.LayerNorm(d) for d in dims])

    def forward(self, x):
        x = self.proj(x)
        B, C, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.patch_norm(x)
        outs = {}
        for i, stage in enumerate(self.blocks):
            hp = (H + self.window - 1) // self.window * self.window
            wp = (W + self.window - 1) // self.window * self.window
            am = torch_sw_mask(hp, wp, self.window, self.window // 2)
            for blk in stage:
                x = blk(x, H, W, am)
            out = self.out_norms[i](x)
            outs[f"res{i+2}"] = out.view(B, H, W, -1).permute(0, 3, 1, 2)
            if i < len(self.blocks) - 1:
                x = self.downsamples[i](x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
        return outs


class TorchPixelDecoderMini(nn.Module):
    """1 transformer level (res3) + 1 FPN level (res2), GN(32)."""

    def __init__(self, in_ch, conv_dim=64, mask_dim=64, enc_layers=2, nheads=4,
                 npoints=4, ffn=128):
        super().__init__()
        self.conv_dim = conv_dim
        self.input_proj_conv = nn.Conv2d(in_ch["res3"], conv_dim, 1)
        self.input_proj_gn = nn.GroupNorm(32, conv_dim)
        self.level_embed = nn.Parameter(torch.randn(1, conv_dim))
        self.layers = nn.ModuleList([
            TorchDeformEncoderLayer(conv_dim, ffn, 1, nheads, npoints)
            for _ in range(enc_layers)
        ])
        self.adapter_conv = nn.Conv2d(in_ch["res2"], conv_dim, 1, bias=False)
        self.adapter_gn = nn.GroupNorm(32, conv_dim)
        self.out_conv = nn.Conv2d(conv_dim, conv_dim, 3, padding=1, bias=False)
        self.out_gn = nn.GroupNorm(32, conv_dim)
        self.mask_features = nn.Conv2d(conv_dim, mask_dim, 1)

    def forward(self, feats):
        x = feats["res3"].float()
        y = self.input_proj_gn(self.input_proj_conv(x))
        B, C, H, W = y.shape
        pos = torch_sine_pos_embed(H, W, C // 2).repeat(B, 1, 1, 1)
        src = y.flatten(2).transpose(1, 2)
        posf = pos.flatten(2).transpose(1, 2) + self.level_embed[0][None, None]
        ys, xs = torch.meshgrid(
            torch.linspace(0.5, H - 0.5, H) / H, torch.linspace(0.5, W - 0.5, W) / W,
            indexing="ij")
        ref = torch.stack([xs.reshape(-1), ys.reshape(-1)], -1)[None, :, None, :].repeat(B, 1, 1, 1)
        out = src
        for l in self.layers:
            out = l(out, posf, ref, [(H, W)])
        enc = out.transpose(1, 2).view(B, C, H, W)
        lat = self.adapter_gn(self.adapter_conv(feats["res2"].float()))
        up = F.interpolate(enc, size=lat.shape[-2:], mode="bilinear", align_corners=False)
        fpn = F.relu(self.out_gn(self.out_conv(lat + up)))
        return self.mask_features(fpn), enc


# ---------------------------------------------------------------------------
# Decoder variants: per-pixel (mask-only) and simple (1 cross-attn) decoders
# ---------------------------------------------------------------------------

class TorchPerPixelDecoder(nn.Module):
    """MultiScalePerPixelDecoder semantics: the masked-attention decoder
    stack with mask_classification=False (no class head, mask-only deep
    supervision)."""

    def __init__(self, hidden_dim, nheads, dim_ff, num_layers, num_queries,
                 mask_dim, num_levels=1):
        super().__init__()
        self.nheads = nheads
        self.num_layers = num_layers
        self.num_levels = num_levels
        self.query_feat = nn.Embedding(num_queries, hidden_dim)
        self.query_embed = nn.Embedding(num_queries, hidden_dim)
        self.level_embed = nn.Embedding(num_levels, hidden_dim)
        self.cross_attn = nn.ModuleList(
            [nn.MultiheadAttention(hidden_dim, nheads) for _ in range(num_layers)])
        self.cross_norm = nn.ModuleList([nn.LayerNorm(hidden_dim) for _ in range(num_layers)])
        self.self_attn = nn.ModuleList(
            [nn.MultiheadAttention(hidden_dim, nheads) for _ in range(num_layers)])
        self.self_norm = nn.ModuleList([nn.LayerNorm(hidden_dim) for _ in range(num_layers)])
        self.ffn1 = nn.ModuleList([nn.Linear(hidden_dim, dim_ff) for _ in range(num_layers)])
        self.ffn2 = nn.ModuleList([nn.Linear(dim_ff, hidden_dim) for _ in range(num_layers)])
        self.ffn_norm = nn.ModuleList([nn.LayerNorm(hidden_dim) for _ in range(num_layers)])
        self.decoder_norm = nn.LayerNorm(hidden_dim)
        self.mask_mlp = nn.ModuleList([
            nn.Linear(hidden_dim, hidden_dim), nn.Linear(hidden_dim, hidden_dim),
            nn.Linear(hidden_dim, mask_dim)])

    def mask_embed(self, x):
        x = F.relu(self.mask_mlp[0](x))
        x = F.relu(self.mask_mlp[1](x))
        return self.mask_mlp[2](x)

    def pred_heads(self, output, mask_features, size):
        dec = self.decoder_norm(output).transpose(0, 1)
        me = self.mask_embed(dec)
        masks = torch.einsum("bqc,bchw->bqhw", me, mask_features)
        am = F.interpolate(masks, size=size, mode="bilinear", align_corners=False)
        am = (am.sigmoid().flatten(2).unsqueeze(1).repeat(1, self.nheads, 1, 1)
              .flatten(0, 1) < 0.5).bool().detach()
        return masks, am

    def forward(self, feats, pos_embeds, mask_features):
        srcs, poss, sizes = [], [], []
        for i, (f, pe) in enumerate(zip(feats, pos_embeds)):
            sizes.append(f.shape[-2:])
            poss.append(pe.flatten(2).permute(2, 0, 1))
            srcs.append(f.flatten(2).permute(2, 0, 1) + self.level_embed.weight[i][None, None])
        bs = feats[0].shape[0]
        qe = self.query_embed.weight.unsqueeze(1).repeat(1, bs, 1)
        out = self.query_feat.weight.unsqueeze(1).repeat(1, bs, 1)
        mask_list = []
        masks, am = self.pred_heads(out, mask_features, sizes[0])
        mask_list.append(masks)
        for i in range(self.num_layers):
            lvl = i % self.num_levels
            am[torch.where(am.sum(-1) == am.shape[-1])] = False
            y = self.cross_attn[i](query=out + qe, key=srcs[lvl] + poss[lvl],
                                   value=srcs[lvl], attn_mask=am)[0]
            out = self.cross_norm[i](out + y)
            q = out + qe
            y = self.self_attn[i](query=q, key=q, value=out)[0]
            out = self.self_norm[i](out + y)
            y = self.ffn2[i](F.relu(self.ffn1[i](out)))
            out = self.ffn_norm[i](out + y)
            masks, am = self.pred_heads(out, mask_features, sizes[(i + 1) % self.num_levels])
            mask_list.append(masks)
        return mask_list


class TorchSimpleDecoder(nn.Module):
    """SimpleTransformerDecoder semantics: one masked cross-attention of the
    queries over the stride-4 mask features, prediction heads before/after;
    no fully-blocked-row fix, empty aux outputs."""

    def __init__(self, hidden_dim, nheads, num_queries, num_classes, mask_dim):
        super().__init__()
        self.nheads = nheads
        self.query_feat = nn.Embedding(num_queries, hidden_dim)
        self.query_embed = nn.Embedding(num_queries, hidden_dim)
        self.cross_attn = nn.MultiheadAttention(hidden_dim, nheads)
        self.cross_norm = nn.LayerNorm(hidden_dim)
        self.decoder_norm = nn.LayerNorm(hidden_dim)
        self.class_embed = nn.Linear(hidden_dim, num_classes + 1)
        self.mask_mlp = nn.ModuleList([
            nn.Linear(hidden_dim, hidden_dim), nn.Linear(hidden_dim, hidden_dim),
            nn.Linear(hidden_dim, mask_dim)])

    def mask_embed(self, x):
        x = F.relu(self.mask_mlp[0](x))
        x = F.relu(self.mask_mlp[1](x))
        return self.mask_mlp[2](x)

    def pred_heads(self, output, mask_features, size):
        dec = self.decoder_norm(output).transpose(0, 1)
        cls = self.class_embed(dec)
        me = self.mask_embed(dec)
        masks = torch.einsum("bqc,bchw->bqhw", me, mask_features)
        am = F.interpolate(masks, size=size, mode="bilinear", align_corners=False)
        am = (am.sigmoid().flatten(2).unsqueeze(1).repeat(1, self.nheads, 1, 1)
              .flatten(0, 1) < 0.5).bool().detach()
        return cls, masks, am

    def forward(self, mask_features, pos):
        bs = mask_features.shape[0]
        size = mask_features.shape[-2:]
        qe = self.query_embed.weight.unsqueeze(1).repeat(1, bs, 1)
        out = self.query_feat.weight.unsqueeze(1).repeat(1, bs, 1)
        _, _, am = self.pred_heads(out, mask_features, size)
        assert not (am.sum(-1) == am.shape[-1]).any(), \
            "test input produced a fully-blocked row (reference would NaN)"
        mf_vec = mask_features.flatten(2).permute(2, 0, 1)
        mf_pos = pos.flatten(2).permute(2, 0, 1)
        y = self.cross_attn(query=out + qe, key=mf_vec + mf_pos,
                            value=mf_vec, attn_mask=am)[0]
        out = self.cross_norm(out + y)
        cls, masks, _ = self.pred_heads(out, mask_features, size)
        return cls, masks


# ---------------------------------------------------------------------------
# torchvision-style ResNet (bottleneck) for the D2 ResNet backbone golden
# ---------------------------------------------------------------------------

class TorchBottleneck(nn.Module):
    def __init__(self, in_ch, bottleneck, out_ch, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, bottleneck, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(bottleneck)
        self.conv2 = nn.Conv2d(bottleneck, bottleneck, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(bottleneck)
        self.conv3 = nn.Conv2d(bottleneck, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(identity + y)


class TorchResNet(nn.Module):
    """torchvision ResNet naming (conv1/bn1/layer1..4) with bottleneck
    blocks and stride on the 3x3 conv (STRIDE_IN_1X1=False)."""

    def __init__(self, stage_blocks=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        in_ch = 64
        for i, n in enumerate(stage_blocks):
            bott = 64 * 2**i
            out_ch = 256 * 2**i
            blocks = []
            for b in range(n):
                stride = 2 if (b == 0 and i > 0) else 1
                blocks.append(TorchBottleneck(in_ch, bott, out_ch, stride))
                in_ch = out_ch
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(in_ch, 10)  # present in real ckpts; converter drops it

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        outs = {}
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
            outs[f"res{i + 1}"] = x
        return outs


class TorchPixelDecoderFull(nn.Module):
    """MSDeformAttnPixelDecoder at the released 1dl layout: one transformer
    level (res5) + 3 FPN laterals down to res2 (reference msdeformattn.py:
    adapter_1=res2 .. adapter_3=res4, forward top-down :350-367), GN(32)."""

    def __init__(self, in_ch, conv_dim=256, mask_dim=256, enc_layers=6, nheads=8,
                 npoints=4, ffn=1024, transformer_feature="res5",
                 fpn_features=("res4", "res3", "res2")):
        super().__init__()
        self.conv_dim = conv_dim
        self.transformer_feature = transformer_feature
        self.fpn_features = fpn_features
        self.input_proj_conv = nn.Conv2d(in_ch[transformer_feature], conv_dim, 1)
        self.input_proj_gn = nn.GroupNorm(32, conv_dim)
        self.level_embed = nn.Parameter(torch.randn(1, conv_dim))
        self.layers = nn.ModuleList([
            TorchDeformEncoderLayer(conv_dim, ffn, 1, nheads, npoints)
            for _ in range(enc_layers)
        ])
        # adapter_1 = highest-resolution feature (res2)
        self.adapters = nn.ModuleList()
        self.adapter_gns = nn.ModuleList()
        self.out_convs = nn.ModuleList()
        self.out_gns = nn.ModuleList()
        for f in reversed(fpn_features):  # res2 first = adapter_1
            self.adapters.append(nn.Conv2d(in_ch[f], conv_dim, 1, bias=False))
            self.adapter_gns.append(nn.GroupNorm(32, conv_dim))
            self.out_convs.append(nn.Conv2d(conv_dim, conv_dim, 3, padding=1, bias=False))
            self.out_gns.append(nn.GroupNorm(32, conv_dim))
        self.mask_features = nn.Conv2d(conv_dim, mask_dim, 1)

    def forward(self, feats):
        x = feats[self.transformer_feature].float()
        y = self.input_proj_gn(self.input_proj_conv(x))
        B, C, H, W = y.shape
        pos = torch_sine_pos_embed(H, W, C // 2).repeat(B, 1, 1, 1)
        src = y.flatten(2).transpose(1, 2)
        posf = pos.flatten(2).transpose(1, 2) + self.level_embed[0][None, None]
        ys, xs = torch.meshgrid(
            torch.linspace(0.5, H - 0.5, H) / H, torch.linspace(0.5, W - 0.5, W) / W,
            indexing="ij")
        ref = torch.stack([xs.reshape(-1), ys.reshape(-1)], -1)[None, :, None, :].repeat(B, 1, 1, 1)
        out = src
        for l in self.layers:
            out = l(out, posf, ref, [(H, W)])
        enc = out.transpose(1, 2).view(B, C, H, W)
        # top-down FPN: res4 -> res3 -> res2 (adapter index len..1)
        y = enc
        n = len(self.fpn_features)
        for i, f in enumerate(self.fpn_features):
            k = n - 1 - i  # module list index: res4 -> adapters[n-1] (adapter_n)
            lat = self.adapter_gns[k](self.adapters[k](feats[f].float()))
            up = F.interpolate(y, size=lat.shape[-2:], mode="bilinear", align_corners=False)
            y = F.relu(self.out_gns[k](self.out_convs[k](lat + up)))
        return self.mask_features(y), enc


class TorchStandardDecoder(nn.Module):
    """StandardTransformerDecoder re-derivation (paper / reference
    maskformer_transformer_decoder.py:30-165 + DETR transformer.py post-norm):
    optional encoder layers on the flattened input feature, decoder layers
    over learned queries with return-intermediate deep supervision, mask-embed
    MLP einsum against mask_features; ``num_classes=None`` disables the class
    head (the PerPixelBaselinePlusHead mode, mask_classification=False)."""

    def __init__(self, in_ch, hd, nh, ff, enc_layers, dec_layers, nq, md,
                 num_classes=None, normalize_before=False):
        super().__init__()
        self.hd, self.nh = hd, nh
        self.normalize_before = normalize_before
        # DETR transformer.py:37: pre-norm encoders end in a final LayerNorm
        self.encoder_norm = nn.LayerNorm(hd) if normalize_before else None
        self.input_proj = nn.Conv2d(in_ch, hd, 1)
        self.query_embed = nn.Embedding(nq, hd)
        self.enc_self = nn.ModuleList(nn.MultiheadAttention(hd, nh) for _ in range(enc_layers))
        self.enc_l1 = nn.ModuleList(nn.Linear(hd, ff) for _ in range(enc_layers))
        self.enc_l2 = nn.ModuleList(nn.Linear(ff, hd) for _ in range(enc_layers))
        self.enc_n1 = nn.ModuleList(nn.LayerNorm(hd) for _ in range(enc_layers))
        self.enc_n2 = nn.ModuleList(nn.LayerNorm(hd) for _ in range(enc_layers))
        self.dec_self = nn.ModuleList(nn.MultiheadAttention(hd, nh) for _ in range(dec_layers))
        self.dec_cross = nn.ModuleList(nn.MultiheadAttention(hd, nh) for _ in range(dec_layers))
        self.dec_l1 = nn.ModuleList(nn.Linear(hd, ff) for _ in range(dec_layers))
        self.dec_l2 = nn.ModuleList(nn.Linear(ff, hd) for _ in range(dec_layers))
        self.dec_n1 = nn.ModuleList(nn.LayerNorm(hd) for _ in range(dec_layers))
        self.dec_n2 = nn.ModuleList(nn.LayerNorm(hd) for _ in range(dec_layers))
        self.dec_n3 = nn.ModuleList(nn.LayerNorm(hd) for _ in range(dec_layers))
        self.decoder_norm = nn.LayerNorm(hd)
        self.class_embed = nn.Linear(hd, num_classes + 1) if num_classes else None
        self.mask_mlp = nn.ModuleList([nn.Linear(hd, hd), nn.Linear(hd, hd), nn.Linear(hd, md)])

    def _mlp(self, x):
        for i, l in enumerate(self.mask_mlp):
            x = F.relu(l(x)) if i < len(self.mask_mlp) - 1 else l(x)
        return x

    def forward(self, x, mask_features):
        B, C, H, W = x.shape
        pos = torch_sine_pos_embed(H, W, self.hd // 2).repeat(B, 1, 1, 1)
        pos = pos.flatten(2).permute(2, 0, 1)  # (HW, B, hd)
        src = self.input_proj(x).flatten(2).permute(2, 0, 1)
        for i in range(len(self.enc_self)):
            if self.normalize_before:  # DETR transformer.py forward_pre
                s2 = self.enc_n1[i](src)
                q = k = s2 + pos
                src = src + self.enc_self[i](q, k, value=s2)[0]
                s2 = self.enc_n2[i](src)
                src = src + self.enc_l2[i](F.relu(self.enc_l1[i](s2)))
            else:
                q = k = src + pos
                src2 = self.enc_self[i](q, k, value=src)[0]
                src = self.enc_n1[i](src + src2)
                src2 = self.enc_l2[i](F.relu(self.enc_l1[i](src)))
                src = self.enc_n2[i](src + src2)
        if self.encoder_norm is not None:
            src = self.encoder_norm(src)
        qe = self.query_embed.weight[:, None].repeat(1, B, 1)  # (Q, B, hd)
        tgt = torch.zeros_like(qe)
        inter = []
        for i in range(len(self.dec_self)):
            if self.normalize_before:  # DETR transformer.py forward_pre
                t2 = self.dec_n1[i](tgt)
                q = k = t2 + qe
                tgt = tgt + self.dec_self[i](q, k, value=t2)[0]
                t2 = self.dec_n2[i](tgt)
                tgt = tgt + self.dec_cross[i](t2 + qe, src + pos, value=src)[0]
                t2 = self.dec_n3[i](tgt)
                tgt = tgt + self.dec_l2[i](F.relu(self.dec_l1[i](t2)))
            else:
                q = k = tgt + qe
                t2 = self.dec_self[i](q, k, value=tgt)[0]
                tgt = self.dec_n1[i](tgt + t2)
                t2 = self.dec_cross[i](tgt + qe, src + pos, value=src)[0]
                tgt = self.dec_n2[i](tgt + t2)
                t2 = self.dec_l2[i](F.relu(self.dec_l1[i](tgt)))
                tgt = self.dec_n3[i](tgt + t2)
            inter.append(self.decoder_norm(tgt).transpose(0, 1))  # (B, Q, hd)
        masks = [torch.einsum("bqc,bchw->bqhw", self._mlp(h), mask_features) for h in inter]
        logits = [self.class_embed(h) for h in inter] if self.class_embed else None
        return masks, logits
