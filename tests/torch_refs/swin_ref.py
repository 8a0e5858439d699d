"""Ground-truth PyTorch Swin Transformer for parity tests (timm naming).
Independent implementation of the paper's shifted-window attention."""

import numpy as np
import torch
import torch.nn as nn


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c)


def window_reverse(windows, ws, h, w):
    c = windows.shape[-1]
    x = windows.view(-1, h // ws, w // ws, ws, ws, c).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


class WindowAttention(nn.Module):
    def __init__(self, dim, nb_heads, ws):
        super().__init__()
        self.nb_heads = nb_heads
        self.ws = ws
        self.scale = (dim // nb_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, nb_heads) * 0.02
        )
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
        flat = coords.reshape(2, -1)
        rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index",
                             torch.from_numpy(rel.sum(-1)).long())

    def forward(self, x, mask=None):
        bw, n, c = x.shape
        qkv = self.qkv(x).reshape(bw, n, 3, self.nb_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(-1, nw, self.nb_heads, n, n) + mask[None, :, None]
            attn = attn.view(-1, self.nb_heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(bw, n, c)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class SwinBlock(nn.Module):
    def __init__(self, dim, input_size, nb_heads, ws, shift):
        super().__init__()
        self.input_size = input_size
        if min(input_size) <= ws:  # window covers input: no shift needed
            ws = min(input_size)
            shift = 0
        self.ws = ws
        self.shift = shift
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = WindowAttention(dim, nb_heads, ws)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = Mlp(dim, dim * 4)
        if shift > 0:
            h, w = input_size
            img_mask = torch.zeros(1, h, w, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(img_mask, ws).view(-1, ws * ws)
            attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0)
            self.register_buffer("attn_mask", attn_mask)
        else:
            self.attn_mask = None

    def forward(self, x):
        h, w = self.input_size
        b, l, c = x.shape
        sc = x
        x = self.norm1(x).view(b, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        windows = window_partition(x, self.ws).view(-1, self.ws * self.ws, c)
        x = self.attn(windows, self.attn_mask).view(-1, self.ws, self.ws, c)
        x = window_reverse(x, self.ws, h, w)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = sc + x.reshape(b, l, c)
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim, eps=1e-5)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, h, w):
        b, l, c = x.shape
        x = x.view(b, h, w, c)
        x = torch.cat([x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
                       x[:, 1::2, 1::2]], -1)
        x = x.view(b, -1, 4 * c)
        return self.reduction(self.norm(x))


class Stage(nn.Module):
    def __init__(self, dim, input_size, depth, nb_heads, ws, downsample):
        super().__init__()
        self.input_size = input_size
        self.blocks = nn.ModuleList([
            SwinBlock(dim, input_size, nb_heads, ws,
                      shift=0 if i % 2 == 0 else ws // 2)
            for i in range(depth)
        ])
        self.downsample = PatchMerging(dim) if downsample else None

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        if self.downsample is not None:
            x = self.downsample(x, *self.input_size)
        return x


class TorchSwin(nn.Module):
    def __init__(self, input_size=32, patch_size=4, dim=16, depths=(2, 2),
                 nb_heads=(2, 4), ws=4, nb_classes=10):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch_size, patch_size)
        self.patch_embed.norm = nn.LayerNorm(dim, eps=1e-5)
        res = input_size // patch_size
        self.layers = nn.ModuleList([
            Stage(dim * 2 ** i, (res // 2 ** i, res // 2 ** i), depths[i],
                  nb_heads[i], ws, downsample=i < len(depths) - 1)
            for i in range(len(depths))
        ])
        out_dim = dim * 2 ** (len(depths) - 1)
        self.norm = nn.LayerNorm(out_dim, eps=1e-5)
        self.head = nn.Linear(out_dim, nb_classes)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        for layer in self.layers:
            x = layer(x)
        x = self.norm(x).mean(1)
        return self.head(x)
