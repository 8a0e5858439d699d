"""Ground-truth PyTorch hybrid ViT (non-preact ResNetV2 'same' backbone
feeding the patch projection), timm-style keys
(patch_embed.backbone.stem.conv / patch_embed.backbone.stages.N.blocks.M.* /
patch_embed.proj / blocks.N.*). Independent implementation for parity tests."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_refs.resnetv2_ref import make_divisible
from tests.torch_refs.vit_ref import Block


def _same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class StdConv2dSame(nn.Conv2d):
    def __init__(self, in_ch, out_ch, k, stride=1):
        super().__init__(in_ch, out_ch, k, stride, bias=False)

    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
        w = (w - mean) / torch.sqrt(var + 1e-8)
        x = _same_pad(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, None, self.stride)


class _Downsample(nn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        self.conv = StdConv2dSame(in_ch, out_ch, 1, stride)
        self.norm = nn.GroupNorm(32, out_ch)

    def forward(self, x):
        return self.norm(self.conv(x))


class _Bottleneck(nn.Module):
    """Non-preact (v1.5-style) bottleneck with StdConv + GroupNorm."""

    def __init__(self, in_ch, out_ch, stride=1, downsample=False):
        super().__init__()
        mid = make_divisible(out_ch * 0.25)
        self.conv1 = StdConv2dSame(in_ch, mid, 1)
        self.norm1 = nn.GroupNorm(32, mid)
        self.conv2 = StdConv2dSame(mid, mid, 3, stride)
        self.norm2 = nn.GroupNorm(32, mid)
        self.conv3 = StdConv2dSame(mid, out_ch, 1)
        self.norm3 = nn.GroupNorm(32, out_ch)
        self.downsample = _Downsample(in_ch, out_ch, stride) if downsample \
            else None

    def forward(self, x):
        shortcut = self.downsample(x) if self.downsample is not None else x
        y = torch.relu(self.norm1(self.conv1(x)))
        y = torch.relu(self.norm2(self.conv2(y)))
        y = self.norm3(self.conv3(y))
        return torch.relu(y + shortcut)


class _Stage(nn.Module):
    def __init__(self, in_ch, out_ch, depth, stride):
        super().__init__()
        self.blocks = nn.ModuleList([
            _Bottleneck(in_ch if k == 0 else out_ch, out_ch,
                        stride=stride if k == 0 else 1, downsample=(k == 0))
            for k in range(depth)
        ])

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        return x


class _Stem(nn.Module):
    def __init__(self, in_ch, width):
        super().__init__()
        self.conv = StdConv2dSame(in_ch, width, 7, 2)
        self.norm = nn.GroupNorm(32, width)

    def forward(self, x):
        x = torch.relu(self.norm(self.conv(x)))
        x = _same_pad(x, 3, 2)
        return F.max_pool2d(x, 3, 2)


class _Backbone(nn.Module):
    def __init__(self, depths=(1, 1), channels=(256, 512), stem_width=64,
                 in_chans=3):
        super().__init__()
        self.stem = _Stem(in_chans, stem_width)
        stages = []
        in_ch = stem_width
        for j, (d, c) in enumerate(zip(depths, channels)):
            stages.append(_Stage(in_ch, c, d, stride=1 if j == 0 else 2))
            in_ch = c
        self.stages = nn.ModuleList(stages)
        self.nb_features = in_ch

    def forward(self, x):
        x = self.stem(x)
        for stage in self.stages:
            x = stage(x)
        return x


class _HybridEmbed(nn.Module):
    def __init__(self, backbone, dim, patch_size=1):
        super().__init__()
        self.backbone = backbone
        self.proj = nn.Conv2d(backbone.nb_features, dim, patch_size,
                              stride=patch_size)

    def forward(self, x):
        x = self.proj(self.backbone(x))
        return x.flatten(2).transpose(1, 2)


class TorchViTHybrid(nn.Module):
    def __init__(self, input_size=32, depths=(1, 1), dim=8, depth=1,
                 nb_heads=2, nb_classes=10, in_chans=3):
        super().__init__()
        backbone = _Backbone(depths=depths, in_chans=in_chans)
        self.patch_embed = _HybridEmbed(backbone, dim)
        reduction = 4 * (2 ** (len(depths) - 1))
        nb_patches = (input_size // reduction) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(
            torch.randn(1, nb_patches + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [Block(dim, nb_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, nb_classes)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return self.head(x[:, 0])
