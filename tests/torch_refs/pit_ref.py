"""Ground-truth PyTorch PiT (conv head pooling + ViT blocks) for parity tests."""

import torch
import torch.nn as nn

from tests.torch_refs.vit_ref import Block


class ConvHeadPooling(nn.Module):
    def __init__(self, in_ch, out_ch, stride=2, nb_tokens=1):
        super().__init__()
        self.nb_tokens = nb_tokens
        self.conv = nn.Conv2d(in_ch, out_ch, stride + 1, stride, stride // 2,
                              groups=in_ch)
        self.fc = nn.Linear(in_ch, out_ch)

    def forward(self, x, hw):
        b, n, c = x.shape
        tokens = self.fc(x[:, :self.nb_tokens])
        grid = x[:, self.nb_tokens:].transpose(1, 2).reshape(b, c, *hw)
        grid = self.conv(grid)
        out_hw = grid.shape[2:]
        grid = grid.flatten(2).transpose(1, 2)
        return torch.cat([tokens, grid], dim=1), out_hw


class TorchPiT(nn.Module):
    def __init__(self, input_size=32, patch_size=4, stride=4, dims=(8, 16),
                 depths=(1, 1), heads=(2, 2), nb_classes=10):
        super().__init__()
        grid = (input_size - patch_size) // stride + 1
        self.patch_embed = nn.Module()
        self.patch_embed.conv = nn.Conv2d(3, dims[0], patch_size, stride)
        self.pos_embed = nn.Parameter(torch.randn(1, dims[0], grid, grid) * 0.02)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dims[0]) * 0.02)
        self.transformers = nn.ModuleList()
        for j, (d, dep, h) in enumerate(zip(dims, depths, heads)):
            stage = nn.Module()
            stage.blocks = nn.ModuleList([Block(d, h) for _ in range(dep)])
            if j > 0:
                stage.pool = ConvHeadPooling(dims[j - 1], d)
            self.transformers.append(stage)
        self.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.head = nn.Linear(dims[-1], nb_classes)

    def forward(self, x):
        x = self.patch_embed.conv(x) + self.pos_embed
        b, c, h, w = x.shape
        hw = (h, w)
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        for j, stage in enumerate(self.transformers):
            if j > 0:
                x, hw = stage.pool(x, hw)
            for blk in stage.blocks:
                x = blk(x)
        x = self.norm(x[:, :1])
        return self.head(x[:, 0])
