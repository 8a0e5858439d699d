"""Ground-truth PyTorch ConvNeXt for converter/parity tests (independent
implementation of the paper with timm state_dict naming)."""

import torch
import torch.nn as nn


class Block(nn.Module):
    def __init__(self, dim, mlp_ratio=4.0, init_scale=1e-6):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.act = nn.GELU()
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.gamma = nn.Parameter(init_scale * torch.ones(dim))

    def forward(self, x):
        sc = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)  # NCHW -> NHWC
        x = self.norm(x)
        x = self.mlp.fc2(self.mlp.act(self.mlp.fc1(x)))
        x = self.gamma * x
        return sc + x.permute(0, 3, 1, 2)


class Stage(nn.Module):
    def __init__(self, in_dim, dim, depth, stride):
        super().__init__()
        if stride > 1:
            self.downsample = nn.Sequential(
                _ChannelsLastLN(in_dim), nn.Conv2d(in_dim, dim, stride, stride)
            )
        else:
            self.downsample = nn.Identity()
        self.blocks = nn.Sequential(*[Block(dim) for _ in range(depth)])

    def forward(self, x):
        return self.blocks(self.downsample(x))


class _ChannelsLastLN(nn.LayerNorm):
    def __init__(self, dim):
        super().__init__(dim, eps=1e-6)

    def forward(self, x):
        return super().forward(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


class TorchConvNeXt(nn.Module):
    def __init__(self, dims=(16, 32, 64, 128), depths=(1, 1, 2, 1),
                 nb_classes=10, patch_size=4):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], patch_size, patch_size),
            _ChannelsLastLN(dims[0]),
        )
        self.stages = nn.Sequential(*[
            Stage(dims[max(i - 1, 0)], dims[i], depths[i],
                  stride=1 if i == 0 else 2)
            for i in range(len(dims))
        ])
        self.head = nn.Sequential()
        self.head.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.head.fc = nn.Linear(dims[-1], nb_classes)

    def forward(self, x):
        x = self.stages(self.stem(x))
        x = x.mean((2, 3))
        return self.head.fc(self.head.norm(x))
