"""Ground-truth PyTorch PoolFormer for parity tests (official-checkpoint naming)."""

import torch
import torch.nn as nn


class GroupNorm1(nn.GroupNorm):
    def __init__(self, dim):
        super().__init__(1, dim)


class Block(nn.Module):
    def __init__(self, dim, mlp_ratio=4.0, init_scale=1e-5):
        super().__init__()
        self.norm1 = GroupNorm1(dim)
        self.pool = nn.AvgPool2d(3, 1, 1, count_include_pad=False)
        self.norm2 = GroupNorm1(dim)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Conv2d(dim, int(dim * mlp_ratio), 1)
        self.mlp.act = nn.GELU()
        self.mlp.fc2 = nn.Conv2d(int(dim * mlp_ratio), dim, 1)
        self.layer_scale_1 = nn.Parameter(init_scale * torch.ones(dim))
        self.layer_scale_2 = nn.Parameter(init_scale * torch.ones(dim))

    def forward(self, x):
        y = self.norm1(x)
        y = self.pool(y) - y
        x = x + self.layer_scale_1.view(1, -1, 1, 1) * y
        y = self.mlp.fc2(self.mlp.act(self.mlp.fc1(self.norm2(x))))
        return x + self.layer_scale_2.view(1, -1, 1, 1) * y


class Downsample(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.proj = nn.Conv2d(in_dim, out_dim, 3, 2, 1)

    def forward(self, x):
        return self.proj(x)


class TorchPoolFormer(nn.Module):
    def __init__(self, dims=(16, 32), depths=(1, 1), nb_classes=10):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, dims[0], 7, 4, 2)
        network = []
        for j, (d, n) in enumerate(zip(dims, depths)):
            network.append(nn.Sequential(*[Block(d) for _ in range(n)]))
            if j < len(dims) - 1:
                network.append(Downsample(dims[j], dims[j + 1]))
        self.network = nn.ModuleList(network)
        self.norm = GroupNorm1(dims[-1])
        self.head = nn.Linear(dims[-1], nb_classes)

    def forward(self, x):
        x = self.patch_embed.proj(x)
        for m in self.network:
            x = m(x)
        x = self.norm(x)
        return self.head(x.mean((2, 3)))
