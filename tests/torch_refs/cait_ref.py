"""Ground-truth PyTorch CaiT (talking-head + class attention) for parity tests."""

import torch
import torch.nn as nn


class TalkingHeadAttention(nn.Module):
    def __init__(self, dim, nb_heads):
        super().__init__()
        self.nb_heads = nb_heads
        self.scale = (dim // nb_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.proj_l = nn.Linear(nb_heads, nb_heads)
        self.proj_w = nn.Linear(nb_heads, nb_heads)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.nb_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        attn = self.proj_l(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        attn = attn.softmax(dim=-1)
        attn = self.proj_w(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class ClassAttention(nn.Module):
    def __init__(self, dim, nb_heads):
        super().__init__()
        self.nb_heads = nb_heads
        self.scale = (dim // nb_heads) ** -0.5
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        q = self.q(x[:, 0]).unsqueeze(1).reshape(b, 1, self.nb_heads, -1)
        q = q.permute(0, 2, 1, 3) * self.scale
        k = self.k(x).reshape(b, n, self.nb_heads, -1).permute(0, 2, 1, 3)
        v = self.v(x).reshape(b, n, self.nb_heads, -1).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        x_cls = (attn @ v).transpose(1, 2).reshape(b, 1, c)
        return self.proj(x_cls)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class SABlock(nn.Module):
    def __init__(self, dim, nb_heads, init_scale=1e-4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TalkingHeadAttention(dim, nb_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, dim * 4)
        self.gamma_1 = nn.Parameter(init_scale * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_scale * torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        x = x + self.gamma_2 * self.mlp(self.norm2(x))
        return x


class CABlock(nn.Module):
    def __init__(self, dim, nb_heads, init_scale=1e-4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = ClassAttention(dim, nb_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, dim * 4)
        self.gamma_1 = nn.Parameter(init_scale * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_scale * torch.ones(dim))

    def forward(self, x):
        x_cls = x[:, :1] + self.gamma_1 * self.attn(self.norm1(x))
        x_cls = x_cls + self.gamma_2 * self.mlp(self.norm2(x_cls))
        return torch.cat([x_cls, x[:, 1:]], dim=1)


class TorchCaiT(nn.Module):
    def __init__(self, input_size=64, patch_size=16, dim=32, depth=2,
                 nb_heads=2, nb_classes=10):
        super().__init__()
        nb_patches = (input_size // patch_size) ** 2
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch_size, patch_size)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, nb_patches, dim) * 0.02)
        self.blocks = nn.ModuleList([SABlock(dim, nb_heads) for _ in range(depth)])
        self.blocks_token_only = nn.ModuleList(
            [CABlock(dim, nb_heads) for _ in range(2)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, nb_classes)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], dim=1)
        for blk in self.blocks_token_only:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])
