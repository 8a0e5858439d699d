"""Ground-truth PyTorch ViT for converter/parity tests.

timm is not available in this environment, so this is an independent PyTorch
implementation following the ViT paper, with module names chosen to produce
timm-style state_dict keys (patch_embed.proj / blocks.N.attn.qkv / ...). It
plays the role the timm package plays in the reference's parity harness
(tests/test_timm.py:38-71).
"""

import torch
import torch.nn as nn


class Attention(nn.Module):
    def __init__(self, dim, nb_heads, qkv_bias=True):
        super().__init__()
        self.nb_heads = nb_heads
        self.head_dim = dim // nb_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.nb_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, nb_heads, mlp_ratio=4.0, qkv_bias=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, nb_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class PatchEmbed(nn.Module):
    def __init__(self, patch_size, in_channels, dim):
        super().__init__()
        self.proj = nn.Conv2d(in_channels, dim, patch_size, stride=patch_size)

    def forward(self, x):
        x = self.proj(x)
        return x.flatten(2).transpose(1, 2)


class TorchViT(nn.Module):
    def __init__(self, input_size=224, patch_size=16, in_channels=3, dim=192,
                 depth=12, nb_heads=3, nb_classes=1000, mlp_ratio=4.0,
                 qkv_bias=True, distilled=False):
        super().__init__()
        self.distilled = distilled
        nb_patches = (input_size // patch_size) ** 2
        nb_tokens = 2 if distilled else 1
        self.patch_embed = PatchEmbed(patch_size, in_channels, dim)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        if distilled:
            self.dist_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, nb_patches + nb_tokens, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [Block(dim, nb_heads, mlp_ratio, qkv_bias) for _ in range(depth)]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, nb_classes)
        if distilled:
            self.head_dist = nn.Linear(dim, nb_classes)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        tokens = [self.cls_token.expand(b, -1, -1)]
        if self.distilled:
            tokens.append(self.dist_token.expand(b, -1, -1))
        x = torch.cat(tokens + [x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        if self.distilled:
            return torch.stack(
                [self.head(x[:, 0]), self.head_dist(x[:, 1])], dim=1
            )
        return self.head(x[:, 0])
