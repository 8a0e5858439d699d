"""Ground-truth PyTorch PVTv2 (and SRA) for parity tests (official naming)."""

import torch.nn as nn


class SRAttention(nn.Module):
    def __init__(self, dim, nb_heads, sr_ratio):
        super().__init__()
        self.nb_heads = nb_heads
        self.scale = (dim // nb_heads) ** -0.5
        self.sr_ratio = sr_ratio
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, dim * 2)
        self.proj = nn.Linear(dim, dim)
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, sr_ratio)
            self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, x, h, w):
        b, n, c = x.shape
        q = self.q(x).reshape(b, n, self.nb_heads, -1).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            kv_in = x.permute(0, 2, 1).reshape(b, c, h, w)
            kv_in = self.sr(kv_in).reshape(b, c, -1).permute(0, 2, 1)
            kv_in = self.norm(kv_in)
        else:
            kv_in = x
        kv = self.kv(kv_in).reshape(b, -1, 2, self.nb_heads, c // self.nb_heads)
        kv = kv.permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = ((q * self.scale) @ k.transpose(-2, -1)).softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class DWConv(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x, h, w):
        b, n, c = x.shape
        x = x.transpose(1, 2).view(b, c, h, w)
        x = self.dwconv(x)
        return x.flatten(2).transpose(1, 2)


class MlpV2(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = DWConv(hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, h, w):
        x = self.fc1(x)
        x = self.dwconv(x, h, w)
        return self.fc2(self.act(x))


class BlockV2(nn.Module):
    def __init__(self, dim, nb_heads, sr_ratio, mlp_ratio):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = SRAttention(dim, nb_heads, sr_ratio)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = MlpV2(dim, int(dim * mlp_ratio))

    def forward(self, x, h, w):
        x = x + self.attn(self.norm1(x), h, w)
        return x + self.mlp(self.norm2(x), h, w)


class OverlapPatchEmbed(nn.Module):
    def __init__(self, in_ch, dim, patch_size, stride):
        super().__init__()
        self.proj = nn.Conv2d(in_ch, dim, patch_size, stride, patch_size // 2)
        self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, x):
        x = self.proj(x)
        h, w = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)
        return self.norm(x), h, w


class TorchPVTv2(nn.Module):
    def __init__(self, dims=(8, 16), depths=(1, 1), heads=(1, 2),
                 sr=(4, 2), mlp_ratio=(2.0, 2.0), nb_classes=10):
        super().__init__()
        self.nb_stages = len(dims)
        in_ch = 3
        for j in range(self.nb_stages):
            setattr(self, f"patch_embed{j+1}",
                    OverlapPatchEmbed(in_ch, dims[j], 7 if j == 0 else 3,
                                      4 if j == 0 else 2))
            setattr(self, f"block{j+1}", nn.ModuleList([
                BlockV2(dims[j], heads[j], sr[j], mlp_ratio[j])
                for _ in range(depths[j])
            ]))
            setattr(self, f"norm{j+1}", nn.LayerNorm(dims[j], eps=1e-6))
            in_ch = dims[j]
        self.head = nn.Linear(dims[-1], nb_classes)

    def forward(self, x):
        b = x.shape[0]
        for j in range(self.nb_stages):
            x, h, w = getattr(self, f"patch_embed{j+1}")(x)
            for blk in getattr(self, f"block{j+1}"):
                x = blk(x, h, w)
            x = getattr(self, f"norm{j+1}")(x)
            if j < self.nb_stages - 1:
                x = x.transpose(1, 2).view(b, -1, h, w)
        return self.head(x.mean(dim=1))
