"""Ground-truth PyTorch MLP-Mixer / gMLP for converter/parity tests
(independent implementation with timm state_dict naming)."""

import torch.nn as nn


class Mlp(nn.Module):
    def __init__(self, dim, hidden, out=None):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, out or dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class MixerBlock(nn.Module):
    def __init__(self, dim, seq_len, tokens_dim, channels_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp_tokens = Mlp(seq_len, tokens_dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp_channels = Mlp(dim, channels_dim)

    def forward(self, x):
        x = x + self.mlp_tokens(self.norm1(x).transpose(1, 2)).transpose(1, 2)
        x = x + self.mlp_channels(self.norm2(x))
        return x


class SpatialGatingUnit(nn.Module):
    def __init__(self, dim, seq_len):
        super().__init__()
        self.norm = nn.LayerNorm(dim // 2, eps=1e-5)
        self.proj = nn.Linear(seq_len, seq_len)

    def forward(self, x):
        u, v = x.chunk(2, dim=-1)
        v = self.norm(v)
        v = self.proj(v.transpose(-1, -2)).transpose(-1, -2)
        return u * v


class GatedMlp(nn.Module):
    def __init__(self, dim, hidden, seq_len):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.gate = SpatialGatingUnit(hidden, seq_len)
        self.fc2 = nn.Linear(hidden // 2, dim)

    def forward(self, x):
        return self.fc2(self.gate(self.act(self.fc1(x))))


class SpatialGatingBlock(nn.Module):
    def __init__(self, dim, seq_len, hidden):
        super().__init__()
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp_channels = GatedMlp(dim, hidden, seq_len)

    def forward(self, x):
        return x + self.mlp_channels(self.norm(x))


class PatchEmbed(nn.Module):
    def __init__(self, patch_size, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch_size, patch_size)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class TorchMixer(nn.Module):
    def __init__(self, input_size=64, patch_size=8, dim=32, depth=2,
                 nb_classes=10, block="mixer"):
        super().__init__()
        seq_len = (input_size // patch_size) ** 2
        self.stem = PatchEmbed(patch_size, dim)
        if block == "mixer":
            blocks = [MixerBlock(dim, seq_len, dim // 2, dim * 4)
                      for _ in range(depth)]
        else:  # gmlp
            blocks = [SpatialGatingBlock(dim, seq_len, dim * 6)
                      for _ in range(depth)]
        self.blocks = nn.Sequential(*blocks)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, nb_classes)

    def forward(self, x):
        x = self.blocks(self.stem(x))
        x = self.norm(x).mean(dim=1)
        return self.head(x)
