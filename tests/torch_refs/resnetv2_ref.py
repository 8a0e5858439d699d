"""Ground-truth PyTorch ResNetV2 / BiT (StdConv + GroupNorm, pre-activation)
for parity tests (timm naming)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class StdConv2d(nn.Conv2d):
    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), keepdim=True, unbiased=False)
        w = (w - mean) / torch.sqrt(var + 1e-8)
        return F.conv2d(x, w, self.bias, self.stride, self.padding)


class Downsample(nn.Module):
    def __init__(self, in_ch, out_ch, stride):
        super().__init__()
        self.conv = StdConv2d(in_ch, out_ch, 1, stride, bias=False)

    def forward(self, x):
        return self.conv(x)


def make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class PreActBottleneck(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1, downsample=False):
        super().__init__()
        mid = make_divisible(out_ch * 0.25)
        self.norm1 = nn.GroupNorm(1, in_ch)
        self.conv1 = StdConv2d(in_ch, mid, 1, bias=False)
        self.norm2 = nn.GroupNorm(1, mid)
        self.conv2 = StdConv2d(mid, mid, 3, stride, 1, bias=False)
        self.norm3 = nn.GroupNorm(1, mid)
        self.conv3 = StdConv2d(mid, out_ch, 1, bias=False)
        self.downsample = Downsample(in_ch, out_ch, stride) if downsample else None

    def forward(self, x):
        y = torch.relu(self.norm1(x))
        shortcut = self.downsample(y) if self.downsample is not None else x
        x = self.conv1(y)
        x = self.conv2(torch.relu(self.norm2(x)))
        x = self.conv3(torch.relu(self.norm3(x)))
        return x + shortcut


class TorchResNetV2(nn.Module):
    """Tiny preact BiT with 1-group GN (matches resnetv2 group_norm_1grp)."""

    def __init__(self, channels=(8, 16), depths=(1, 1), stem_width=8,
                 nb_classes=10):
        super().__init__()
        self.stem = nn.Sequential()
        self.stem.conv = StdConv2d(3, stem_width, 7, 2, 3, bias=False)
        in_ch = stem_width
        stages = []
        for j, (ch, depth) in enumerate(zip(channels, depths)):
            blocks = []
            for k in range(depth):
                stride = 2 if (j > 0 and k == 0) else 1
                blocks.append(PreActBottleneck(in_ch, ch, stride,
                                               downsample=(k == 0)))
                in_ch = ch
            stage = nn.Module()
            stage.blocks = nn.Sequential(*blocks)
            stages.append(stage)
        self.stages = nn.ModuleList(stages)
        self.norm = nn.GroupNorm(1, in_ch)
        self.head = nn.Sequential()
        self.head.fc = nn.Linear(in_ch, nb_classes)

    def forward(self, x):
        x = self.stem.conv(x)
        # timm's 'fixed' BiT stem zero-pads before the pool (ConstantPad2d
        # with value 0) — torch's implicit maxpool padding would pad -inf,
        # which differs wherever a border window is all-negative. Confirmed
        # against HF transformers BitModel (tests/fixtures/golden/hf_bit.npz).
        x = F.max_pool2d(F.pad(x, (1, 1, 1, 1), value=0.0), 3, 2, 0)
        for stage in self.stages:
            x = stage.blocks(x)
        x = torch.relu(self.norm(x))
        return self.head.fc(x.mean((2, 3)))
