"""Ground-truth PyTorch EfficientNet-style blocks (IR/DS/ER + SE) with timm
state_dict naming, for converter/parity tests."""

import torch
import torch.nn as nn


class SqueezeExcite(nn.Module):
    def __init__(self, channels, rd_channels):
        super().__init__()
        self.conv_reduce = nn.Conv2d(channels, rd_channels, 1)
        self.conv_expand = nn.Conv2d(rd_channels, channels, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(torch.nn.functional.silu(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class DepthwiseSeparable(nn.Module):
    def __init__(self, in_ch, out_ch, se_rd):
        super().__init__()
        self.conv_dw = nn.Conv2d(in_ch, in_ch, 3, 1, 1, groups=in_ch, bias=False)
        self.bn1 = nn.BatchNorm2d(in_ch)
        self.se = SqueezeExcite(in_ch, se_rd)
        self.conv_pw = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        sc = x
        x = torch.nn.functional.silu(self.bn1(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn2(self.conv_pw(x))
        if x.shape == sc.shape:
            x = x + sc
        return x


class InvertedResidual(nn.Module):
    def __init__(self, in_ch, out_ch, stride, exp, se_rd, k=3):
        super().__init__()
        mid = in_ch * exp
        self.conv_pw = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_dw = nn.Conv2d(mid, mid, k, stride, k // 2, groups=mid,
                                 bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.se = SqueezeExcite(mid, se_rd)
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.has_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        sc = x
        x = torch.nn.functional.silu(self.bn1(self.conv_pw(x)))
        x = torch.nn.functional.silu(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        if self.has_skip:
            x = x + sc
        return x


class EdgeResidual(nn.Module):
    def __init__(self, in_ch, out_ch, stride, exp):
        super().__init__()
        mid = in_ch * exp
        self.conv_exp = nn.Conv2d(in_ch, mid, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.has_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        sc = x
        x = torch.nn.functional.silu(self.bn1(self.conv_exp(x)))
        x = self.bn2(self.conv_pwl(x))
        if self.has_skip:
            x = x + sc
        return x


class TorchEfficientNet(nn.Module):
    """Matches our test config:
    arch = (("ds_r1_k3_s1_e1_c8_se0.25",), ("ir_r1_k3_s2_e4_c16_se0.25",),
            ("er_r1_k3_s2_e4_c16",)), stem 8, head 32, symmetric padding."""

    def __init__(self, nb_classes=10):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 8, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(8)
        self.blocks = nn.Sequential(
            nn.Sequential(DepthwiseSeparable(8, 8, se_rd=2)),
            nn.Sequential(InvertedResidual(8, 16, 2, 4, se_rd=2)),
            nn.Sequential(EdgeResidual(16, 16, 2, 4)),
        )
        self.conv_head = nn.Conv2d(16, 32, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(32)
        self.classifier = nn.Linear(32, nb_classes)

    def forward(self, x):
        x = torch.nn.functional.silu(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = torch.nn.functional.silu(self.bn2(self.conv_head(x)))
        return self.classifier(x.mean((2, 3)))


# -- TF-SAME-padding variants (the `tf_` parity trap, SURVEY.md §7) -------------

def _pad_same(x, k, s, d=(1, 1)):
    """TF/XLA 'SAME' padding: total pad per dim = max((ceil(i/s)-1)*s +
    (k-1)*d + 1 - i, 0), split low = total // 2 (extra on bottom/right).
    Mirrors timm's conv2d_same / reference tfimm/layers/conv.py:15-28."""
    ih, iw = x.shape[-2:]
    pads = []
    for i, kk, ss, dd in ((iw, k[1], s[1], d[1]), (ih, k[0], s[0], d[0])):
        total = max((-(-i // ss) - 1) * ss + (kk - 1) * dd + 1 - i, 0)
        pads += [total // 2, total - total // 2]
    return torch.nn.functional.pad(x, pads)


class Conv2dSame(nn.Conv2d):
    def __init__(self, in_ch, out_ch, k, stride=1, groups=1, bias=False):
        super().__init__(in_ch, out_ch, k, stride, 0, groups=groups, bias=bias)

    def forward(self, x):
        x = _pad_same(x, self.kernel_size, self.stride, self.dilation)
        return torch.nn.functional.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation,
            self.groups)


class DepthwiseSeparableTF(nn.Module):
    def __init__(self, in_ch, out_ch, se_rd, stride=1):
        super().__init__()
        self.conv_dw = Conv2dSame(in_ch, in_ch, 3, stride, groups=in_ch)
        self.bn1 = nn.BatchNorm2d(in_ch, eps=1e-3)
        self.se = SqueezeExcite(in_ch, se_rd)
        self.conv_pw = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        sc = x
        x = torch.nn.functional.silu(self.bn1(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn2(self.conv_pw(x))
        if self.has_skip:
            x = x + sc
        return x


class InvertedResidualTF(nn.Module):
    def __init__(self, in_ch, out_ch, stride, exp, se_rd, k=3):
        super().__init__()
        mid = in_ch * exp
        self.conv_pw = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_dw = Conv2dSame(mid, mid, k, stride, groups=mid)
        self.bn2 = nn.BatchNorm2d(mid, eps=1e-3)
        self.se = SqueezeExcite(mid, se_rd)
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        sc = x
        x = torch.nn.functional.silu(self.bn1(self.conv_pw(x)))
        x = torch.nn.functional.silu(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        if self.has_skip:
            x = x + sc
        return x


class EdgeResidualTF(nn.Module):
    def __init__(self, in_ch, out_ch, stride, exp):
        super().__init__()
        mid = in_ch * exp
        self.conv_exp = Conv2dSame(in_ch, mid, 3, stride)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch, eps=1e-3)
        self.has_skip = stride == 1 and in_ch == out_ch

    def forward(self, x):
        sc = x
        x = torch.nn.functional.silu(self.bn1(self.conv_exp(x)))
        x = self.bn2(self.conv_pwl(x))
        if self.has_skip:
            x = x + sc
        return x


class TorchEfficientNetTF(nn.Module):
    """TF-SAME-padding mirror of TorchEfficientNet: asymmetric SAME pads on
    every spatial conv (stem + stride-2 dwconv + stride-2 edge conv — the
    asymmetric cases) and BN eps 1e-3, matching timm `tf_` variants."""

    def __init__(self, nb_classes=10):
        super().__init__()
        self.conv_stem = Conv2dSame(3, 8, 3, 2)
        self.bn1 = nn.BatchNorm2d(8, eps=1e-3)
        self.blocks = nn.Sequential(
            nn.Sequential(DepthwiseSeparableTF(8, 8, se_rd=2)),
            nn.Sequential(InvertedResidualTF(8, 16, 2, 4, se_rd=2)),
            nn.Sequential(EdgeResidualTF(16, 16, 2, 4)),
        )
        self.conv_head = nn.Conv2d(16, 32, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(32, eps=1e-3)
        self.classifier = nn.Linear(32, nb_classes)

    def forward(self, x):
        x = torch.nn.functional.silu(self.bn1(self.conv_stem(x)))
        x = self.blocks(x)
        x = torch.nn.functional.silu(self.bn2(self.conv_head(x)))
        return self.classifier(x.mean((2, 3)))
