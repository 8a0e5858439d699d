"""Independent PyTorch ConvMixer with timm-style state_dict keys
(stem.0 / stem.2 / blocks.N.0.fn.{0,2} / blocks.N.{1,3} / head), used as
parity ground truth. Written from the paper (arXiv:2201.09792), not copied."""

import torch.nn as nn


class Residual(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


class TorchConvMixer(nn.Module):
    def __init__(self, dim=8, depth=2, kernel_size=3, patch_size=8,
                 nb_classes=10, in_chans=3):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(in_chans, dim, patch_size, stride=patch_size),
            nn.GELU(),
            nn.BatchNorm2d(dim),
        )
        self.blocks = nn.Sequential(*[
            nn.Sequential(
                Residual(nn.Sequential(
                    nn.Conv2d(dim, dim, kernel_size, groups=dim,
                              padding="same"),
                    nn.GELU(),
                    nn.BatchNorm2d(dim),
                )),
                nn.Conv2d(dim, dim, 1),
                nn.GELU(),
                nn.BatchNorm2d(dim),
            )
            for _ in range(depth)
        ])
        self.head = nn.Linear(dim, nb_classes)

    def forward(self, x):
        x = self.stem(x)
        x = self.blocks(x)
        x = x.mean(dim=(2, 3))
        return self.head(x)
