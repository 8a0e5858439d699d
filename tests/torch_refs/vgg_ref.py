"""Independent PyTorch VGG with timm-style state_dict keys
(features.N / pre_logits.fc1 / pre_logits.fc2 / head.fc), used as parity
ground truth. Written from the paper (arXiv:1409.1556), not copied."""

import torch.nn as nn


class _PreLogits(nn.Module):
    def __init__(self, in_ch, hidden, out_ch):
        super().__init__()
        self.fc1 = nn.Conv2d(in_ch, hidden, 7)
        self.act1 = nn.ReLU()
        self.fc2 = nn.Conv2d(hidden, out_ch, 1)
        self.act2 = nn.ReLU()

    def forward(self, x):
        return self.act2(self.fc2(self.act1(self.fc1(x))))


class _Head(nn.Module):
    def __init__(self, in_ch, nb_classes):
        super().__init__()
        self.fc = nn.Linear(in_ch, nb_classes)

    def forward(self, x):
        return self.fc(x.mean(dim=(2, 3)))


class TorchVGG(nn.Module):
    def __init__(self, layers=(4, "M", 4, "M"), nb_features=16,
                 nb_classes=10, in_chans=3):
        super().__init__()
        mods = []
        in_ch = in_chans
        for v in layers:
            if v == "M":
                mods.append(nn.MaxPool2d(2, 2))
            else:
                mods.append(nn.Conv2d(in_ch, v, 3, padding=1))
                mods.append(nn.ReLU())
                in_ch = v
        self.features = nn.Sequential(*mods)
        self.pre_logits = _PreLogits(in_ch, nb_features, nb_features)
        self.head = _Head(nb_features, nb_classes)

    def forward(self, x):
        return self.head(self.pre_logits(self.features(x)))
