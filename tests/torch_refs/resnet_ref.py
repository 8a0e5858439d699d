"""Ground-truth PyTorch ResNet for converter/parity tests (independent
implementation of the ResNet paper with timm/torchvision state_dict naming)."""

import torch
import torch.nn as nn


class SE(nn.Module):
    def __init__(self, channels, rd_channels):
        super().__init__()
        self.fc1 = nn.Conv2d(channels, rd_channels, 1)
        self.fc2 = nn.Conv2d(rd_channels, channels, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.fc2(torch.relu(self.fc1(s)))
        return x * torch.sigmoid(s)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, in_ch, ch, stride=1, downsample=None, se=False):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, ch, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)
        self.se = SE(ch, max(ch // 16, 8)) if se else None
        self.downsample = downsample

    def forward(self, x):
        sc = x
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.bn2(self.conv2(x))
        if self.se is not None:
            x = self.se(x)
        if self.downsample is not None:
            sc = self.downsample(sc)
        return torch.relu(x + sc)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, in_ch, ch, stride=1, downsample=None, groups=1,
                 base_width=64, se=False):
        super().__init__()
        width = int(ch * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(in_ch, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, ch * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(ch * 4)
        self.se = SE(ch * 4, max(ch * 4 // 16, 8)) if se else None
        self.downsample = downsample

    def forward(self, x):
        sc = x
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.bn3(self.conv3(x))
        if self.se is not None:
            x = self.se(x)
        if self.downsample is not None:
            sc = self.downsample(sc)
        return torch.relu(x + sc)


class TorchResNet(nn.Module):
    """Plain stem + 4 stages; conv or avg downsample; timm-style names."""

    def __init__(self, block, layers, nb_classes=1000, groups=1, base_width=64,
                 downsample_mode="conv", se=False):
        super().__init__()
        self.in_ch = 64
        self.groups, self.base_width, self.se = groups, base_width, se
        self.downsample_mode = downsample_mode
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0], 1)
        self.layer2 = self._make_layer(block, 128, layers[1], 2)
        self.layer3 = self._make_layer(block, 256, layers[2], 2)
        self.layer4 = self._make_layer(block, 512, layers[3], 2)
        self.fc = nn.Linear(512 * block.expansion, nb_classes)

    def _make_layer(self, block, ch, blocks, stride):
        downsample = None
        if stride != 1 or self.in_ch != ch * block.expansion:
            if self.downsample_mode == "avg":
                pool = (nn.AvgPool2d(2, stride, ceil_mode=True,
                                     count_include_pad=False)
                        if stride != 1 else nn.Identity())
                downsample = nn.Sequential(
                    pool,
                    nn.Conv2d(self.in_ch, ch * block.expansion, 1, bias=False),
                    nn.BatchNorm2d(ch * block.expansion),
                )
            else:
                downsample = nn.Sequential(
                    nn.Conv2d(self.in_ch, ch * block.expansion, 1, stride,
                              bias=False),
                    nn.BatchNorm2d(ch * block.expansion),
                )
        kwargs = dict(se=self.se)
        if block is Bottleneck:
            kwargs.update(groups=self.groups, base_width=self.base_width)
        layers = [block(self.in_ch, ch, stride, downsample, **kwargs)]
        self.in_ch = ch * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.in_ch, ch, **kwargs))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(x.mean((2, 3)))
