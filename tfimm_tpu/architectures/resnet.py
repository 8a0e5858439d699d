"""ResNet / ResNeXt / SE-ResNeXt / ECA-ResNet / ResNet-RS / Wide-ResNet.

TPU-native re-implementation of the reference family
(tfimm/architectures/resnet.py:55-600): config-driven basic/bottleneck blocks,
cardinality/base_width (ResNeXt), se/eca channel attention, blur-pool
anti-aliasing, deep/tiered stems, conv/avg downsampling, replace_stem_pool
(ResNet-RS). Parameter paths mirror timm (conv1 / layer1.0.conv1 /
downsample.0 / fc) for mechanical checkpoint conversion.

Papers: ResNet https://arxiv.org/abs/1512.03385, ResNeXt 1611.05431,
SE 1709.01507, ECA 1910.03151, ResNet-RS 2103.07579.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tfimm_tpu.core import capture_feature
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import (
    BlurPool2d,
    Conv2d,
    Dense,
    act_layer_factory,
    attn_layer_factory,
    global_pool_2d,
    norm_layer_factory,
)
from tfimm_tpu.ops.pool import avg_pool_2d
from tfimm_tpu.ops.stochastic import drop_path, dropout
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["ResNet", "ResNetConfig", "BasicBlock", "Bottleneck"]


@dataclass
class ResNetConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    # Residual blocks
    block: str = "basic_block"
    nb_blocks: Tuple = (2, 2, 2, 2)
    nb_channels: Tuple = (64, 128, 256, 512)
    cardinality: int = 1  # Number of groups in bottleneck conv
    base_width: int = 64  # Determines number of channels in block
    downsample_mode: str = "conv"
    zero_init_last_bn: bool = True
    # Stem
    stem_width: int = 64
    stem_type: str = ""
    replace_stem_pool: bool = False
    # Other params
    block_reduce_first: int = 1
    down_kernel_size: int = 1
    act_layer: str = "relu"
    norm_layer: str = "batch_norm"
    aa_layer: str = ""
    attn_layer: str = ""
    se_ratio: float = 0.0625
    # Regularization
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # Head
    global_pool: str = "avg"
    # Parameters for inference
    test_input_size: Optional[Tuple[int, int]] = None
    pool_size: int = 7
    crop_pct: float = 0.875
    interpolation: str = "bilinear"
    # Preprocessing
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    # Weight transfer
    first_conv: str = "conv1"
    classifier: str = "fc"

    def __post_init__(self):
        if self.test_input_size is None:
            self.test_input_size = self.input_size


def _max_pool_pt(x, pool_size, stride, padding):
    """PyTorch-style max pool with symmetric padding. Uses -inf init/padding:
    reduce_window's reverse-mode rule requires the identity element."""
    x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, pool_size, pool_size, 1),
        (1, stride, stride, 1), "VALID",
    )


class _Downsample:
    """Shortcut projection: conv mode {"0": conv, "1": bn} or avg mode
    {"1": conv, "2": bn} (pool at index 0 has no params) — timm key layout."""

    def __init__(self, cfg: ResNetConfig, in_channels, out_channels, stride):
        self.mode = cfg.downsample_mode
        self.stride = stride
        norm = norm_layer_factory(cfg.norm_layer)
        if self.mode == "avg":
            self.conv = Conv2d(in_channels, out_channels, 1, use_bias=False)
        elif self.mode == "conv":
            pad = (stride + cfg.down_kernel_size) // 2 - 1
            self.conv = Conv2d(in_channels, out_channels, cfg.down_kernel_size,
                               stride=stride, padding=pad, use_bias=False)
        else:
            raise ValueError(f"Unknown downsample mode: {self.mode}")
        self.bn = norm(out_channels)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        if self.mode == "avg":
            return {"1": self.conv.init(r1), "2": self.bn.init(r2)}
        return {"0": self.conv.init(r1), "1": self.bn.init(r2)}

    def __call__(self, p, x):
        if self.mode == "avg":
            if self.stride != 1:
                x = avg_pool_2d(x, 2, self.stride, padding="SAME")
            return self.bn(p["2"], self.conv(p["1"], x))
        return self.bn(p["1"], self.conv(p["0"], x))


class BasicBlock:
    expansion = 1

    def __init__(self, cfg, in_channels, nb_channels, stride, drop_path_rate):
        assert cfg.cardinality == 1, "BasicBlock only supports cardinality 1"
        assert cfg.base_width == 64, "BasicBlock does not support base_width"
        self.act = act_layer_factory(cfg.act_layer)
        norm = norm_layer_factory(cfg.norm_layer)
        first_planes = nb_channels // cfg.block_reduce_first
        out_planes = nb_channels * self.expansion
        self.use_aa = bool(cfg.aa_layer) and stride == 2

        self.conv1 = Conv2d(in_channels, first_planes, 3,
                            stride=1 if self.use_aa else stride,
                            padding=1, use_bias=False)
        self.bn1 = norm(first_planes)
        self.aa = BlurPool2d(first_planes, stride=stride) if self.use_aa else None
        self.conv2 = Conv2d(first_planes, out_planes, 3, padding=1, use_bias=False)
        self.bn2 = norm(out_planes)
        self.zero_init_last_bn = cfg.zero_init_last_bn
        attn = attn_layer_factory(cfg.attn_layer)
        self.se = (attn(out_planes, rd_ratio=cfg.se_ratio)
                   if cfg.attn_layer == "se" else attn(out_planes))
        self.drop_path_rate = drop_path_rate
        self.downsample = (_Downsample(cfg, in_channels, out_planes, stride)
                           if stride != 1 or in_channels != out_planes else None)

    def init(self, rng):
        r = jax.random.split(rng, 6)
        p = {"conv1": self.conv1.init(r[0]), "bn1": self.bn1.init(r[1]),
             "conv2": self.conv2.init(r[2]), "bn2": self.bn2.init(r[3])}
        if self.zero_init_last_bn and "scale" in p["bn2"]:
            p["bn2"]["scale"] = jnp.zeros_like(p["bn2"]["scale"])
        if self.se is not None:
            p["se"] = self.se.init(r[4])
        if self.downsample is not None:
            p["downsample"] = self.downsample.init(r[5])
        return p

    def __call__(self, p, x):
        shortcut = x
        x = self.act(self.bn1(p["bn1"], self.conv1(p["conv1"], x)))
        if self.aa is not None:
            x = self.aa({}, x)
        x = self.bn2(p["bn2"], self.conv2(p["conv2"], x))
        if self.se is not None:
            x = self.se(p["se"], x)
        x = drop_path(x, self.drop_path_rate)
        if self.downsample is not None:
            shortcut = self.downsample(p["downsample"], shortcut)
        return self.act(x + shortcut)


class Bottleneck:
    expansion = 4

    def __init__(self, cfg, in_channels, nb_channels, stride, drop_path_rate):
        self.act = act_layer_factory(cfg.act_layer)
        norm = norm_layer_factory(cfg.norm_layer)
        width = int(math.floor(nb_channels * (cfg.base_width / 64))
                    * cfg.cardinality)
        first_planes = width // cfg.block_reduce_first
        out_planes = nb_channels * self.expansion
        self.use_aa = bool(cfg.aa_layer) and stride == 2

        self.conv1 = Conv2d(in_channels, first_planes, 1, use_bias=False)
        self.bn1 = norm(first_planes)
        self.conv2 = Conv2d(first_planes, width, 3,
                            stride=1 if self.use_aa else stride, padding=1,
                            groups=cfg.cardinality, use_bias=False)
        self.bn2 = norm(width)
        self.aa = BlurPool2d(width, stride=stride) if self.use_aa else None
        self.conv3 = Conv2d(width, out_planes, 1, use_bias=False)
        self.bn3 = norm(out_planes)
        self.zero_init_last_bn = cfg.zero_init_last_bn
        attn = attn_layer_factory(cfg.attn_layer)
        self.se = (attn(out_planes, rd_ratio=cfg.se_ratio)
                   if cfg.attn_layer == "se" else attn(out_planes))
        self.drop_path_rate = drop_path_rate
        self.downsample = (_Downsample(cfg, in_channels, out_planes, stride)
                           if stride != 1 or in_channels != out_planes else None)

    def init(self, rng):
        r = jax.random.split(rng, 8)
        p = {"conv1": self.conv1.init(r[0]), "bn1": self.bn1.init(r[1]),
             "conv2": self.conv2.init(r[2]), "bn2": self.bn2.init(r[3]),
             "conv3": self.conv3.init(r[4]), "bn3": self.bn3.init(r[5])}
        if self.zero_init_last_bn and "scale" in p["bn3"]:
            p["bn3"]["scale"] = jnp.zeros_like(p["bn3"]["scale"])
        if self.se is not None:
            p["se"] = self.se.init(r[6])
        if self.downsample is not None:
            p["downsample"] = self.downsample.init(r[7])
        return p

    def __call__(self, p, x):
        shortcut = x
        x = self.act(self.bn1(p["bn1"], self.conv1(p["conv1"], x)))
        x = self.act(self.bn2(p["bn2"], self.conv2(p["conv2"], x)))
        if self.aa is not None:
            x = self.aa({}, x)
        x = self.bn3(p["bn3"], self.conv3(p["conv3"], x))
        if self.se is not None:
            x = self.se(p["se"], x)
        x = drop_path(x, self.drop_path_rate)
        if self.downsample is not None:
            shortcut = self.downsample(p["downsample"], shortcut)
        return self.act(x + shortcut)


class ResNet(Model):
    cfg_class = ResNetConfig
    keys_to_ignore_on_load_missing = ["blur_kernel"]

    def __init__(self, cfg: ResNetConfig, params=None):
        super().__init__(cfg, params)
        self.act = act_layer_factory(cfg.act_layer)
        norm = norm_layer_factory(cfg.norm_layer)

        # Stem
        self.deep_stem = cfg.stem_type in {"deep", "deep_tiered"}
        if self.deep_stem:
            stem_out = cfg.stem_width * 2
            if cfg.stem_type == "deep_tiered":
                stem_chns = (3 * (cfg.stem_width // 4), cfg.stem_width)
            else:
                stem_chns = (cfg.stem_width, cfg.stem_width)
            self.stem_convs = [
                Conv2d(cfg.in_channels, stem_chns[0], 3, stride=2, padding=1,
                       use_bias=False),
                Conv2d(stem_chns[0], stem_chns[1], 3, padding=1, use_bias=False),
                Conv2d(stem_chns[1], stem_out, 3, padding=1, use_bias=False),
            ]
            self.stem_norms = [norm(stem_chns[0]), norm(stem_chns[1])]
        else:
            stem_out = 64
            self.stem_convs = [Conv2d(cfg.in_channels, stem_out, 7, stride=2,
                                      padding=3, use_bias=False)]
            self.stem_norms = []
        self.bn1 = norm(stem_out)

        # Stem pooling
        if cfg.replace_stem_pool:
            self.stem_pool_conv = Conv2d(stem_out, stem_out, 3, stride=2,
                                         padding=1, use_bias=False)
            self.stem_pool_bn = norm(stem_out)
            self.stem_aa = None
        else:
            self.stem_pool_conv = None
            self.stem_aa = BlurPool2d(stem_out, stride=2) if cfg.aa_layer else None

        # Stages
        block_cls = BasicBlock if cfg.block == "basic_block" else Bottleneck
        total = sum(cfg.nb_blocks)
        self.stages = []
        in_ch = stem_out
        block_idx = 0
        for idx in range(4):
            blocks = []
            for j in range(cfg.nb_blocks[idx]):
                stride = 1 if idx == 0 or j > 0 else 2
                dpr = cfg.drop_path_rate * block_idx / max(total - 1, 1)
                blocks.append(block_cls(cfg, in_ch, cfg.nb_channels[idx],
                                        stride, dpr))
                in_ch = cfg.nb_channels[idx] * block_cls.expansion
                block_idx += 1
            self.stages.append(blocks)
        self.nb_features = in_ch
        self.fc = (Dense(in_ch, cfg.nb_classes) if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        cfg = self.cfg
        r = jax.random.split(rng, 8)
        p = {}
        if self.deep_stem:
            conv1 = {}
            for i, (key, conv) in enumerate(zip(("0", "3", "6"), self.stem_convs)):
                conv1[key] = conv.init(jax.random.fold_in(r[0], i))
            for i, (key, n) in enumerate(zip(("1", "4"), self.stem_norms)):
                conv1[key] = n.init(jax.random.fold_in(r[1], i))
            p["conv1"] = conv1
        else:
            p["conv1"] = self.stem_convs[0].init(r[0])
        p["bn1"] = self.bn1.init(r[1])
        if self.stem_pool_conv is not None:
            p["maxpool"] = {"0": self.stem_pool_conv.init(r[2]),
                            "1": self.stem_pool_bn.init(r[3])}
        for idx, blocks in enumerate(self.stages):
            stage = {}
            for j, blk in enumerate(blocks):
                stage[str(j)] = blk.init(jax.random.fold_in(r[4], idx * 100 + j))
            p[f"layer{idx + 1}"] = stage
        if self.fc is not None:
            p["fc"] = self.fc.init(r[5])
        return p

    def stem(self, params, x):
        if self.deep_stem:
            c = params["conv1"]
            x = self.act(self.stem_norms[0](c["1"], self.stem_convs[0](c["0"], x)))
            x = self.act(self.stem_norms[1](c["4"], self.stem_convs[1](c["3"], x)))
            x = self.stem_convs[2](c["6"], x)
        else:
            x = self.stem_convs[0](params["conv1"], x)
        x = self.act(self.bn1(params["bn1"], x))
        if self.stem_pool_conv is not None:
            mp = params["maxpool"]
            x = self.act(self.stem_pool_bn(mp["1"], self.stem_pool_conv(mp["0"], x)))
        elif self.stem_aa is not None:
            x = _max_pool_pt(x, 3, stride=1, padding=1)
            x = self.stem_aa({}, x)
        else:
            x = _max_pool_pt(x, 3, stride=2, padding=1)
        return x

    def forward_features(self, params, x):
        x = self.stem(params, x)
        capture_feature("stem", x)
        j = 0
        for idx, blocks in enumerate(self.stages):
            stage_p = params[f"layer{idx + 1}"]
            for i, blk in enumerate(blocks):
                x = blk(stage_p[str(i)], x)
                capture_feature(f"block_{j}", x)
                j += 1
        capture_feature("features", x)
        return x

    def forward(self, params, x):
        x = self.forward_features(params, x)
        x = global_pool_2d(x, self.cfg.global_pool)
        x = dropout(x, self.cfg.drop_rate)
        if self.fc is not None:
            x = self.fc(params["fc"], x)
        capture_feature("logits", x)
        return x

    @property
    def feature_names(self):
        return tuple(["stem"]
                     + [f"block_{j}" for j in range(sum(self.cfg.nb_blocks))]
                     + ["features", "logits"])


# -- variant registrations ---------------------------------------------------
# Variant set mirrors the reference (tfimm/architectures/resnet.py:598-1705).

def _register(name, **kwargs):
    def fn():
        return ResNet, ResNetConfig(name=name, url="[timm]", **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn  # so `from ... import *` finds registry entrypoints
    register_model(fn)


# Shared kwarg bundles.
_DEEP = dict(stem_width=32, stem_type="deep", downsample_mode="avg",
             interpolation="bicubic", first_conv="conv1.0")
_TIERED = dict(stem_width=32, stem_type="deep_tiered", downsample_mode="avg",
               interpolation="bicubic", first_conv="conv1.0")
_RS = dict(stem_type="deep", stem_width=32, replace_stem_pool=True,
           downsample_mode="avg", attn_layer="se", se_ratio=0.25,
           interpolation="bicubic", first_conv="conv1.0")

_register("resnet18", block="basic_block", nb_blocks=(2, 2, 2, 2))
_register("resnet18d", block="basic_block", nb_blocks=(2, 2, 2, 2), **_DEEP)
_register("resnet26", block="bottleneck", nb_blocks=(2, 2, 2, 2),
          interpolation="bicubic")
_register("resnet26d", block="bottleneck", nb_blocks=(2, 2, 2, 2), **_DEEP)
_register("resnet26t", block="bottleneck", nb_blocks=(2, 2, 2, 2),
          input_size=(256, 256), pool_size=8, crop_pct=0.94, **{
              **_TIERED})
_register("resnet34", block="basic_block", nb_blocks=(3, 4, 6, 3))
_register("resnet34d", block="basic_block", nb_blocks=(3, 4, 6, 3), **_DEEP)
_register("resnet50", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          interpolation="bicubic", crop_pct=0.95)
_register("resnet50d", block="bottleneck", nb_blocks=(3, 4, 6, 3), **_DEEP)
_register("resnet101", block="bottleneck", nb_blocks=(3, 4, 23, 3),
          interpolation="bicubic", crop_pct=0.95)
_register("resnet101d", block="bottleneck", nb_blocks=(3, 4, 23, 3),
          input_size=(256, 256), pool_size=8, test_input_size=(320, 320),
          crop_pct=1.0, **_DEEP)
_register("resnet152", block="bottleneck", nb_blocks=(3, 8, 36, 3),
          interpolation="bicubic", crop_pct=0.95)
_register("resnet152d", block="bottleneck", nb_blocks=(3, 8, 36, 3),
          input_size=(256, 256), pool_size=8, test_input_size=(320, 320),
          crop_pct=1.0, **_DEEP)
_register("resnet200d", block="bottleneck", nb_blocks=(3, 24, 36, 3),
          input_size=(256, 256), pool_size=8, test_input_size=(320, 320),
          crop_pct=1.0, **_DEEP)
_register("tv_resnet34", block="basic_block", nb_blocks=(3, 4, 6, 3))
_register("tv_resnet50", block="bottleneck", nb_blocks=(3, 4, 6, 3))
_register("tv_resnet101", block="bottleneck", nb_blocks=(3, 4, 23, 3))
_register("tv_resnet152", block="bottleneck", nb_blocks=(3, 8, 36, 3))
_register("wide_resnet50_2", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          base_width=128, interpolation="bicubic")
_register("wide_resnet101_2", block="bottleneck", nb_blocks=(3, 4, 23, 3),
          base_width=128)
_register("resnet50_gn", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          norm_layer="group_norm", crop_pct=0.94, interpolation="bicubic")
_register("resnext50_32x4d", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          cardinality=32, base_width=4, crop_pct=0.95, interpolation="bicubic")
_register("resnext50d_32x4d", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          cardinality=32, base_width=4, **_DEEP)
_register("resnext101_32x8d", block="bottleneck", nb_blocks=(3, 4, 23, 3),
          cardinality=32, base_width=8)
_register("tv_resnext50_32x4d", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          cardinality=32, base_width=4)
for _w in (8, 16, 32, 48):
    _register(f"ig_resnext101_32x{_w}d", block="bottleneck",
              nb_blocks=(3, 4, 23, 3), cardinality=32, base_width=_w)
for _prefix in ("ssl", "swsl"):
    _register(f"{_prefix}_resnet18", block="basic_block", nb_blocks=(2, 2, 2, 2))
    _register(f"{_prefix}_resnet50", block="bottleneck", nb_blocks=(3, 4, 6, 3))
    _register(f"{_prefix}_resnext50_32x4d", block="bottleneck",
              nb_blocks=(3, 4, 6, 3), cardinality=32, base_width=4)
    for _w in (4, 8, 16):
        _register(f"{_prefix}_resnext101_32x{_w}d", block="bottleneck",
                  nb_blocks=(3, 4, 23, 3), cardinality=32, base_width=_w)
_register("ecaresnet26t", block="bottleneck", nb_blocks=(2, 2, 2, 2),
          input_size=(256, 256), attn_layer="eca", test_input_size=(320, 320),
          pool_size=8, crop_pct=0.95, **_TIERED)
_register("ecaresnet50d", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          attn_layer="eca", **_DEEP)
_register("ecaresnet50t", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          attn_layer="eca", test_input_size=(320, 320), pool_size=8,
          crop_pct=0.95, **_TIERED)
_register("ecaresnetlight", block="bottleneck", nb_blocks=(1, 1, 11, 3),
          stem_width=32, downsample_mode="avg", attn_layer="eca",
          interpolation="bicubic")
_register("ecaresnet101d", block="bottleneck", nb_blocks=(3, 4, 23, 3),
          attn_layer="eca", **_DEEP)
_register("ecaresnet269d", block="bottleneck", nb_blocks=(3, 30, 48, 8),
          input_size=(320, 320), attn_layer="eca", test_input_size=(352, 352),
          pool_size=10, crop_pct=1.0, **_DEEP)
_register("resnetblur50", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          aa_layer="blur_pool", interpolation="bicubic")
_register("resnetrs50", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          input_size=(160, 160), test_input_size=(224, 224), pool_size=5,
          crop_pct=0.91, **_RS)
_register("resnetrs101", block="bottleneck", nb_blocks=(3, 4, 23, 3),
          input_size=(192, 192), test_input_size=(288, 288), pool_size=6,
          crop_pct=0.94, **_RS)
_register("resnetrs152", block="bottleneck", nb_blocks=(3, 8, 36, 3),
          input_size=(256, 256), test_input_size=(320, 320), pool_size=8,
          crop_pct=1.0, **_RS)
_register("resnetrs200", block="bottleneck", nb_blocks=(3, 24, 36, 3),
          input_size=(256, 256), test_input_size=(320, 320), pool_size=8,
          crop_pct=1.0, **_RS)
_register("resnetrs270", block="bottleneck", nb_blocks=(4, 29, 53, 4),
          input_size=(256, 256), test_input_size=(352, 352), pool_size=8,
          crop_pct=1.0, **_RS)
_register("resnetrs350", block="bottleneck", nb_blocks=(4, 36, 72, 4),
          input_size=(288, 288), test_input_size=(384, 384), pool_size=9,
          crop_pct=1.0, **_RS)
_register("resnetrs420", block="bottleneck", nb_blocks=(4, 44, 87, 4),
          input_size=(320, 320), test_input_size=(416, 416), pool_size=10,
          crop_pct=1.0, **_RS)
_register("seresnet50", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          attn_layer="se", interpolation="bicubic")
_register("seresnet152d", block="bottleneck", nb_blocks=(3, 8, 36, 3),
          input_size=(256, 256), attn_layer="se", test_input_size=(320, 320),
          pool_size=8, crop_pct=1.0, **_DEEP)
_register("seresnext26d_32x4d", block="bottleneck", nb_blocks=(2, 2, 2, 2),
          cardinality=32, base_width=4, attn_layer="se", **_DEEP)
_register("seresnext26t_32x4d", block="bottleneck", nb_blocks=(2, 2, 2, 2),
          cardinality=32, base_width=4, attn_layer="se", **_TIERED)
_register("seresnext50_32x4d", block="bottleneck", nb_blocks=(3, 4, 6, 3),
          cardinality=32, base_width=4, attn_layer="se", interpolation="bicubic")
