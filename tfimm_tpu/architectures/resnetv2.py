"""ResNetV2 (Big Transfer / BiT).

TPU-native re-implementation of the reference family
(tfimm/architectures/resnetv2.py:88-658): pre-activation bottlenecks with
weight-standardized convs + GroupNorm, width_factor scaling; the
non-preact variant doubles as the ViT-Hybrid backbone. Param paths mirror
timm (stem.conv / stages.j.blocks.k.conv1 / head.fc).

Paper: Big Transfer (BiT), https://arxiv.org/abs/1912.11370.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfimm_tpu.core import capture_feature
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import (
    Dense,
    StdConv2d,
    act_layer_factory,
    global_pool_2d,
    norm_layer_factory,
)
from tfimm_tpu.ops.pool import max_pool_2d
from tfimm_tpu.ops.stochastic import drop_path, dropout
from tfimm_tpu.utils.constants import (
    IMAGENET_INCEPTION_MEAN,
    IMAGENET_INCEPTION_STD,
)

__all__ = ["ResNetV2", "ResNetV2Config", "ResNetV2Stem"]


@dataclass
class ResNetV2Config(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    nb_blocks: Tuple = (2, 2, 2, 2)
    nb_channels: Tuple = (256, 512, 1024, 2048)
    width_factor: int = 1
    preact: bool = True
    stem_width: int = 64
    stem_type: str = "fixed"
    global_pool: str = "avg"
    conv_padding: str = "symmetric"
    act_layer: str = "relu"
    norm_layer: str = "group_norm"
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    pool_size: int = 7
    crop_pct: float = 0.875
    interpolation: str = "bilinear"
    mean: Tuple[float, float, float] = IMAGENET_INCEPTION_MEAN
    std: Tuple[float, float, float] = IMAGENET_INCEPTION_STD
    first_conv: str = "stem.conv"
    classifier: str = "head.fc"


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _conv_padding(cfg_padding, kernel_size):
    return "same" if cfg_padding == "same" else "symmetric"


class _Downsample:
    def __init__(self, in_ch, nb_channels, strides, preact, conv_padding,
                 norm_layer):
        self.conv = StdConv2d(in_ch, nb_channels, 1, stride=strides,
                              padding=_conv_padding(conv_padding, 1),
                              use_bias=False)
        self.norm = (None if preact
                     else norm_layer_factory(norm_layer)(nb_channels))

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        p = {"conv": self.conv.init(r1)}
        if self.norm is not None:
            p["norm"] = self.norm.init(r2)
        return p

    def __call__(self, p, x):
        x = self.conv(p["conv"], x)
        if self.norm is not None:
            x = self.norm(p["norm"], x)
        return x


class PreActBottleneck:
    """Pre-activation bottleneck; stride on the 3x3 conv."""

    def __init__(self, in_ch, nb_channels, strides, downsample, conv_padding,
                 act_layer, norm_layer, drop_path_rate, bottleneck_ratio=0.25):
        self.act = act_layer_factory(act_layer)
        norm = norm_layer_factory(norm_layer)
        mid = _make_divisible(nb_channels * bottleneck_ratio)
        pad = lambda k: _conv_padding(conv_padding, k)  # noqa: E731
        self.downsample = (_Downsample(in_ch, nb_channels, strides, True,
                                       conv_padding, norm_layer)
                           if downsample else None)
        self.norm1 = norm(in_ch)
        self.conv1 = StdConv2d(in_ch, mid, 1, padding=pad(1), use_bias=False)
        self.norm2 = norm(mid)
        self.conv2 = StdConv2d(mid, mid, 3, stride=strides, padding=pad(3),
                               use_bias=False)
        self.norm3 = norm(mid)
        self.conv3 = StdConv2d(mid, nb_channels, 1, padding=pad(1),
                               use_bias=False)
        self.dpr = drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 7)
        p = {"norm1": self.norm1.init(r[0]), "conv1": self.conv1.init(r[1]),
             "norm2": self.norm2.init(r[2]), "conv2": self.conv2.init(r[3]),
             "norm3": self.norm3.init(r[4]), "conv3": self.conv3.init(r[5])}
        if self.downsample is not None:
            p["downsample"] = self.downsample.init(r[6])
        return p

    def __call__(self, p, x):
        y = self.act(self.norm1(p["norm1"], x))
        shortcut = (self.downsample(p["downsample"], y)
                    if self.downsample is not None else x)
        x = self.conv1(p["conv1"], y)
        x = self.conv2(p["conv2"], self.act(self.norm2(p["norm2"], x)))
        x = self.conv3(p["conv3"], self.act(self.norm3(p["norm3"], x)))
        x = drop_path(x, self.dpr)
        return x + shortcut


class Bottleneck:
    """Non-preact bottleneck (v1.5-style); used by ViT-Hybrid."""

    def __init__(self, in_ch, nb_channels, strides, downsample, conv_padding,
                 act_layer, norm_layer, drop_path_rate, bottleneck_ratio=0.25):
        self.act = act_layer_factory(act_layer)
        norm = norm_layer_factory(norm_layer)
        mid = _make_divisible(nb_channels * bottleneck_ratio)
        pad = lambda k: _conv_padding(conv_padding, k)  # noqa: E731
        self.downsample = (_Downsample(in_ch, nb_channels, strides, False,
                                       conv_padding, norm_layer)
                           if downsample else None)
        self.conv1 = StdConv2d(in_ch, mid, 1, padding=pad(1), use_bias=False)
        self.norm1 = norm(mid)
        self.conv2 = StdConv2d(mid, mid, 3, stride=strides, padding=pad(3),
                               use_bias=False)
        self.norm2 = norm(mid)
        self.conv3 = StdConv2d(mid, nb_channels, 1, padding=pad(1),
                               use_bias=False)
        self.norm3 = norm(nb_channels)
        self.dpr = drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 7)
        p = {"conv1": self.conv1.init(r[0]), "norm1": self.norm1.init(r[1]),
             "conv2": self.conv2.init(r[2]), "norm2": self.norm2.init(r[3]),
             "conv3": self.conv3.init(r[4]), "norm3": self.norm3.init(r[5])}
        if self.downsample is not None:
            p["downsample"] = self.downsample.init(r[6])
        return p

    def __call__(self, p, x):
        shortcut = (self.downsample(p["downsample"], x)
                    if self.downsample is not None else x)
        x = self.act(self.norm1(p["norm1"], self.conv1(p["conv1"], x)))
        x = self.act(self.norm2(p["norm2"], self.conv2(p["conv2"], x)))
        x = self.norm3(p["norm3"], self.conv3(p["conv3"], x))
        x = drop_path(x, self.dpr)
        return self.act(x + shortcut)


class ResNetV2Stem:
    """7x7/2 weight-standardized conv (+norm/act if non-preact) + maxpool."""

    def __init__(self, in_channels, stem_type, stem_width, conv_padding,
                 preact, act_layer, norm_layer):
        self.preact = preact
        self.stem_type = stem_type
        self.conv = StdConv2d(in_channels, stem_width, 7, stride=2,
                              padding=_conv_padding(conv_padding, 7),
                              use_bias=False)
        self.norm = (None if preact
                     else norm_layer_factory(norm_layer)(stem_width))
        self.act = act_layer_factory(act_layer)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        p = {"conv": self.conv.init(r1)}
        if self.norm is not None:
            p["norm"] = self.norm.init(r2)
        return p

    def __call__(self, p, x):
        x = self.conv(p["conv"], x)
        if not self.preact:
            x = self.act(self.norm(p["norm"], x))
        if self.stem_type == "fixed":
            # timm's 'fixed' BiT stem zero-pads before the pool
            # (ConstantPad2d(1, 0.); reference: resnetv2.py:329
            # ZeroPadding2D) — NOT -inf: a border window whose real values
            # are all negative maxes to 0 there, and matching that is part
            # of checkpoint parity (caught by the hf_bit golden fixture).
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            x = max_pool_2d(x, 3, 2, padding="VALID")
        elif self.stem_type == "same":
            x = max_pool_2d(x, 3, 2, padding="SAME")
        else:
            raise ValueError(f"Unknown stem_type: {self.stem_type}")
        return x


class ResNetV2(Model):
    cfg_class = ResNetV2Config

    def __init__(self, cfg: ResNetV2Config, params=None):
        super().__init__(cfg, params)
        stem_width = _make_divisible(cfg.stem_width * cfg.width_factor)
        self.stem = ResNetV2Stem(cfg.in_channels, cfg.stem_type, stem_width,
                                 cfg.conv_padding, cfg.preact, cfg.act_layer,
                                 cfg.norm_layer)
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        block_cls = PreActBottleneck if cfg.preact else Bottleneck
        self.stages = []
        in_ch = stem_width
        idx = 0
        for j in range(len(cfg.nb_blocks)):
            nb_channels = _make_divisible(cfg.nb_channels[j] * cfg.width_factor)
            blocks = []
            for k in range(cfg.nb_blocks[j]):
                blocks.append(block_cls(
                    in_ch, nb_channels,
                    strides=2 if (j > 0 and k == 0) else 1,
                    downsample=(k == 0), conv_padding=cfg.conv_padding,
                    act_layer=cfg.act_layer, norm_layer=cfg.norm_layer,
                    drop_path_rate=float(dpr[idx]),
                ))
                in_ch = nb_channels
                idx += 1
            self.stages.append(blocks)
        self.nb_features = in_ch
        if cfg.preact:
            self.norm = norm_layer_factory(cfg.norm_layer)(in_ch)
            self.act = act_layer_factory(cfg.act_layer)
        else:
            self.norm = None
        self.fc = (Dense(in_ch, cfg.nb_classes) if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        r = jax.random.split(rng, 4)
        p = {"stem": self.stem.init(r[0])}
        stages = {}
        for j, blocks in enumerate(self.stages):
            stages[str(j)] = {"blocks": {
                str(k): blk.init(jax.random.fold_in(r[1], j * 100 + k))
                for k, blk in enumerate(blocks)
            }}
        p["stages"] = stages
        if self.norm is not None:
            p["norm"] = self.norm.init(r[2])
        if self.fc is not None:
            p["head"] = {"fc": self.fc.init(r[3])}
        return p

    def forward_features(self, params, x):
        x = self.stem(params["stem"], x)
        capture_feature("stem", x)
        j_abs = 0
        for j, blocks in enumerate(self.stages):
            sp = params["stages"][str(j)]["blocks"]
            for k, blk in enumerate(blocks):
                x = blk(sp[str(k)], x)
                capture_feature(f"block_{j_abs}", x)
                j_abs += 1
        if self.norm is not None:
            x = self.act(self.norm(params["norm"], x))
        capture_feature("features", x)
        return x

    def forward(self, params, x):
        x = self.forward_features(params, x)
        x = global_pool_2d(x, self.cfg.global_pool)
        x = dropout(x, self.cfg.drop_rate)
        if self.fc is not None:
            x = self.fc(params["head"]["fc"], x)
        capture_feature("logits", x)
        return x

    @property
    def feature_names(self):
        return tuple(["stem"]
                     + [f"block_{j}" for j in range(sum(self.cfg.nb_blocks))]
                     + ["features", "logits"])


def _register(name, **kwargs):
    def fn():
        return ResNetV2, ResNetV2Config(name=name, url="[timm]", **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


for _blocks, _tag in [((3, 4, 6, 3), "50"), ((3, 4, 23, 3), "101"),
                      ((3, 8, 36, 3), "152")]:
    for _wf in (1, 2, 3, 4):
        name = f"resnetv2_{_tag}x{_wf}_bitm"
        if name in ("resnetv2_50x1_bitm", "resnetv2_50x3_bitm",
                    "resnetv2_101x1_bitm", "resnetv2_101x3_bitm",
                    "resnetv2_152x2_bitm", "resnetv2_152x4_bitm"):
            size = (480, 480) if name == "resnetv2_152x4_bitm" else (448, 448)
            _register(name, input_size=size, nb_blocks=_blocks,
                      width_factor=_wf, pool_size=size[0] // 32, crop_pct=1.0)
            _register(f"{name}_in21k", nb_classes=21843, nb_blocks=_blocks,
                      width_factor=_wf)
_register("resnetv2_50x1_bit_distilled", nb_blocks=(3, 4, 6, 3),
          width_factor=1, interpolation="bicubic")
_register("resnetv2_152x2_bit_teacher", nb_blocks=(3, 8, 36, 3),
          width_factor=2, interpolation="bicubic")
_register("resnetv2_152x2_bit_teacher_384", input_size=(384, 384),
          nb_blocks=(3, 8, 36, 3), width_factor=2, pool_size=12, crop_pct=1.0,
          interpolation="bicubic")
