"""ConvMixer (reference: tfimm/architectures/convmixer.py:77-194).

Depthwise conv + residual, then pointwise conv blocks, each followed by
act + BN. Param paths mirror timm (stem.0 / blocks.N.0.fn.0 / head).
Paper: Patches Are All You Need?, https://arxiv.org/abs/2201.09792.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax

from tfimm_tpu.core import capture_feature
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import (
    Conv2d,
    Dense,
    DepthwiseConv2d,
    act_layer_factory,
    norm_layer_factory,
)
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["ConvMixer", "ConvMixerConfig"]


@dataclass
class ConvMixerConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (7, 7)
    embed_dim: int = 768
    depth: int = 32
    kernel_size: int = 9
    norm_layer: str = "batch_norm"
    act_layer: str = "gelu"
    crop_pct: float = 0.96
    interpolation: str = "bicubic"
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    first_conv: str = "stem.0"
    classifier: str = "head"


class ConvMixerBlock:
    def __init__(self, cfg: ConvMixerConfig):
        self.act = act_layer_factory(cfg.act_layer)
        norm = norm_layer_factory(cfg.norm_layer)
        self.conv_dw = DepthwiseConv2d(cfg.embed_dim, cfg.kernel_size,
                                       padding="same")
        self.bn1 = norm(cfg.embed_dim)
        self.conv_pw = Conv2d(cfg.embed_dim, cfg.embed_dim, 1)
        self.bn2 = norm(cfg.embed_dim)

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"0": {"fn": {"0": self.conv_dw.init(r[0]),
                             "2": self.bn1.init(r[1])}},
                "1": self.conv_pw.init(r[2]),
                "3": self.bn2.init(r[3])}

    def __call__(self, p, x):
        shortcut = x
        x = self.conv_dw(p["0"]["fn"]["0"], x)
        x = self.act(x)
        x = self.bn1(p["0"]["fn"]["2"], x)
        x = x + shortcut
        x = self.conv_pw(p["1"], x)
        x = self.act(x)
        x = self.bn2(p["3"], x)
        return x


class ConvMixer(Model):
    cfg_class = ConvMixerConfig

    def __init__(self, cfg: ConvMixerConfig, params=None):
        super().__init__(cfg, params)
        self.nb_features = cfg.embed_dim
        self.act = act_layer_factory(cfg.act_layer)
        norm = norm_layer_factory(cfg.norm_layer)
        self.stem_conv = Conv2d(cfg.in_channels, cfg.embed_dim, cfg.patch_size,
                                stride=cfg.patch_size, padding="valid")
        self.stem_bn = norm(cfg.embed_dim)
        self.blocks = [ConvMixerBlock(cfg) for _ in range(cfg.depth)]
        self.head = (Dense(cfg.embed_dim, cfg.nb_classes)
                     if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        r = jax.random.split(rng, 4)
        p = {"stem": {"0": self.stem_conv.init(r[0]),
                      "2": self.stem_bn.init(r[1])},
             "blocks": {str(j): blk.init(jax.random.fold_in(r[2], j))
                        for j, blk in enumerate(self.blocks)}}
        if self.head is not None:
            p["head"] = self.head.init(r[3])
        return p

    def forward_features(self, params, x):
        x = self.stem_conv(params["stem"]["0"], x)
        x = self.act(x)
        x = self.stem_bn(params["stem"]["2"], x)
        capture_feature("stem", x)
        for j, blk in enumerate(self.blocks):
            x = blk(params["blocks"][str(j)], x)
            capture_feature(f"block_{j}", x)
        capture_feature("features_all", x)
        x = x.mean(axis=(1, 2))
        capture_feature("features", x)
        return x

    def forward(self, params, x):
        x = self.forward_features(params, x)
        if self.head is not None:
            x = self.head(params["head"], x)
        capture_feature("logits", x)
        return x

    @property
    def feature_names(self):
        return tuple(["stem"] + [f"block_{j}" for j in range(self.cfg.depth)]
                     + ["features_all", "features", "logits"])


def _register(name, **kwargs):
    def fn():
        return ConvMixer, ConvMixerConfig(name=name, url="[timm]", **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_register("convmixer_768_32", patch_size=(7, 7), embed_dim=768, depth=32,
          kernel_size=7, act_layer="relu")
_register("convmixer_1024_20_ks9_p14", patch_size=(14, 14), embed_dim=1024,
          depth=20, kernel_size=9)
_register("convmixer_1536_20", patch_size=(7, 7), embed_dim=1536, depth=20,
          kernel_size=9)
