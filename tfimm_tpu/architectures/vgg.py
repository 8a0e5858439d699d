"""VGG (reference: tfimm/architectures/vgg.py:126-404).

Layer-spec tuple drives conv/maxpool sequence; ConvMlp pre-logits head
(7x7 conv -> 1x1 conv). Param paths mirror timm (features.N / pre_logits.fc1 /
head.fc). Paper: https://arxiv.org/abs/1409.1556.
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
    ClassifierHead,
    Conv2d,
    act_layer_factory,
    norm_layer_factory,
)
from tfimm_tpu.ops.pool import max_pool_2d
from tfimm_tpu.ops.stochastic import dropout
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["VGG", "VGGConfig"]


@dataclass
class VGGConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    layers: Tuple = ()
    nb_features: int = 4096
    mlp_ratio: float = 1.0
    global_pool: str = "avg"
    drop_rate: float = 0.0
    norm_layer: str = ""
    act_layer: str = "relu"
    crop_pct: float = 0.875
    interpolation: str = "bilinear"
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    first_conv: str = "features.0"
    classifier: str = "head.fc"


class VGG(Model):
    cfg_class = VGGConfig

    def __init__(self, cfg: VGGConfig, params=None):
        super().__init__(cfg, params)
        self.act = act_layer_factory(cfg.act_layer)
        norm = norm_layer_factory(cfg.norm_layer)
        self.use_norm = cfg.norm_layer != ""

        # ops: list of ("conv", feature_idx, Conv2d) / ("norm", idx, layer) /
        # ("act", layer_idx) / ("pool", layer_idx)
        self.ops = []
        in_ch = cfg.in_channels
        idx = 0  # timm features.N index
        layer_idx = 0  # feature-capture index
        for v in cfg.layers:
            if v == "M":
                self.ops.append(("pool", None, layer_idx))
                idx += 1
            else:
                self.ops.append(("conv", str(idx),
                                 Conv2d(in_ch, v, 3, padding=1)))
                if self.use_norm:
                    self.ops.append(("norm", str(idx + 1), norm(v)))
                    idx += 3
                else:
                    idx += 2
                self.ops.append(("act", None, layer_idx))
                in_ch = v
            layer_idx += 1
        self.nb_layers = layer_idx

        hidden = int(cfg.nb_features * cfg.mlp_ratio)
        self.pre_logits_fc1 = Conv2d(in_ch, hidden, 7, padding="valid")
        self.pre_logits_fc2 = Conv2d(hidden, cfg.nb_features, 1)
        self.head = ClassifierHead(cfg.nb_classes, cfg.nb_features,
                                   pool_type=cfg.global_pool,
                                   drop_rate=cfg.drop_rate)

    def init_params(self, rng):
        features = {}
        i = 0
        for kind, key, layer in self.ops:
            if kind in ("conv", "norm"):
                features[key] = layer.init(jax.random.fold_in(rng, i))
                i += 1
        r1, r2, r3 = jax.random.split(jax.random.fold_in(rng, 999), 3)
        return {
            "features": features,
            "pre_logits": {"fc1": self.pre_logits_fc1.init(r1),
                           "fc2": self.pre_logits_fc2.init(r2)},
            "head": self.head.init(r3),
        }

    def forward_features(self, params, x):
        fp = params["features"]
        for kind, key, layer in self.ops:
            if kind == "conv" or kind == "norm":
                x = layer(fp[key], x)
            elif kind == "act":
                x = self.act(x)
                capture_feature(f"layer_{layer}", x)
            else:  # pool
                x = max_pool_2d(x, 2, 2)
                capture_feature(f"layer_{layer}", x)
        pl = params["pre_logits"]
        x = self.act(self.pre_logits_fc1(pl["fc1"], x))
        x = dropout(x, self.cfg.drop_rate)
        x = self.act(self.pre_logits_fc2(pl["fc2"], x))
        capture_feature("features", x)
        return x

    def forward(self, params, x):
        x = self.forward_features(params, x)
        x = self.head(params["head"], x)
        capture_feature("logits", x)
        return x

    @property
    def feature_names(self):
        return tuple([f"layer_{j}" for j in range(self.nb_layers)]
                     + ["features", "logits"])


def _register(name, **kwargs):
    def fn():
        return VGG, VGGConfig(name=name, url="[timm]", **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_LAYERS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}

for _n, _l in _LAYERS.items():
    _register(_n, layers=_l)
    _register(f"{_n}_bn", layers=_l, norm_layer="batch_norm")
