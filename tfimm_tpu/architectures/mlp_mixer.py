"""MLP-Mixer / ResMLP / gMLP.

TPU-native re-implementation of the reference family
(tfimm/architectures/mlp_mixer.py:83-240): block selector between MixerBlock
(token+channel MLPs), ResBlock (ResMLP with Affine norm + layer scale) and
SpatialGatingBlock (gMLP). Fixed input size (token-dim Dense layers). Param
paths mirror timm (stem.proj / blocks.N.mlp_tokens.fc1 / head).

Papers: MLP-Mixer https://arxiv.org/abs/2105.01601,
ResMLP 2105.03404, gMLP 2105.08050.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from tfimm_tpu.core import capture_feature
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import (
    MLP,
    Dense,
    GatedMLP,
    GluMLP,
    PatchEmbeddings,
    norm_layer_factory,
)
from tfimm_tpu.ops.stochastic import drop_path
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["MLPMixer", "MLPMixerConfig"]


@dataclass
class MLPMixerConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    embed_dim: int = 512
    nb_blocks: int = 16
    mlp_ratio: Tuple[float, float] = (0.5, 4.0)
    block_layer: str = "mixer_block"
    mlp_layer: str = "mlp"
    # Regularization
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # Other parameters
    norm_layer: str = "layer_norm_eps_1e-6"
    act_layer: str = "gelu"
    init_values: float = 1e-4  # layer-scale init for ResBlocks
    nlhb: bool = False
    stem_norm: bool = False
    # Parameters for inference
    crop_pct: float = 0.875
    interpolation: str = "bicubic"
    mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    # Weight transfer
    first_conv: str = "stem.proj"
    classifier: str = "head"

    @property
    def nb_patches(self) -> int:
        return ((self.input_size[0] // self.patch_size)
                * (self.input_size[1] // self.patch_size))


def _make_mlp(cfg, in_features, hidden, seq_len=None):
    if cfg.mlp_layer == "mlp":
        return MLP(in_features, hidden, act_layer=cfg.act_layer,
                   drop_rate=cfg.drop_rate)
    if cfg.mlp_layer == "glu_mlp":
        return GluMLP(in_features, hidden, act_layer=cfg.act_layer,
                      drop_rate=cfg.drop_rate)
    if cfg.mlp_layer == "gated_mlp":
        return GatedMLP(in_features, hidden, seq_len=seq_len,
                        act_layer=cfg.act_layer, drop_rate=cfg.drop_rate)
    raise ValueError(f"Unknown mlp layer: {cfg.mlp_layer}")


class MixerBlock:
    def __init__(self, cfg: MLPMixerConfig):
        norm = norm_layer_factory(cfg.norm_layer)
        tokens_dim, channels_dim = [int(x * cfg.embed_dim) for x in cfg.mlp_ratio]
        self.norm1 = norm(cfg.embed_dim)
        self.mlp_tokens = _make_mlp(cfg, cfg.nb_patches, tokens_dim)
        self.norm2 = norm(cfg.embed_dim)
        self.mlp_channels = _make_mlp(cfg, cfg.embed_dim, channels_dim)
        self.dpr = cfg.drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"norm1": self.norm1.init(r[0]),
                "mlp_tokens": self.mlp_tokens.init(r[1]),
                "norm2": self.norm2.init(r[2]),
                "mlp_channels": self.mlp_channels.init(r[3])}

    def __call__(self, p, x):
        shortcut = x
        y = self.norm1(p["norm1"], x)
        y = jnp.swapaxes(y, 1, 2)
        y = self.mlp_tokens(p["mlp_tokens"], y)
        y = jnp.swapaxes(y, 1, 2)
        x = shortcut + drop_path(y, self.dpr)
        y = self.norm2(p["norm2"], x)
        y = self.mlp_channels(p["mlp_channels"], y)
        return x + drop_path(y, self.dpr)


class ResBlock:
    def __init__(self, cfg: MLPMixerConfig):
        norm = norm_layer_factory(cfg.norm_layer)
        self.norm1 = norm(cfg.embed_dim)
        self.linear_tokens = Dense(cfg.nb_patches, cfg.nb_patches)
        self.norm2 = norm(cfg.embed_dim)
        self.mlp_channels = _make_mlp(
            cfg, cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio[1])
        )
        self.init_values = cfg.init_values
        self.embed_dim = cfg.embed_dim
        self.dpr = cfg.drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"norm1": self.norm1.init(r[0]),
                "linear_tokens": self.linear_tokens.init(r[1]),
                "norm2": self.norm2.init(r[2]),
                "mlp_channels": self.mlp_channels.init(r[3]),
                "ls1": jnp.full((self.embed_dim,), self.init_values),
                "ls2": jnp.full((self.embed_dim,), self.init_values)}

    def __call__(self, p, x):
        shortcut = x
        y = self.norm1(p["norm1"], x)
        y = jnp.swapaxes(y, 1, 2)
        y = self.linear_tokens(p["linear_tokens"], y)
        y = jnp.swapaxes(y, 1, 2)
        y = y * p["ls1"].astype(y.dtype)
        x = shortcut + drop_path(y, self.dpr)
        y = self.norm2(p["norm2"], x)
        y = self.mlp_channels(p["mlp_channels"], y)
        y = y * p["ls2"].astype(y.dtype)
        return x + drop_path(y, self.dpr)


class SpatialGatingBlock:
    def __init__(self, cfg: MLPMixerConfig):
        norm = norm_layer_factory(cfg.norm_layer)
        self.norm = norm(cfg.embed_dim)
        self.mlp_channels = _make_mlp(
            cfg, cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio[1]),
            seq_len=cfg.nb_patches,
        )
        self.dpr = cfg.drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 2)
        return {"norm": self.norm.init(r[0]),
                "mlp_channels": self.mlp_channels.init(r[1])}

    def __call__(self, p, x):
        y = self.norm(p["norm"], x)
        y = self.mlp_channels(p["mlp_channels"], y)
        return x + drop_path(y, self.dpr)


_BLOCKS = {"mixer_block": MixerBlock, "res_block": ResBlock,
           "spatial_gating_block": SpatialGatingBlock}


class MLPMixer(Model):
    cfg_class = MLPMixerConfig

    def __init__(self, cfg: MLPMixerConfig, params=None):
        super().__init__(cfg, params)
        self.nb_features = cfg.embed_dim
        norm = norm_layer_factory(cfg.norm_layer)
        self.stem = PatchEmbeddings(
            cfg.patch_size, cfg.embed_dim, in_channels=cfg.in_channels,
            norm_layer=(norm_layer_factory(cfg.norm_layer) if cfg.stem_norm
                        else None),
        )
        self.blocks = [_BLOCKS[cfg.block_layer](cfg)
                       for _ in range(cfg.nb_blocks)]
        self.norm = norm(cfg.embed_dim)
        self.head = (Dense(cfg.embed_dim, cfg.nb_classes)
                     if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        r = jax.random.split(rng, 4)
        p = {"stem": self.stem.init(r[0]),
             "blocks": {str(j): blk.init(jax.random.fold_in(r[1], j))
                        for j, blk in enumerate(self.blocks)},
             "norm": self.norm.init(r[2])}
        if self.head is not None:
            p["head"] = self.head.init(r[3])
        return p

    def forward_features(self, params, x):
        x, _ = self.stem(params["stem"], x)
        capture_feature("stem", x)
        for j, blk in enumerate(self.blocks):
            x = blk(params["blocks"][str(j)], x)
            capture_feature(f"block_{j}", x)
        x = self.norm(params["norm"], x)
        capture_feature("features_all", x)
        x = x.mean(axis=1)
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
        return tuple(["stem"] + [f"block_{j}" for j in range(self.cfg.nb_blocks)]
                     + ["features_all", "features", "logits"])


# -- variant registrations ---------------------------------------------------
# Mirrors the reference (tfimm/architectures/mlp_mixer.py:309-840).

def _register(name, **kwargs):
    def fn():
        return MLPMixer, MLPMixerConfig(name=name, url="[timm]", **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_register("mixer_s32_224", patch_size=32, embed_dim=512, nb_blocks=8)
_register("mixer_s16_224", patch_size=16, embed_dim=512, nb_blocks=8)
_register("mixer_b32_224", patch_size=32, embed_dim=768, nb_blocks=12)
_register("mixer_b16_224", patch_size=16, embed_dim=768, nb_blocks=12)
_register("mixer_b16_224_in21k", nb_classes=21843, patch_size=16,
          embed_dim=768, nb_blocks=12)
_register("mixer_l32_224", patch_size=32, embed_dim=1024, nb_blocks=24)
_register("mixer_l16_224", patch_size=16, embed_dim=1024, nb_blocks=24)
_register("mixer_l16_224_in21k", nb_classes=21843, patch_size=16,
          embed_dim=1024, nb_blocks=24)
_register("mixer_b16_224_miil", patch_size=16, embed_dim=768, nb_blocks=12,
          interpolation="bilinear", mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
_register("mixer_b16_224_miil_in21k", nb_classes=11221, patch_size=16,
          embed_dim=768, nb_blocks=12, interpolation="bilinear",
          mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
_register("gmixer_12_224", patch_size=16, embed_dim=384, nb_blocks=12,
          mlp_ratio=(1.0, 4.0), mlp_layer="glu_mlp", act_layer="swish",
          mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD)
_register("gmixer_24_224", patch_size=16, embed_dim=384, nb_blocks=24,
          mlp_ratio=(1.0, 4.0), mlp_layer="glu_mlp", act_layer="swish",
          mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD)

_RESMLP = dict(mlp_ratio=(4.0, 4.0), block_layer="res_block",
               norm_layer="affine", mean=IMAGENET_DEFAULT_MEAN,
               std=IMAGENET_DEFAULT_STD)
_register("resmlp_12_224", patch_size=16, embed_dim=384, nb_blocks=12, **_RESMLP)
_register("resmlp_24_224", patch_size=16, embed_dim=384, nb_blocks=24,
          init_values=1e-5, **_RESMLP)
_register("resmlp_36_224", patch_size=16, embed_dim=384, nb_blocks=36,
          init_values=1e-6, **_RESMLP)
_register("resmlp_big_24_224", patch_size=8, embed_dim=768, nb_blocks=24,
          init_values=1e-6, **_RESMLP)
_register("resmlp_12_distilled_224", patch_size=16, embed_dim=384,
          nb_blocks=12, **_RESMLP)
_register("resmlp_24_distilled_224", patch_size=16, embed_dim=384,
          nb_blocks=24, init_values=1e-5, **_RESMLP)
_register("resmlp_36_distilled_224", patch_size=16, embed_dim=384,
          nb_blocks=36, init_values=1e-6, **_RESMLP)
_register("resmlp_big_24_distilled_224", patch_size=8, embed_dim=768,
          nb_blocks=24, init_values=1e-6, **_RESMLP)
_register("resmlp_big_24_224_in22ft1k", patch_size=8, embed_dim=768,
          nb_blocks=24, init_values=1e-6, **_RESMLP)
_register("resmlp_12_224_dino", patch_size=16, embed_dim=384, nb_blocks=12,
          **_RESMLP)
_register("resmlp_24_224_dino", patch_size=16, embed_dim=384, nb_blocks=24,
          init_values=1e-5, **_RESMLP)

_register("gmlp_ti16_224", patch_size=16, embed_dim=128, nb_blocks=30,
          mlp_ratio=(6.0, 6.0), block_layer="spatial_gating_block",
          mlp_layer="gated_mlp")
_register("gmlp_s16_224", patch_size=16, embed_dim=256, nb_blocks=30,
          mlp_ratio=(6.0, 6.0), block_layer="spatial_gating_block",
          mlp_layer="gated_mlp")
_register("gmlp_b16_224", patch_size=16, embed_dim=512, nb_blocks=30,
          mlp_ratio=(6.0, 6.0), block_layer="spatial_gating_block",
          mlp_layer="gated_mlp")
