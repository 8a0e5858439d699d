"""PiT — Pooling-based Vision Transformer.

TPU-native re-implementation of the reference family
(tfimm/architectures/pit.py:147-523): ViT blocks per stage with depthwise-conv
token pooling between stages (tokens projected by a Dense); distilled
variants. The position embedding is stored in PT layout (1, C, H, W) for
checkpoint compatibility. Param paths mirror timm
(patch_embed.conv / transformers.j.blocks.k / transformers.j.pool.conv).

Paper: Rethinking Spatial Dimensions of ViTs, https://arxiv.org/abs/2103.16302.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tfimm_tpu.architectures.vit import ViTBlock
from tfimm_tpu.core import capture_feature
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import (
    Conv2d,
    Dense,
    interpolate_pos_embeddings_grid,
    norm_layer_factory,
    trunc_normal,
)
from tfimm_tpu.ops.stochastic import dropout
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["PoolingVisionTransformer", "PoolingVisionTransformerConfig"]


@dataclass
class PoolingVisionTransformerConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    stride: int = 8
    embed_dim: Tuple = (64, 128, 256)
    nb_blocks: Tuple = (2, 6, 4)
    nb_heads: Tuple = (2, 4, 8)
    mlp_ratio: float = 4.0
    distilled: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_layer: str = "layer_norm_eps_1e-6"
    act_layer: str = "gelu"
    interpolate_input: bool = False
    crop_pct: float = 0.9
    interpolation: str = "bicubic"
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    first_conv: str = "patch_embed.conv"
    classifier: Union[str, Tuple[str, str]] = "head"

    @property
    def nb_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def grid_size(self) -> Tuple[int, int]:
        return ((self.input_size[0] - self.patch_size) // self.stride + 1,
                (self.input_size[1] - self.patch_size) // self.stride + 1)

    @property
    def transform_weights(self):
        return {"pos_embed": PoolingVisionTransformer.transform_pos_embed}


class ConvHeadPooling:
    """Depthwise-conv downsampling of the token grid; Dense for cls tokens."""

    def __init__(self, nb_tokens, in_channels, out_channels, stride):
        self.nb_tokens = nb_tokens
        self.out_channels = out_channels
        self.conv = Conv2d(in_channels, out_channels, stride + 1, stride=stride,
                           padding=stride // 2, groups=in_channels)
        self.fc = Dense(in_channels, out_channels)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"conv": self.conv.init(r1), "fc": self.fc.init(r2)}

    def __call__(self, p, x, input_size):
        b, _, c = x.shape
        tokens = x[:, :self.nb_tokens]
        grid = x[:, self.nb_tokens:].reshape(b, *input_size, c)
        grid = self.conv(p["conv"], grid)
        tokens = self.fc(p["fc"], tokens)
        output_size = (grid.shape[1], grid.shape[2])
        grid = grid.reshape(b, -1, self.out_channels)
        return jnp.concatenate([tokens, grid], axis=1), output_size


class PoolingVisionTransformer(Model):
    cfg_class = PoolingVisionTransformerConfig

    def __init__(self, cfg: PoolingVisionTransformerConfig, params=None):
        super().__init__(cfg, params)
        self.nb_features = cfg.embed_dim[-1]
        self.patch_embed = Conv2d(cfg.in_channels, cfg.embed_dim[0],
                                  cfg.patch_size, stride=cfg.stride,
                                  padding="valid",
                                  kernel_init=trunc_normal(0.02))
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        dpr = np.split(dpr, np.cumsum(cfg.nb_blocks))

        self.stages = []
        self.pools = []
        for j in range(len(cfg.nb_blocks)):
            self.stages.append([
                ViTBlock(cfg.embed_dim[j], cfg.nb_heads[j], cfg.mlp_ratio,
                         True, cfg.drop_rate, cfg.attn_drop_rate, dpr[j][k],
                         cfg.norm_layer, cfg.act_layer)
                for k in range(cfg.nb_blocks[j])
            ])
            if j < len(cfg.nb_blocks) - 1:
                self.pools.append(ConvHeadPooling(
                    cfg.nb_tokens, cfg.embed_dim[j], cfg.embed_dim[j + 1],
                    stride=2,
                ))
        self.norm = norm_layer_factory(cfg.norm_layer)(cfg.embed_dim[-1])
        self.head = (Dense(cfg.embed_dim[-1], cfg.nb_classes)
                     if cfg.nb_classes > 0 else None)
        self.head_dist = (Dense(cfg.embed_dim[-1], cfg.nb_classes)
                          if cfg.distilled and cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        cfg = self.cfg
        r = jax.random.split(rng, 6)
        h, w = cfg.grid_size
        transformers = {}
        for j, blocks in enumerate(self.stages):
            stage = {"blocks": {
                str(k): blk.init(jax.random.fold_in(r[0], j * 100 + k))
                for k, blk in enumerate(blocks)
            }}
            transformers[str(j)] = stage
        for j, pool in enumerate(self.pools):
            transformers[str(j + 1)]["pool"] = pool.init(
                jax.random.fold_in(r[1], j)
            )
        p = {
            "patch_embed": {"conv": self.patch_embed.init(r[2])},
            # PT layout (1, C, H, W) for mechanical checkpoint conversion.
            "pos_embed": trunc_normal(0.02)(r[3], (1, cfg.embed_dim[0], h, w)),
            "cls_token": trunc_normal(0.02)(
                jax.random.fold_in(r[3], 1), (1, cfg.nb_tokens, cfg.embed_dim[0])
            ),
            "transformers": transformers,
            "norm": self.norm.init(r[4]),
        }
        if self.head is not None:
            p["head"] = self.head.init(r[5])
        if self.head_dist is not None:
            p["head_dist"] = self.head_dist.init(jax.random.fold_in(r[5], 1))
        return p

    def transform_pos_embed(self, weight, target_cfg):
        pos_embed = jnp.transpose(weight, (0, 2, 3, 1))  # -> (1, H, W, C)
        h, w, c = pos_embed.shape[1:]
        pos_embed = interpolate_pos_embeddings_grid(
            pos_embed.reshape(1, h * w, c), src_grid=(h, w),
            dst_grid=target_cfg.grid_size,
        )
        th, tw = target_cfg.grid_size
        pos_embed = pos_embed.reshape(1, th, tw, c)
        return jnp.transpose(pos_embed, (0, 3, 1, 2))

    def forward_features(self, params, x):
        cfg = self.cfg
        x = self.patch_embed(params["patch_embed"]["conv"], x)
        pos_embed = jnp.transpose(params["pos_embed"], (0, 2, 3, 1))
        if cfg.interpolate_input and x.shape[1:3] != pos_embed.shape[1:3]:
            h, w, c = pos_embed.shape[1:]
            pos_embed = interpolate_pos_embeddings_grid(
                pos_embed.reshape(1, h * w, c), src_grid=(h, w),
                dst_grid=x.shape[1:3],
            ).reshape(1, x.shape[1], x.shape[2], c)
        x = x + pos_embed.astype(x.dtype)
        x = dropout(x, cfg.drop_rate)

        b, h, w, c = x.shape
        input_size = (h, w)
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                               (b, cfg.nb_tokens, c))
        x = jnp.concatenate([cls, x.reshape(b, -1, c)], axis=1)
        capture_feature("patch_embedding", x)

        for j, blocks in enumerate(self.stages):
            tp = params["transformers"][str(j)]
            for k, blk in enumerate(blocks):
                x = blk(tp["blocks"][str(k)], x)
                capture_feature(f"stage_{j}/block_{k}", x)
            if j < len(self.stages) - 1:
                pool_p = params["transformers"][str(j + 1)]["pool"]
                x, input_size = self.pools[j](pool_p, x, input_size)
                capture_feature(f"stage_{j}/pool", x)
        capture_feature("features_all", x)
        x = self.norm(params["norm"], x[:, :cfg.nb_tokens])
        x = x if cfg.distilled else x[:, 0]
        capture_feature("features", x)
        return x

    def forward(self, params, x):
        x = self.forward_features(params, x)
        if not self.cfg.distilled:
            if self.head is not None:
                x = self.head(params["head"], x)
        else:
            y = self.head(params["head"], x[:, 0]) if self.head else x[:, 0]
            y_dist = (self.head_dist(params["head_dist"], x[:, 1])
                      if self.head_dist else x[:, 1])
            x = jnp.stack([y, y_dist], axis=1)
        capture_feature("logits", x)
        return x

    @property
    def feature_names(self):
        names = ["patch_embedding"]
        for j, n in enumerate(self.cfg.nb_blocks):
            names += [f"stage_{j}/block_{k}" for k in range(n)]
            if j < len(self.cfg.nb_blocks) - 1:
                names.append(f"stage_{j}/pool")
        return tuple(names + ["features_all", "features", "logits"])


def _register(name, **kwargs):
    def fn():
        return PoolingVisionTransformer, PoolingVisionTransformerConfig(
            name=name, url="[timm]", **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_register("pit_ti_224", patch_size=16, stride=8, embed_dim=(64, 128, 256),
          nb_blocks=(2, 6, 4), nb_heads=(2, 4, 8))
_register("pit_xs_224", patch_size=16, stride=8, embed_dim=(96, 192, 384),
          nb_blocks=(2, 6, 4), nb_heads=(2, 4, 8))
_register("pit_s_224", patch_size=16, stride=8, embed_dim=(144, 288, 576),
          nb_blocks=(2, 6, 4), nb_heads=(3, 6, 12))
_register("pit_b_224", patch_size=14, stride=7, embed_dim=(256, 512, 1024),
          nb_blocks=(3, 6, 4), nb_heads=(4, 8, 16))
_register("pit_ti_distilled_224", patch_size=16, stride=8,
          embed_dim=(64, 128, 256), nb_blocks=(2, 6, 4), nb_heads=(2, 4, 8),
          distilled=True, classifier=("head", "head_dist"))
_register("pit_xs_distilled_224", patch_size=16, stride=8,
          embed_dim=(96, 192, 384), nb_blocks=(2, 6, 4), nb_heads=(2, 4, 8),
          distilled=True, classifier=("head", "head_dist"))
_register("pit_s_distilled_224", patch_size=16, stride=8,
          embed_dim=(144, 288, 576), nb_blocks=(2, 6, 4), nb_heads=(3, 6, 12),
          distilled=True, classifier=("head", "head_dist"))
_register("pit_b_distilled_224", patch_size=14, stride=7,
          embed_dim=(256, 512, 1024), nb_blocks=(3, 6, 4), nb_heads=(4, 8, 16),
          distilled=True, classifier=("head", "head_dist"))
