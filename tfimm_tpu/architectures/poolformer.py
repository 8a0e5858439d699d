"""PoolFormer (reference: tfimm/architectures/poolformer.py:206-419).

MetaFormer with average-pool token mixing (pool(x) - x), GroupNorm(1 group),
1x1-conv MLPs and layer scale. Param paths mirror the official checkpoints
(patch_embed.proj / network.{2j}.{k}.norm1 / network.{2j+1}.proj / head).

Paper: MetaFormer is Actually What You Need, https://arxiv.org/abs/2111.11418.
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
from tfimm_tpu.ops import ConvMLP, Dense, PatchEmbeddings, norm_layer_factory, trunc_normal
from tfimm_tpu.ops.pool import avg_pool_2d_exclude_pad
from tfimm_tpu.ops.stochastic import drop_path
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["PoolFormer", "PoolFormerConfig"]


@dataclass
class PoolFormerConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    embed_dim: Tuple = (64, 128, 320, 512)
    nb_blocks: Tuple = (2, 2, 6, 2)
    mlp_ratio: Tuple = (4.0, 4.0, 4.0, 4.0)
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_layer: str = "group_norm_1grp"
    act_layer: str = "gelu"
    init_scale: float = 1e-5
    crop_pct: float = 0.95
    interpolation: str = "bicubic"
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    first_conv: str = "patch_embed.proj"
    classifier: str = "head"


class PoolFormerBlock:
    def __init__(self, embed_dim, mlp_ratio, drop_rate, drop_path_rate,
                 norm_layer, act_layer, init_scale):
        norm = norm_layer_factory(norm_layer)
        self.norm1 = norm(embed_dim)
        self.norm2 = norm(embed_dim)
        self.mlp = ConvMLP(embed_dim, int(embed_dim * mlp_ratio),
                           act_layer=act_layer, drop_rate=drop_rate,
                           kernel_init=trunc_normal(0.02))
        self.embed_dim = embed_dim
        self.init_scale = init_scale
        self.dpr = drop_path_rate
        self.mlp_ratio = mlp_ratio
        self.fusable = norm_layer == "group_norm_1grp" and act_layer == "gelu"

    def init(self, rng):
        r = jax.random.split(rng, 3)
        return {"norm1": self.norm1.init(r[0]), "norm2": self.norm2.init(r[1]),
                "mlp": self.mlp.init(r[2]),
                "layer_scale_1": jnp.full((self.embed_dim,), self.init_scale),
                "layer_scale_2": jnp.full((self.embed_dim,), self.init_scale)}

    def __call__(self, p, x):
        import os

        from tfimm_tpu.core import is_training

        # Fused whole-block kernel: MEASURED NEGATIVE on v5e (0.5-0.6x vs
        # XLA at every stage, scripts/perf/exp_stage1.py) — XLA's own fusion
        # of the pool/norm/MLP chain plus pipelined scheduling beats the
        # one-program-per-image kernel. Opt-in for re-measurement.
        from tfimm_tpu.quant import any_quantized

        if (os.environ.get("TFIMM_TPU_FUSED_POOLFORMER", "0") == "1"
                and os.environ.get("TFIMM_TPU_NO_FLASH", "0") != "1"
                # the kernel reads both MLP kernels raw — gate on both
                and not any_quantized(p["mlp"]["fc1"], p["mlp"]["fc2"])
                and self.fusable and not is_training()):
            from tfimm_tpu.ops.pallas.poolformer_block import (
                poolformer_block_or_none,
            )

            out = poolformer_block_or_none(p, x, mlp_ratio=self.mlp_ratio)
            if out is not None:
                return out

        shortcut = x
        y = self.norm1(p["norm1"], x)
        y = avg_pool_2d_exclude_pad(y, 3, stride=1) - y  # token mixer
        y = y * p["layer_scale_1"].astype(y.dtype)
        x = shortcut + drop_path(y, self.dpr)
        shortcut = x
        y = self.norm2(p["norm2"], x)
        y = self.mlp(p["mlp"], y)
        y = y * p["layer_scale_2"].astype(y.dtype)
        return shortcut + drop_path(y, self.dpr)


class PoolFormer(Model):
    cfg_class = PoolFormerConfig

    def __init__(self, cfg: PoolFormerConfig, params=None):
        super().__init__(cfg, params)
        self.nb_features = cfg.embed_dim[-1]
        kinit = trunc_normal(0.02)
        self.patch_embed = PatchEmbeddings(
            7, cfg.embed_dim[0], in_channels=cfg.in_channels, stride=4,
            padding=2, flatten=False, kernel_init=kinit,
        )
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        dpr = np.split(dpr, np.cumsum(cfg.nb_blocks))

        # network entries: key "2j" -> list of blocks, key "2j+1" -> downsample
        self.network = {}
        for j in range(len(cfg.nb_blocks)):
            self.network[str(2 * j)] = [
                PoolFormerBlock(cfg.embed_dim[j], cfg.mlp_ratio[j],
                                cfg.drop_rate, dpr[j][k], cfg.norm_layer,
                                cfg.act_layer, cfg.init_scale)
                for k in range(cfg.nb_blocks[j])
            ]
            if j < len(cfg.nb_blocks) - 1:
                self.network[str(2 * j + 1)] = PatchEmbeddings(
                    3, cfg.embed_dim[j + 1], in_channels=cfg.embed_dim[j],
                    stride=2, padding=1, flatten=False, kernel_init=kinit,
                )
        self.norm = norm_layer_factory(cfg.norm_layer)(self.nb_features)
        self.head = (Dense(self.nb_features, cfg.nb_classes)
                     if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        r = jax.random.split(rng, 4)
        network = {}
        for key, entry in self.network.items():
            sub_rng = jax.random.fold_in(r[1], int(key))
            if isinstance(entry, list):
                network[key] = {str(k): blk.init(jax.random.fold_in(sub_rng, k))
                                for k, blk in enumerate(entry)}
            else:
                network[key] = entry.init(sub_rng)
        p = {"patch_embed": self.patch_embed.init(r[0]), "network": network,
             "norm": self.norm.init(r[2])}
        if self.head is not None:
            p["head"] = self.head.init(r[3])
        return p

    def forward_features(self, params, x):
        x, _ = self.patch_embed(params["patch_embed"], x)
        capture_feature("patch_embedding", x)
        nb_stages = len(self.cfg.nb_blocks)
        for j in range(nb_stages):
            blocks = self.network[str(2 * j)]
            bp = params["network"][str(2 * j)]
            for k, blk in enumerate(blocks):
                x = blk(bp[str(k)], x)
                capture_feature(f"stage_{j}/block_{k}", x)
            if j < nb_stages - 1:
                x, _ = self.network[str(2 * j + 1)](
                    params["network"][str(2 * j + 1)], x
                )
                capture_feature(f"stage_{j}/downsample", x)
        x = self.norm(params["norm"], x)
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
        names = ["patch_embedding"]
        nb_stages = len(self.cfg.nb_blocks)
        for j in range(nb_stages):
            names += [f"stage_{j}/block_{k}" for k in range(self.cfg.nb_blocks[j])]
            if j < nb_stages - 1:
                names.append(f"stage_{j}/downsample")
        return tuple(names + ["features_all", "features", "logits"])


def _register(name, **kwargs):
    def fn():
        url = ("[pytorch]https://github.com/sail-sg/poolformer/releases/"
               f"download/v1.0/{name}.pth.tar")
        return PoolFormer, PoolFormerConfig(name=name, url=url, **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_register("poolformer_s12", embed_dim=(64, 128, 320, 512),
          nb_blocks=(2, 2, 6, 2), crop_pct=0.9)
_register("poolformer_s24", embed_dim=(64, 128, 320, 512),
          nb_blocks=(4, 4, 12, 4), crop_pct=0.9)
_register("poolformer_s36", embed_dim=(64, 128, 320, 512),
          nb_blocks=(6, 6, 18, 6), init_scale=1e-6, crop_pct=0.9)
_register("poolformer_m36", embed_dim=(96, 192, 384, 768),
          nb_blocks=(6, 6, 18, 6), init_scale=1e-6, crop_pct=0.95)
_register("poolformer_m48", embed_dim=(96, 192, 384, 768),
          nb_blocks=(8, 8, 24, 8), init_scale=1e-6, crop_pct=0.95)
