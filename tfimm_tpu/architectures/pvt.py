"""Pyramid Vision Transformer (PVT).

TPU-native re-implementation of the reference family
(tfimm/architectures/pvt.py:111-453): per-stage patch embeddings + learned
position embeddings, spatial-reduction attention (strided-conv KV
downsampling), class token in the final stage only. Param paths mirror the
official checkpoints (patch_embed1.proj / block1.0.attn.q / pos_embed1).

Paper: PVT, https://arxiv.org/abs/2102.12122.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfimm_tpu.core import capture_feature
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import (
    MLP,
    Conv2d,
    Dense,
    PatchEmbeddings,
    interpolate_pos_embeddings,
    norm_layer_factory,
    trunc_normal,
)
from tfimm_tpu.ops.stochastic import drop_path, dropout
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["PyramidVisionTransformer", "PyramidVisionTransformerConfig",
           "SpatialReductionAttention"]


@dataclass
class PyramidVisionTransformerConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple = (4, 2, 2, 2)
    embed_dim: Tuple = (64, 128, 256, 512)
    nb_blocks: Tuple = (3, 4, 6, 3)
    nb_heads: Tuple = (1, 2, 5, 8)
    mlp_ratio: Tuple = (8.0, 8.0, 4.0, 4.0)
    sr_ratio: Tuple = (8, 4, 2, 1)
    qkv_bias: bool = True
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
    first_conv: str = "patch_embed1.proj"
    classifier: str = "head"

    @property
    def nb_tokens(self) -> Tuple:
        return 0, 0, 0, 1

    @property
    def grid_size(self) -> Tuple:
        grids, size = [], self.input_size
        for p in self.patch_size:
            grids.append((size[0] // p, size[1] // p))
            size = grids[-1]
        return tuple(grids)

    @property
    def nb_patches(self) -> Tuple:
        return tuple(g[0] * g[1] for g in self.grid_size)

    @property
    def transform_weights(self):
        return {
            f"pos_embed{j + 1}": partial(
                PyramidVisionTransformer.transform_pos_embed, stage=j
            )
            for j in range(len(self.nb_blocks))
        }


class SpatialReductionAttention:
    """MHA with KV spatial reduction by a strided conv (sr_ratio > 1)."""

    def __init__(self, embed_dim, nb_heads, sr_ratio, qkv_bias,
                 attn_drop_rate, proj_drop_rate, norm_layer="layer_norm"):
        assert embed_dim % nb_heads == 0
        self.nb_heads = nb_heads
        self.head_dim = embed_dim // nb_heads
        self.scale = self.head_dim ** -0.5
        self.sr_ratio = sr_ratio
        self.attn_drop_rate = attn_drop_rate
        self.proj_drop_rate = proj_drop_rate
        kinit = trunc_normal(0.02)
        self.q = Dense(embed_dim, embed_dim, use_bias=qkv_bias, kernel_init=kinit)
        self.kv = Dense(embed_dim, 2 * embed_dim, use_bias=qkv_bias,
                        kernel_init=kinit)
        self.proj = Dense(embed_dim, embed_dim, kernel_init=kinit)
        if sr_ratio > 1:
            self.sr = Conv2d(embed_dim, embed_dim, sr_ratio, stride=sr_ratio,
                             padding="valid")
            self.norm = norm_layer_factory(norm_layer)(embed_dim)
        else:
            self.sr = None
            self.norm = None

    def init(self, rng):
        r = jax.random.split(rng, 5)
        p = {"q": self.q.init(r[0]), "kv": self.kv.init(r[1]),
             "proj": self.proj.init(r[2])}
        if self.sr is not None:
            p["sr"] = self.sr.init(r[3])
            p["norm"] = self.norm.init(r[4])
        return p

    def __call__(self, p, x, grid_size):
        import os

        from tfimm_tpu.core import is_training

        b, n, d = x.shape
        h, hd = self.nb_heads, self.head_dim

        if self.sr is not None:
            kv_in = x.reshape(b, *grid_size, d)
            kv_in = self.sr(p["sr"], kv_in).reshape(b, -1, d)
            kv_in = self.norm(p["norm"], kv_in)
        else:
            kv_in = x

        # Fused single-head SRA kernel: MEASURED NEGATIVE on v5e (0.2-0.5x
        # vs XLA, scripts/perf/exp_stage1.py) — XLA already fuses the
        # softmax chain and pipelines the skinny matmuls better than one
        # program per image. Opt-in for re-measurement.
        if (h == 1
                and os.environ.get("TFIMM_TPU_FUSED_PVT_SRA", "0") == "1"
                and os.environ.get("TFIMM_TPU_NO_FLASH", "0") != "1"
                and "kernel_q" not in p["q"] and "kernel_q" not in p["proj"]
                and not is_training()):
            from tfimm_tpu.ops.pallas.pvt_sra import sra_attention_or_none

            kv_flat = self.kv(p["kv"], kv_in)
            out = sra_attention_or_none(
                x, kv_flat[..., :d], kv_flat[..., d:],
                p["q"]["kernel"], p["q"].get("bias"),
                p["proj"]["kernel"], p["proj"].get("bias"),
                scale=self.scale)
            if out is not None:
                return dropout(out, self.proj_drop_rate)

        q = self.q(p["q"], x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        kv = self.kv(p["kv"], kv_in).reshape(b, -1, 2, h, hd)
        kv = kv.transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        scale = jnp.asarray(self.scale, q.dtype)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = dropout(attn, self.attn_drop_rate)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = self.proj(p["proj"], out)
        return dropout(out, self.proj_drop_rate)


class PVTBlock:
    def __init__(self, embed_dim, nb_heads, mlp_ratio, sr_ratio, qkv_bias,
                 drop_rate, attn_drop_rate, drop_path_rate, norm_layer,
                 act_layer):
        norm = norm_layer_factory(norm_layer)
        self.norm1 = norm(embed_dim)
        self.attn = SpatialReductionAttention(
            embed_dim, nb_heads, sr_ratio, qkv_bias, attn_drop_rate, drop_rate
        )
        self.norm2 = norm(embed_dim)
        self.mlp = MLP(embed_dim, int(embed_dim * mlp_ratio),
                       act_layer=act_layer, drop_rate=drop_rate,
                       kernel_init=trunc_normal(0.02))
        self.dpr = drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"norm1": self.norm1.init(r[0]), "attn": self.attn.init(r[1]),
                "norm2": self.norm2.init(r[2]), "mlp": self.mlp.init(r[3])}

    def __call__(self, p, x, grid_size):
        y = self.attn(p["attn"], self.norm1(p["norm1"], x), grid_size)
        x = x + drop_path(y, self.dpr)
        y = self.mlp(p["mlp"], self.norm2(p["norm2"], x))
        return x + drop_path(y, self.dpr)


class PyramidVisionTransformer(Model):
    cfg_class = PyramidVisionTransformerConfig

    def __init__(self, cfg: PyramidVisionTransformerConfig, params=None):
        super().__init__(cfg, params)
        self.nb_features = cfg.embed_dim[-1]
        nb_stages = len(cfg.nb_blocks)
        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.nb_blocks))

        self.patch_embeds = []
        self.stages = []
        in_ch = cfg.in_channels
        k = 0
        for j in range(nb_stages):
            self.patch_embeds.append(PatchEmbeddings(
                cfg.patch_size[j], cfg.embed_dim[j], in_channels=in_ch,
                norm_layer=norm_layer_factory("layer_norm"),
            ))
            blocks = [
                PVTBlock(cfg.embed_dim[j], cfg.nb_heads[j], cfg.mlp_ratio[j],
                         cfg.sr_ratio[j], cfg.qkv_bias, cfg.drop_rate,
                         cfg.attn_drop_rate, dpr[k + i], cfg.norm_layer,
                         cfg.act_layer)
                for i in range(cfg.nb_blocks[j])
            ]
            k += cfg.nb_blocks[j]
            self.stages.append(blocks)
            in_ch = cfg.embed_dim[j]
        self.norm = norm_layer_factory(cfg.norm_layer)(cfg.embed_dim[-1])
        self.head = (Dense(cfg.embed_dim[-1], cfg.nb_classes)
                     if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        cfg = self.cfg
        p = {}
        for j in range(len(cfg.nb_blocks)):
            r = jax.random.fold_in(rng, j)
            p[f"patch_embed{j + 1}"] = self.patch_embeds[j].init(r)
            p[f"pos_embed{j + 1}"] = trunc_normal(0.02)(
                jax.random.fold_in(r, 1),
                (1, cfg.nb_patches[j] + cfg.nb_tokens[j], cfg.embed_dim[j]),
            )
            p[f"block{j + 1}"] = {
                str(i): blk.init(jax.random.fold_in(r, i + 2))
                for i, blk in enumerate(self.stages[j])
            }
        r = jax.random.fold_in(rng, 99)
        p["cls_token"] = trunc_normal(0.02)(r, (1, 1, cfg.embed_dim[-1]))
        p["norm"] = self.norm.init(jax.random.fold_in(r, 1))
        if self.head is not None:
            p["head"] = self.head.init(jax.random.fold_in(r, 2))
        return p

    def transform_pos_embed(self, weight, target_cfg, stage: int):
        return interpolate_pos_embeddings(
            weight, src_grid=self.cfg.grid_size[stage],
            dst_grid=target_cfg.grid_size[stage],
            nb_tokens=self.cfg.nb_tokens[stage],
        )

    def forward_features(self, params, x):
        cfg = self.cfg
        nb_stages = len(cfg.nb_blocks)
        batch = x.shape[0]
        k = 0
        for j in range(nb_stages):
            x, grid = self.patch_embeds[j](params[f"patch_embed{j + 1}"], x)
            capture_feature(f"patch_embedding_{j}", x)
            if j == nb_stages - 1:
                cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                                       (batch, 1, cfg.embed_dim[-1]))
                x = jnp.concatenate([cls, x], axis=1)
            pos_embed = params[f"pos_embed{j + 1}"]
            if cfg.interpolate_input and grid != cfg.grid_size[j]:
                pos_embed = interpolate_pos_embeddings(
                    pos_embed, src_grid=cfg.grid_size[j], dst_grid=grid,
                    nb_tokens=cfg.nb_tokens[j],
                )
            x = x + pos_embed.astype(x.dtype)
            x = dropout(x, cfg.drop_rate)
            capture_feature(f"pos_embedding_{j}", x)
            for i, blk in enumerate(self.stages[j]):
                x = blk(params[f"block{j + 1}"][str(i)], x, grid)
                capture_feature(f"block_{k}", x)
                k += 1
            if j != nb_stages - 1:
                x = x.reshape(batch, *grid, -1)
            capture_feature(f"stage_{j}", x)
        x = self.norm(params["norm"], x)
        capture_feature("features_all", x)
        x = x[:, 0]
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
        names, k = [], 0
        for j in range(len(self.cfg.nb_blocks)):
            names += [f"patch_embedding_{j}", f"pos_embedding_{j}"]
            for _ in range(self.cfg.nb_blocks[j]):
                names.append(f"block_{k}")
                k += 1
            names.append(f"stage_{j}")
        return tuple(names + ["features_all", "features", "logits"])


def _register(name, **kwargs):
    def fn():
        url = (f"[pytorch]https://github.com/whai362/PVT/releases/download/"
               f"v2/{name}.pth")
        return PyramidVisionTransformer, PyramidVisionTransformerConfig(
            name=name, url=url, **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_register("pvt_tiny", embed_dim=(64, 128, 320, 512), nb_blocks=(2, 2, 2, 2))
_register("pvt_small", embed_dim=(64, 128, 320, 512), nb_blocks=(3, 4, 6, 3))
_register("pvt_medium", embed_dim=(64, 128, 320, 512), nb_blocks=(3, 4, 18, 3))
_register("pvt_large", embed_dim=(64, 128, 320, 512), nb_blocks=(3, 8, 27, 3))
