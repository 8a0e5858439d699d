"""Pyramid Vision Transformer V2.

TPU-native re-implementation of the reference family
(tfimm/architectures/pvt_v2.py:77-581): overlapping patch embeddings,
depthwise conv inside the MLP (positional information without pos-embeds),
conv or linear (pool) spatial-reduction attention, per-stage final norms,
mean-token pooling head. Param paths mirror the official checkpoints.

Paper: PVTv2, https://arxiv.org/abs/2106.13797.
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
    Conv2d,
    Dense,
    DepthwiseConv2d,
    PatchEmbeddings,
    act_layer_factory,
    norm_layer_factory,
    trunc_normal,
)
from tfimm_tpu.ops.pool import adaptive_avg_pool_2d
from tfimm_tpu.ops.stochastic import drop_path, dropout
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["PyramidVisionTransformerV2", "PyramidVisionTransformerV2Config"]


@dataclass
class PyramidVisionTransformerV2Config(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    embed_dim: Tuple = (64, 128, 256, 512)
    nb_blocks: Tuple = (3, 4, 6, 3)
    nb_heads: Tuple = (1, 2, 5, 8)
    mlp_ratio: Tuple = (8.0, 8.0, 4.0, 4.0)
    sr_ratio: Tuple = (8, 4, 2, 1)
    linear_sr: bool = False
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    attn_drop_rate: float = 0.0
    norm_layer: str = "layer_norm_eps_1e-6"
    act_layer: str = "gelu"
    crop_pct: float = 0.9
    interpolation: str = "bicubic"
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    first_conv: str = "patch_embed1.proj"
    classifier: str = "head"


class PVTv2MLP:
    """MLP with a depthwise conv between fc1 and activation."""

    def __init__(self, embed_dim, hidden_dim, linear_sr, drop_rate, act_layer):
        kinit = trunc_normal(0.02)
        self.fc1 = Dense(embed_dim, hidden_dim, kernel_init=kinit)
        self.dwconv = DepthwiseConv2d(hidden_dim, 3, padding="same")
        self.fc2 = Dense(hidden_dim, embed_dim, kernel_init=kinit)
        self.act = act_layer_factory(act_layer)
        self.relu = act_layer_factory("relu" if linear_sr else "linear")
        self.drop_rate = drop_rate

    def init(self, rng):
        r = jax.random.split(rng, 3)
        return {"fc1": self.fc1.init(r[0]),
                "dwconv": {"dwconv": self.dwconv.init(r[1])},
                "fc2": self.fc2.init(r[2])}

    def __call__(self, p, x, grid_size):
        b, n, _ = x.shape
        x = self.fc1(p["fc1"], x)
        x = self.relu(x)
        d = x.shape[-1]
        x = x.reshape(b, *grid_size, d)
        x = self.dwconv(p["dwconv"]["dwconv"], x)
        x = x.reshape(b, n, d)
        x = self.act(x)
        x = dropout(x, self.drop_rate)
        x = self.fc2(p["fc2"], x)
        return dropout(x, self.drop_rate)


class SpatialReductionAttentionV2:
    """SRA with conv reduction (v1-style) or linear (pool7 + 1x1 conv + GELU)."""

    def __init__(self, embed_dim, nb_heads, sr_ratio, linear_sr, qkv_bias,
                 attn_drop_rate, proj_drop_rate, act_layer):
        self.nb_heads = nb_heads
        self.head_dim = embed_dim // nb_heads
        self.scale = self.head_dim ** -0.5
        self.sr_ratio = sr_ratio
        self.linear_sr = linear_sr
        self.attn_drop_rate = attn_drop_rate
        self.proj_drop_rate = proj_drop_rate
        kinit = trunc_normal(0.02)
        self.q = Dense(embed_dim, embed_dim, use_bias=qkv_bias, kernel_init=kinit)
        self.kv = Dense(embed_dim, 2 * embed_dim, use_bias=qkv_bias,
                        kernel_init=kinit)
        self.proj = Dense(embed_dim, embed_dim, kernel_init=kinit)
        self.act = act_layer_factory(act_layer)
        if linear_sr:
            self.sr = Conv2d(embed_dim, embed_dim, 1, padding="valid")
            self.norm = norm_layer_factory("layer_norm")(embed_dim)
        elif sr_ratio > 1:
            self.sr = Conv2d(embed_dim, embed_dim, sr_ratio, stride=sr_ratio,
                             padding="valid")
            self.norm = norm_layer_factory("layer_norm")(embed_dim)
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
            if self.linear_sr:
                # PT reference: nn.AdaptiveAvgPool2d(7) — always a 7x7 KV
                # grid, with adaptive (possibly overlapping) bin boundaries.
                kv_in = adaptive_avg_pool_2d(kv_in, 7)
            kv_in = self.sr(p["sr"], kv_in).reshape(b, -1, d)
            kv_in = self.norm(p["norm"], kv_in)
            if self.linear_sr:
                kv_in = self.act(kv_in)
        else:
            kv_in = x

        # Fused single-head SRA kernel: MEASURED NEGATIVE on v5e — opt-in
        # only (see pvt.py and scripts/perf/exp_stage1.py).
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


class PVTv2Block:
    def __init__(self, cfg, stage):
        norm = norm_layer_factory(cfg.norm_layer)
        dim = cfg.embed_dim[stage]
        self.norm1 = norm(dim)
        self.attn = SpatialReductionAttentionV2(
            dim, cfg.nb_heads[stage], cfg.sr_ratio[stage], cfg.linear_sr,
            cfg.qkv_bias, cfg.attn_drop_rate, cfg.drop_rate, cfg.act_layer,
        )
        self.norm2 = norm(dim)
        self.mlp = PVTv2MLP(dim, int(dim * cfg.mlp_ratio[stage]),
                            cfg.linear_sr, cfg.drop_rate, cfg.act_layer)
        self.dpr = 0.0  # set by caller

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"norm1": self.norm1.init(r[0]), "attn": self.attn.init(r[1]),
                "norm2": self.norm2.init(r[2]), "mlp": self.mlp.init(r[3])}

    def __call__(self, p, x, grid_size):
        y = self.attn(p["attn"], self.norm1(p["norm1"], x), grid_size)
        x = x + drop_path(y, self.dpr)
        y = self.mlp(p["mlp"], self.norm2(p["norm2"], x), grid_size)
        return x + drop_path(y, self.dpr)


class PyramidVisionTransformerV2(Model):
    cfg_class = PyramidVisionTransformerV2Config

    def __init__(self, cfg, params=None):
        super().__init__(cfg, params)
        self.nb_features = cfg.embed_dim[-1]
        nb_stages = len(cfg.nb_blocks)
        dpr = np.linspace(0, cfg.drop_path_rate, sum(cfg.nb_blocks))

        self.patch_embeds = []
        self.stages = []
        self.norms = []
        in_ch = cfg.in_channels
        k = 0
        for j in range(nb_stages):
            patch_size = 7 if j == 0 else 3
            self.patch_embeds.append(PatchEmbeddings(
                patch_size, cfg.embed_dim[j], in_channels=in_ch,
                stride=4 if j == 0 else 2, padding=patch_size // 2,
                norm_layer=norm_layer_factory("layer_norm"),
            ))
            blocks = []
            for i in range(cfg.nb_blocks[j]):
                blk = PVTv2Block(cfg, j)
                blk.dpr = float(dpr[k + i])
                blocks.append(blk)
            k += cfg.nb_blocks[j]
            self.stages.append(blocks)
            self.norms.append(norm_layer_factory(cfg.norm_layer)(cfg.embed_dim[j]))
            in_ch = cfg.embed_dim[j]
        self.head = (Dense(cfg.embed_dim[-1], cfg.nb_classes)
                     if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        cfg = self.cfg
        p = {}
        for j in range(len(cfg.nb_blocks)):
            r = jax.random.fold_in(rng, j)
            p[f"patch_embed{j + 1}"] = self.patch_embeds[j].init(r)
            p[f"block{j + 1}"] = {
                str(i): blk.init(jax.random.fold_in(r, i + 1))
                for i, blk in enumerate(self.stages[j])
            }
            p[f"norm{j + 1}"] = self.norms[j].init(jax.random.fold_in(r, 98))
        if self.head is not None:
            p["head"] = self.head.init(jax.random.fold_in(rng, 99))
        return p

    def forward_features(self, params, x):
        cfg = self.cfg
        nb_stages = len(cfg.nb_blocks)
        batch = x.shape[0]
        k = 0
        for j in range(nb_stages):
            x, grid = self.patch_embeds[j](params[f"patch_embed{j + 1}"], x)
            capture_feature(f"patch_embedding_{j}", x)
            for i, blk in enumerate(self.stages[j]):
                x = blk(params[f"block{j + 1}"][str(i)], x, grid)
                capture_feature(f"block_{k}", x)
                k += 1
            x = self.norms[j](params[f"norm{j + 1}"], x)
            x = x.reshape(batch, *grid, -1)
            capture_feature(f"stage_{j}", x)
        x = x.reshape(batch, -1, cfg.embed_dim[-1])
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
        names, k = [], 0
        for j in range(len(self.cfg.nb_blocks)):
            names.append(f"patch_embedding_{j}")
            for _ in range(self.cfg.nb_blocks[j]):
                names.append(f"block_{k}")
                k += 1
            names.append(f"stage_{j}")
        return tuple(names + ["features_all", "features", "logits"])


def _register(name, **kwargs):
    def fn():
        url = (f"[pytorch]https://github.com/whai362/PVT/releases/download/"
               f"v2/{name}.pth")
        return PyramidVisionTransformerV2, PyramidVisionTransformerV2Config(
            name=name, url=url, **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_register("pvt_v2_b0", embed_dim=(32, 64, 160, 256), nb_blocks=(2, 2, 2, 2))
_register("pvt_v2_b1", embed_dim=(64, 128, 320, 512), nb_blocks=(2, 2, 2, 2))
_register("pvt_v2_b2", embed_dim=(64, 128, 320, 512), nb_blocks=(3, 4, 6, 3))
_register("pvt_v2_b3", embed_dim=(64, 128, 320, 512), nb_blocks=(3, 4, 18, 3))
_register("pvt_v2_b4", embed_dim=(64, 128, 320, 512), nb_blocks=(3, 8, 27, 3))
_register("pvt_v2_b5", embed_dim=(64, 128, 320, 512), nb_blocks=(3, 6, 40, 3),
          mlp_ratio=(4.0, 4.0, 4.0, 4.0))
_register("pvt_v2_b2_linear", embed_dim=(64, 128, 320, 512),
          nb_blocks=(3, 4, 6, 3), linear_sr=True)
