"""CaiT — Class-Attention in Image Transformers.

TPU-native re-implementation of the reference family
(tfimm/architectures/cait.py:97-430): two-stage design — patch self-attention
blocks with talking-head attention and layer scale, then two class-attention
blocks that update only the class token. Param paths mirror timm
(blocks.N.attn.qkv / blocks_token_only.N.attn.q / gamma_1).

Paper: Going deeper with Image Transformers, https://arxiv.org/abs/2103.17239.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from tfimm_tpu.core import capture_feature, current_context
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import (
    MLP,
    Dense,
    PatchEmbeddings,
    interpolate_pos_embeddings,
    norm_layer_factory,
    trunc_normal,
)
from tfimm_tpu.ops.stochastic import drop_path, dropout
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["CaiT", "CaiTConfig"]


@dataclass
class CaiTConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    embed_dim: int = 768
    nb_blocks: int = 12
    nb_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    attn_drop_rate: float = 0.0
    norm_layer: str = "layer_norm_eps_1e-6"
    act_layer: str = "gelu"
    init_scale: float = 1e-4
    interpolate_input: bool = False
    crop_pct: float = 1.0
    interpolation: str = "bicubic"
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    first_conv: str = "patch_embed.proj"
    classifier: str = "head"

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.input_size[0] // self.patch_size,
                self.input_size[1] // self.patch_size)

    @property
    def nb_patches(self) -> int:
        return self.grid_size[0] * self.grid_size[1]

    @property
    def transform_weights(self):
        return {"pos_embed": CaiT.transform_pos_embed}


class ClassAttention:
    """Attention where only the class token attends to the full sequence."""

    def __init__(self, embed_dim, nb_heads, qkv_bias):
        self.nb_heads = nb_heads
        self.head_dim = embed_dim // nb_heads
        self.scale = self.head_dim ** -0.5
        kinit = trunc_normal(0.02)
        self.q = Dense(embed_dim, embed_dim, use_bias=qkv_bias, kernel_init=kinit)
        self.k = Dense(embed_dim, embed_dim, use_bias=qkv_bias, kernel_init=kinit)
        self.v = Dense(embed_dim, embed_dim, use_bias=qkv_bias, kernel_init=kinit)
        self.proj = Dense(embed_dim, embed_dim, kernel_init=kinit)

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"q": self.q.init(r[0]), "k": self.k.init(r[1]),
                "v": self.v.init(r[2]), "proj": self.proj.init(r[3])}

    def __call__(self, p, x):
        b, n, d = x.shape
        h, hd = self.nb_heads, self.head_dim
        q = self.q(p["q"], x[:, :1])  # (B, 1, D)
        q = q.reshape(b, 1, h, hd).transpose(0, 2, 1, 3) * self.scale
        k = self.k(p["k"], x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        v = self.v(p["v"], x).reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, d)
        return self.proj(p["proj"], out)


class TalkingHeadAttention:
    """Self-attention with linear head mixing before and after softmax."""

    def __init__(self, embed_dim, nb_heads, qkv_bias, attn_drop_rate,
                 proj_drop_rate):
        self.nb_heads = nb_heads
        self.head_dim = embed_dim // nb_heads
        self.scale = self.head_dim ** -0.5
        self.attn_drop_rate = attn_drop_rate
        self.proj_drop_rate = proj_drop_rate
        kinit = trunc_normal(0.02)
        self.qkv = Dense(embed_dim, 3 * embed_dim, use_bias=qkv_bias,
                         kernel_init=kinit)
        self.proj = Dense(embed_dim, embed_dim, kernel_init=kinit)
        self.proj_l = Dense(nb_heads, nb_heads, kernel_init=kinit)
        self.proj_w = Dense(nb_heads, nb_heads, kernel_init=kinit)

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"qkv": self.qkv.init(r[0]), "proj": self.proj.init(r[1]),
                "proj_l": self.proj_l.init(r[2]), "proj_w": self.proj_w.init(r[3])}

    def __call__(self, p, x):
        b, n, d = x.shape
        h, hd = self.nb_heads, self.head_dim

        ctx = current_context()
        if (os.environ.get("TFIMM_TPU_NO_FLASH", "0") != "1"
                and "kernel_q" not in p["proj_l"]
                and "kernel_q" not in p["proj_w"]
                and not (ctx.training and self.attn_drop_rate > 0.0)):
            # Fused talking-head kernel: both (H, H) head mixes fold into
            # lane scalings of Q/V, so the (B, H, N, N) score tensor never
            # round-trips HBM (tfimm_tpu/ops/pallas/cait_attention.py). The
            # dispatcher declines off-TPU; unused ops are then DCE'd.
            from tfimm_tpu.ops.pallas.cait_attention import (
                talking_head_attention_or_none,
            )

            qkv_flat = self.qkv(p["qkv"], x)
            out = talking_head_attention_or_none(
                qkv_flat, p["proj_l"]["kernel"], p["proj_l"].get("bias"),
                p["proj_w"]["kernel"], p["proj_w"].get("bias"),
                nb_heads=h, scale=self.scale,
            )
            if out is not None:
                out = self.proj(p["proj"], out)
                return dropout(out, self.proj_drop_rate)

        qkv = self.qkv(p["qkv"], x).reshape(b, n, 3, h, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * self.scale, k)
        # Head mixing: operate on the head axis moved last.
        attn = self.proj_l(p["proj_l"], attn.transpose(0, 2, 3, 1))
        attn = jax.nn.softmax(attn.transpose(0, 3, 1, 2).astype(jnp.float32),
                              axis=-1).astype(x.dtype)
        attn = self.proj_w(p["proj_w"], attn.transpose(0, 2, 3, 1))
        attn = attn.transpose(0, 3, 1, 2)
        attn = dropout(attn, self.attn_drop_rate)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        out = self.proj(p["proj"], out)
        return dropout(out, self.proj_drop_rate)


class LayerScaleBlock:
    """Pre-norm talking-head attention block with layer scale."""

    def __init__(self, cfg: CaiTConfig, drop_path_rate: float):
        norm = norm_layer_factory(cfg.norm_layer)
        self.norm1 = norm(cfg.embed_dim)
        self.attn = TalkingHeadAttention(cfg.embed_dim, cfg.nb_heads,
                                         cfg.qkv_bias, cfg.attn_drop_rate,
                                         cfg.drop_rate)
        self.norm2 = norm(cfg.embed_dim)
        self.mlp = MLP(cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio),
                       act_layer=cfg.act_layer, drop_rate=cfg.drop_rate,
                       kernel_init=trunc_normal(0.02))
        self.init_scale = cfg.init_scale
        self.embed_dim = cfg.embed_dim
        self.dpr = drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"norm1": self.norm1.init(r[0]), "attn": self.attn.init(r[1]),
                "norm2": self.norm2.init(r[2]), "mlp": self.mlp.init(r[3]),
                "gamma_1": jnp.full((self.embed_dim,), self.init_scale),
                "gamma_2": jnp.full((self.embed_dim,), self.init_scale)}

    def __call__(self, p, x):
        y = self.attn(p["attn"], self.norm1(p["norm1"], x))
        x = x + drop_path(y * p["gamma_1"].astype(y.dtype), self.dpr)
        y = self.mlp(p["mlp"], self.norm2(p["norm2"], x))
        x = x + drop_path(y * p["gamma_2"].astype(y.dtype), self.dpr)
        return x


class LayerScaleBlockClassAttention:
    """Class-attention block: updates only the class token."""

    def __init__(self, cfg: CaiTConfig, drop_path_rate: float):
        norm = norm_layer_factory(cfg.norm_layer)
        self.norm1 = norm(cfg.embed_dim)
        self.attn = ClassAttention(cfg.embed_dim, cfg.nb_heads, cfg.qkv_bias)
        self.norm2 = norm(cfg.embed_dim)
        self.mlp = MLP(cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio),
                       act_layer=cfg.act_layer,
                       kernel_init=trunc_normal(0.02))
        self.init_scale = cfg.init_scale
        self.embed_dim = cfg.embed_dim
        self.dpr = drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"norm1": self.norm1.init(r[0]), "attn": self.attn.init(r[1]),
                "norm2": self.norm2.init(r[2]), "mlp": self.mlp.init(r[3]),
                "gamma_1": jnp.full((self.embed_dim,), self.init_scale),
                "gamma_2": jnp.full((self.embed_dim,), self.init_scale)}

    def __call__(self, p, x):
        x_cls = x[:, :1]
        u = self.norm1(p["norm1"], x)
        u = self.attn(p["attn"], u) * p["gamma_1"].astype(x.dtype)
        x_cls = x_cls + drop_path(u, self.dpr)
        shortcut = x_cls
        y = self.mlp(p["mlp"], self.norm2(p["norm2"], x_cls))
        x_cls = shortcut + drop_path(y * p["gamma_2"].astype(y.dtype), self.dpr)
        return jnp.concatenate([x_cls, x[:, 1:]], axis=1)


class CaiT(Model):
    cfg_class = CaiTConfig

    def __init__(self, cfg: CaiTConfig, params=None):
        super().__init__(cfg, params)
        self.nb_features = cfg.embed_dim
        self.patch_embed = PatchEmbeddings(cfg.patch_size, cfg.embed_dim,
                                           in_channels=cfg.in_channels)
        self.blocks = [LayerScaleBlock(cfg, cfg.drop_path_rate)
                       for _ in range(cfg.nb_blocks)]
        self.blocks_token_only = [LayerScaleBlockClassAttention(cfg, 0.0)
                                  for _ in range(2)]
        self.norm = norm_layer_factory(cfg.norm_layer)(cfg.embed_dim)
        self.head = (Dense(cfg.embed_dim, cfg.nb_classes)
                     if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        cfg = self.cfg
        r = jax.random.split(rng, 6)
        p = {
            "patch_embed": self.patch_embed.init(r[0]),
            "cls_token": trunc_normal(0.02)(r[1], (1, 1, cfg.embed_dim)),
            "pos_embed": trunc_normal(0.02)(r[2], (1, cfg.nb_patches,
                                                   cfg.embed_dim)),
            "blocks": {str(j): blk.init(jax.random.fold_in(r[3], j))
                       for j, blk in enumerate(self.blocks)},
            "blocks_token_only": {
                str(j): blk.init(jax.random.fold_in(r[4], j))
                for j, blk in enumerate(self.blocks_token_only)
            },
            "norm": self.norm.init(r[5]),
        }
        if self.head is not None:
            p["head"] = self.head.init(jax.random.fold_in(r[5], 1))
        return p

    def transform_pos_embed(self, weight, target_cfg: "CaiTConfig"):
        # CaiT adds the class token only before the class-attention stage, so
        # the pos-embed grid has no leading tokens.
        return interpolate_pos_embeddings(
            weight, src_grid=self.cfg.grid_size, dst_grid=target_cfg.grid_size,
            nb_tokens=0,
        )

    def forward_features(self, params, x):
        cfg = self.cfg
        x, grid = self.patch_embed(params["patch_embed"], x)
        pos_embed = params["pos_embed"]
        if cfg.interpolate_input and grid != cfg.grid_size:
            pos_embed = interpolate_pos_embeddings(
                pos_embed, src_grid=cfg.grid_size, dst_grid=grid, nb_tokens=0
            )
        x = x + pos_embed.astype(x.dtype)
        x = dropout(x, cfg.drop_rate)
        capture_feature("patch_embedding", x)

        for j, blk in enumerate(self.blocks):
            x = blk(params["blocks"][str(j)], x)
            capture_feature(f"block_{j}", x)

        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                               (x.shape[0], 1, cfg.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        capture_feature("features_cls_token", x)
        for j, blk in enumerate(self.blocks_token_only):
            x = blk(params["blocks_token_only"][str(j)], x)
            capture_feature(f"block_cls_token_{j}", x)
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
        return tuple(
            ["patch_embedding"]
            + [f"block_{j}" for j in range(self.cfg.nb_blocks)]
            + ["features_cls_token"]
            + [f"block_cls_token_{j}" for j in range(2)]
            + ["features_all", "features", "logits"]
        )


def _register(name, **kwargs):
    def fn():
        return CaiT, CaiTConfig(name=name, url="[timm]", **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_register("cait_xxs24_224", patch_size=16, embed_dim=192, nb_blocks=24,
          nb_heads=4, init_scale=1e-5)
_register("cait_xxs24_384", input_size=(384, 384), patch_size=16,
          embed_dim=192, nb_blocks=24, nb_heads=4, init_scale=1e-5)
_register("cait_xxs36_224", patch_size=16, embed_dim=192, nb_blocks=36,
          nb_heads=4, init_scale=1e-5)
_register("cait_xxs36_384", input_size=(384, 384), patch_size=16,
          embed_dim=192, nb_blocks=36, nb_heads=4, init_scale=1e-5)
_register("cait_xs24_384", input_size=(384, 384), patch_size=16,
          embed_dim=288, nb_blocks=24, nb_heads=6, init_scale=1e-5)
_register("cait_s24_224", patch_size=16, embed_dim=384, nb_blocks=24,
          nb_heads=8, init_scale=1e-5)
_register("cait_s24_384", input_size=(384, 384), patch_size=16, embed_dim=384,
          nb_blocks=24, nb_heads=8, init_scale=1e-5)
_register("cait_s36_384", input_size=(384, 384), patch_size=16, embed_dim=384,
          nb_blocks=36, nb_heads=8, init_scale=1e-6)
_register("cait_m36_384", input_size=(384, 384), patch_size=16, embed_dim=768,
          nb_blocks=36, nb_heads=16, init_scale=1e-6)
_register("cait_m48_448", input_size=(448, 448), patch_size=16, embed_dim=768,
          nb_blocks=48, nb_heads=16, init_scale=1e-6)
