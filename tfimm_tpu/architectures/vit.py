"""Vision Transformer (ViT) and DeiT.

TPU-native re-implementation of the reference family
(tfimm/architectures/vit.py:37-476): class/dist tokens, learned position
embeddings with interpolation hooks, optional representation (pre-logits)
layer, distilled dual heads, variable-resolution inference via
``interpolate_input``. Parameter paths mirror timm (``blocks.0.attn.qkv`` …)
so checkpoints convert mechanically.

Papers: ViT https://arxiv.org/abs/2010.11929, DeiT https://arxiv.org/abs/2012.12877.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from tfimm_tpu.core import capture_feature
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import (
    Dense,
    MLP,
    MultiHeadAttention,
    PatchEmbeddings,
    interpolate_pos_embeddings,
    norm_layer_factory,
    trunc_normal,
)
from tfimm_tpu.ops.basic import zeros_init
from tfimm_tpu.ops.stochastic import drop_path, dropout
from tfimm_tpu.utils.constants import (
    IMAGENET_DEFAULT_MEAN,
    IMAGENET_DEFAULT_STD,
    IMAGENET_INCEPTION_MEAN,
    IMAGENET_INCEPTION_STD,
)

__all__ = ["ViT", "ViTBlock", "ViTConfig"]


@dataclass
class ViTConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    patch_layer: str = "patch_embeddings"
    patch_nb_blocks: tuple = ()
    patch_size: int = 16
    embed_dim: int = 768
    nb_blocks: int = 12
    nb_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    representation_size: Optional[int] = None
    distilled: bool = False
    # Regularization
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # Other parameters
    norm_layer: str = "layer_norm_eps_1e-6"
    act_layer: str = "gelu"
    # Parameters for inference
    interpolate_input: bool = False
    crop_pct: float = 0.875
    interpolation: str = "bicubic"
    mean: Tuple[float, float, float] = IMAGENET_INCEPTION_MEAN
    std: Tuple[float, float, float] = IMAGENET_INCEPTION_STD
    first_conv: str = "patch_embed.proj"
    classifier: Union[str, Tuple[str, str]] = "head"

    @property
    def nb_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def grid_size(self) -> Tuple[int, int]:
        grid = (self.input_size[0] // self.patch_size,
                self.input_size[1] // self.patch_size)
        if self.patch_layer == "hybrid_embeddings":
            reductions = 2 + max(len(self.patch_nb_blocks) - 1, 0)
            stride = 2 ** reductions
            grid = (grid[0] // stride, grid[1] // stride)
        return grid

    @property
    def nb_patches(self) -> int:
        return self.grid_size[0] * self.grid_size[1]

    @property
    def transform_weights(self):
        return {"pos_embed": ViT.transform_pos_embed}


class ViTBlock:
    """Pre-norm transformer encoder block (attn + MLP, residuals, drop-path)."""

    def __init__(self, embed_dim, nb_heads, mlp_ratio=4.0, qkv_bias=True,
                 drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
                 norm_layer="layer_norm_eps_1e-6", act_layer="gelu"):
        norm = norm_layer_factory(norm_layer)
        self.norm1 = norm(embed_dim)
        self.attn = MultiHeadAttention(
            embed_dim, nb_heads, qkv_bias=qkv_bias,
            attn_drop_rate=attn_drop_rate, proj_drop_rate=drop_rate,
        )
        self.norm2 = norm(embed_dim)
        self.mlp = MLP(embed_dim, int(embed_dim * mlp_ratio),
                       act_layer=act_layer, drop_rate=drop_rate,
                       kernel_init=trunc_normal(0.02))
        self.drop_path_rate = drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"norm1": self.norm1.init(r[0]), "attn": self.attn.init(r[1]),
                "norm2": self.norm2.init(r[2]), "mlp": self.mlp.init(r[3])}

    def __call__(self, p, x, feature_name: Optional[str] = None):
        shortcut = x
        y = self.norm1(p["norm1"], x)
        y = self.attn(p["attn"], y, feature_name=feature_name)
        x = shortcut + drop_path(y, self.drop_path_rate)
        y = self.norm2(p["norm2"], x)
        y = self.mlp(p["mlp"], y)
        x = x + drop_path(y, self.drop_path_rate)
        return x


class ViT(Model):
    cfg_class = ViTConfig

    def __init__(self, cfg: ViTConfig, params=None):
        super().__init__(cfg, params)
        self.nb_features = cfg.representation_size or cfg.embed_dim

        if cfg.patch_layer == "patch_embeddings":
            self.patch_embed = PatchEmbeddings(
                cfg.patch_size, cfg.embed_dim, in_channels=cfg.in_channels,
            )
        elif cfg.patch_layer == "hybrid_embeddings":
            from tfimm_tpu.architectures.vit_hybrid import HybridEmbeddings

            self.patch_embed = HybridEmbeddings(
                in_channels=cfg.in_channels,
                input_size=cfg.input_size,
                nb_blocks=cfg.patch_nb_blocks,
                patch_size=cfg.patch_size,
                embed_dim=cfg.embed_dim,
                drop_path_rate=cfg.drop_path_rate,
            )
        else:
            raise ValueError(f"Unknown patch layer: {cfg.patch_layer}.")

        self.blocks = [
            ViTBlock(cfg.embed_dim, cfg.nb_heads, cfg.mlp_ratio, cfg.qkv_bias,
                     cfg.drop_rate, cfg.attn_drop_rate, cfg.drop_path_rate,
                     cfg.norm_layer, cfg.act_layer)
            for _ in range(cfg.nb_blocks)
        ]
        self.norm = norm_layer_factory(cfg.norm_layer)(cfg.embed_dim)
        if cfg.representation_size:
            if cfg.distilled:
                raise ValueError("Cannot combine distillation and representation "
                                 "layer.")
            self.pre_logits = Dense(cfg.embed_dim, cfg.representation_size,
                                    kernel_init=trunc_normal(0.02))
        else:
            self.pre_logits = None
        self.head = (Dense(self.nb_features, cfg.nb_classes,
                           kernel_init=zeros_init(), bias_init=zeros_init())
                     if cfg.nb_classes > 0 else None)
        self.head_dist = (Dense(cfg.embed_dim, cfg.nb_classes,
                                kernel_init=zeros_init(), bias_init=zeros_init())
                          if cfg.distilled and cfg.nb_classes > 0 else None)

    # -- params ------------------------------------------------------------
    def init_params(self, rng):
        cfg = self.cfg
        r = jax.random.split(rng, 8)
        p = {
            "patch_embed": self.patch_embed.init(r[0]),
            "cls_token": trunc_normal(0.02)(r[1], (1, 1, cfg.embed_dim)),
            "pos_embed": trunc_normal(0.02)(
                r[2], (1, cfg.nb_patches + cfg.nb_tokens, cfg.embed_dim)
            ),
            "blocks": {
                str(j): blk.init(jax.random.fold_in(r[3], j))
                for j, blk in enumerate(self.blocks)
            },
            "norm": self.norm.init(r[4]),
        }
        if cfg.distilled:
            p["dist_token"] = trunc_normal(0.02)(r[5], (1, 1, cfg.embed_dim))
        if self.pre_logits is not None:
            p["pre_logits"] = {"fc": self.pre_logits.init(r[6])}
        if self.head is not None:
            p["head"] = self.head.init(r[7])
        if self.head_dist is not None:
            p["head_dist"] = self.head_dist.init(jax.random.fold_in(r[7], 1))
        return p

    # -- weight-transfer hook (reference: vit.py:414-420) ---------------------
    def transform_pos_embed(self, weight, target_cfg: ViTConfig):
        return interpolate_pos_embeddings(
            weight, src_grid=self.cfg.grid_size, dst_grid=target_cfg.grid_size,
            nb_tokens=self.cfg.nb_tokens,
        )

    # -- forward -------------------------------------------------------------
    def forward_features(self, params, x):
        cfg = self.cfg
        batch = x.shape[0]
        x, grid = self.patch_embed(params["patch_embed"], x)

        cls_token = jnp.broadcast_to(
            params["cls_token"].astype(x.dtype), (batch, 1, cfg.embed_dim)
        )
        if cfg.distilled:
            dist_token = jnp.broadcast_to(
                params["dist_token"].astype(x.dtype), (batch, 1, cfg.embed_dim)
            )
            x = jnp.concatenate([cls_token, dist_token, x], axis=1)
        else:
            x = jnp.concatenate([cls_token, x], axis=1)

        pos_embed = params["pos_embed"]
        if cfg.interpolate_input and grid != cfg.grid_size:
            pos_embed = interpolate_pos_embeddings(
                pos_embed, src_grid=cfg.grid_size, dst_grid=grid,
                nb_tokens=cfg.nb_tokens,
            )
        x = x + pos_embed.astype(x.dtype)
        x = dropout(x, cfg.drop_rate)
        capture_feature("patch_embedding", x)

        for j, block in enumerate(self.blocks):
            x = block(params["blocks"][str(j)], x, feature_name=f"block_{j}/attn")
            capture_feature(f"block_{j}", x)
        x = self.norm(params["norm"], x)
        capture_feature("features_all", x)

        if cfg.distilled:
            # Return both tokens stacked so all models have a single output.
            x = x[:, :2]
        elif cfg.representation_size:
            x = jnp.tanh(self.pre_logits(params["pre_logits"]["fc"], x[:, 0]))
        else:
            x = x[:, 0]
        capture_feature("features", x)
        return x

    def forward(self, params, x):
        x = self.forward_features(params, x)
        if self.cfg.distilled:
            y = self.head(params["head"], x[:, 0]) if self.head else x[:, 0]
            y_dist = (self.head_dist(params["head_dist"], x[:, 1])
                      if self.head_dist else x[:, 1])
            x = jnp.stack([y, y_dist], axis=1)
        elif self.head is not None:
            x = self.head(params["head"], x)
        capture_feature("logits", x)
        return x

    @property
    def feature_names(self):
        names = ["patch_embedding"]
        for j in range(self.cfg.nb_blocks):
            names += [f"block_{j}/attn", f"block_{j}"]
        return tuple(names + ["features_all", "features", "logits"])


# -- variant registrations ---------------------------------------------------
# Variant set mirrors the reference (tfimm/architectures/vit.py:482-1163).

def _vit_cfg(name, **kwargs):
    return ViTConfig(name=name, url="[timm]", **kwargs)


def _deit_kwargs():
    return dict(mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD)


@register_model
def vit_tiny_patch16_224():
    return ViT, _vit_cfg("vit_tiny_patch16_224", patch_size=16, embed_dim=192,
                         nb_blocks=12, nb_heads=3)


@register_model
def vit_tiny_patch16_384():
    return ViT, _vit_cfg("vit_tiny_patch16_384", input_size=(384, 384),
                         patch_size=16, embed_dim=192, nb_blocks=12, nb_heads=3,
                         crop_pct=1.0)


@register_model
def vit_small_patch32_224():
    return ViT, _vit_cfg("vit_small_patch32_224", patch_size=32, embed_dim=384,
                         nb_blocks=12, nb_heads=6)


@register_model
def vit_small_patch32_384():
    return ViT, _vit_cfg("vit_small_patch32_384", input_size=(384, 384),
                         patch_size=32, embed_dim=384, nb_blocks=12, nb_heads=6,
                         crop_pct=1.0)


@register_model
def vit_small_patch16_224():
    return ViT, _vit_cfg("vit_small_patch16_224", patch_size=16, embed_dim=384,
                         nb_blocks=12, nb_heads=6)


@register_model
def vit_small_patch16_384():
    return ViT, _vit_cfg("vit_small_patch16_384", input_size=(384, 384),
                         patch_size=16, embed_dim=384, nb_blocks=12, nb_heads=6,
                         crop_pct=1.0)


@register_model
def vit_base_patch32_224():
    return ViT, _vit_cfg("vit_base_patch32_224", patch_size=32, embed_dim=768,
                         nb_blocks=12, nb_heads=12)


@register_model
def vit_base_patch32_384():
    return ViT, _vit_cfg("vit_base_patch32_384", input_size=(384, 384),
                         patch_size=32, embed_dim=768, nb_blocks=12, nb_heads=12,
                         crop_pct=1.0)


@register_model
def vit_base_patch16_224():
    return ViT, _vit_cfg("vit_base_patch16_224", patch_size=16, embed_dim=768,
                         nb_blocks=12, nb_heads=12)


@register_model
def vit_base_patch16_384():
    return ViT, _vit_cfg("vit_base_patch16_384", input_size=(384, 384),
                         patch_size=16, embed_dim=768, nb_blocks=12, nb_heads=12,
                         crop_pct=1.0)


@register_model
def vit_base_patch8_224():
    return ViT, _vit_cfg("vit_base_patch8_224", patch_size=8, embed_dim=768,
                         nb_blocks=12, nb_heads=12)


@register_model
def vit_large_patch32_224():
    return ViT, _vit_cfg("vit_large_patch32_224", patch_size=32, embed_dim=1024,
                         nb_blocks=24, nb_heads=16)


@register_model
def vit_large_patch32_384():
    return ViT, _vit_cfg("vit_large_patch32_384", input_size=(384, 384),
                         patch_size=32, embed_dim=1024, nb_blocks=24, nb_heads=16,
                         crop_pct=1.0)


@register_model
def vit_large_patch16_224():
    return ViT, _vit_cfg("vit_large_patch16_224", patch_size=16, embed_dim=1024,
                         nb_blocks=24, nb_heads=16)


@register_model
def vit_large_patch16_384():
    return ViT, _vit_cfg("vit_large_patch16_384", input_size=(384, 384),
                         patch_size=16, embed_dim=1024, nb_blocks=24, nb_heads=16,
                         crop_pct=1.0)


@register_model
def vit_base_patch32_sam_224():
    return ViT, _vit_cfg("vit_base_patch32_sam_224", patch_size=32, embed_dim=768,
                         nb_blocks=12, nb_heads=12)


@register_model
def vit_base_patch16_sam_224():
    return ViT, _vit_cfg("vit_base_patch16_sam_224", patch_size=16, embed_dim=768,
                         nb_blocks=12, nb_heads=12)


@register_model
def vit_tiny_patch16_224_in21k():
    return ViT, _vit_cfg("vit_tiny_patch16_224_in21k", nb_classes=21843,
                         patch_size=16, embed_dim=192, nb_blocks=12, nb_heads=3)


@register_model
def vit_small_patch32_224_in21k():
    return ViT, _vit_cfg("vit_small_patch32_224_in21k", nb_classes=21843,
                         patch_size=32, embed_dim=384, nb_blocks=12, nb_heads=6)


@register_model
def vit_small_patch16_224_in21k():
    return ViT, _vit_cfg("vit_small_patch16_224_in21k", nb_classes=21843,
                         patch_size=16, embed_dim=384, nb_blocks=12, nb_heads=6)


@register_model
def vit_base_patch32_224_in21k():
    return ViT, _vit_cfg("vit_base_patch32_224_in21k", nb_classes=21843,
                         patch_size=32, embed_dim=768, nb_blocks=12, nb_heads=12)


@register_model
def vit_base_patch16_224_in21k():
    return ViT, _vit_cfg("vit_base_patch16_224_in21k", nb_classes=21843,
                         patch_size=16, embed_dim=768, nb_blocks=12, nb_heads=12)


@register_model
def vit_base_patch8_224_in21k():
    return ViT, _vit_cfg("vit_base_patch8_224_in21k", nb_classes=21843,
                         patch_size=8, embed_dim=768, nb_blocks=12, nb_heads=12)


@register_model
def vit_large_patch32_224_in21k():
    return ViT, _vit_cfg("vit_large_patch32_224_in21k", nb_classes=21843,
                         patch_size=32, embed_dim=1024, nb_blocks=24, nb_heads=16,
                         representation_size=1024)


@register_model
def vit_large_patch16_224_in21k():
    return ViT, _vit_cfg("vit_large_patch16_224_in21k", nb_classes=21843,
                         patch_size=16, embed_dim=1024, nb_blocks=24, nb_heads=16)


@register_model
def vit_huge_patch14_224_in21k():
    return ViT, _vit_cfg("vit_huge_patch14_224_in21k", nb_classes=21843,
                         patch_size=14, embed_dim=1280, nb_blocks=32, nb_heads=16,
                         representation_size=1280)


@register_model
def deit_tiny_patch16_224():
    return ViT, _vit_cfg("deit_tiny_patch16_224", patch_size=16, embed_dim=192,
                         nb_blocks=12, nb_heads=3, **_deit_kwargs())


@register_model
def deit_small_patch16_224():
    return ViT, _vit_cfg("deit_small_patch16_224", patch_size=16, embed_dim=384,
                         nb_blocks=12, nb_heads=6, **_deit_kwargs())


@register_model
def deit_base_patch16_224():
    return ViT, _vit_cfg("deit_base_patch16_224", patch_size=16, embed_dim=768,
                         nb_blocks=12, nb_heads=12, **_deit_kwargs())


@register_model
def deit_base_patch16_384():
    return ViT, _vit_cfg("deit_base_patch16_384", input_size=(384, 384),
                         patch_size=16, embed_dim=768, nb_blocks=12, nb_heads=12,
                         crop_pct=1.0, **_deit_kwargs())


def _deit_distilled_cfg(name, **kwargs):
    return ViTConfig(name=name, url="[timm]", distilled=True,
                     classifier=("head", "head_dist"), **_deit_kwargs(), **kwargs)


@register_model
def deit_tiny_distilled_patch16_224():
    return ViT, _deit_distilled_cfg("deit_tiny_distilled_patch16_224",
                                    patch_size=16, embed_dim=192, nb_blocks=12,
                                    nb_heads=3)


@register_model
def deit_small_distilled_patch16_224():
    return ViT, _deit_distilled_cfg("deit_small_distilled_patch16_224",
                                    patch_size=16, embed_dim=384, nb_blocks=12,
                                    nb_heads=6)


@register_model
def deit_base_distilled_patch16_224():
    return ViT, _deit_distilled_cfg("deit_base_distilled_patch16_224",
                                    patch_size=16, embed_dim=768, nb_blocks=12,
                                    nb_heads=12)


@register_model
def deit_base_distilled_patch16_384():
    return ViT, _deit_distilled_cfg("deit_base_distilled_patch16_384",
                                    input_size=(384, 384), patch_size=16,
                                    embed_dim=768, nb_blocks=12, nb_heads=12,
                                    crop_pct=1.0)


@register_model
def vit_base_patch16_224_miil_in21k():
    return ViT, _vit_cfg("vit_base_patch16_224_miil_in21k", nb_classes=11221,
                         patch_size=16, embed_dim=768, nb_blocks=12, nb_heads=12,
                         qkv_bias=False, interpolation="bilinear",
                         mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))


@register_model
def vit_base_patch16_224_miil():
    return ViT, _vit_cfg("vit_base_patch16_224_miil", patch_size=16,
                         embed_dim=768, nb_blocks=12, nb_heads=12,
                         qkv_bias=False, interpolation="bilinear",
                         mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))
