"""Hybrid Vision Transformer (ResNetV2 + ViT).

TPU-native re-implementation of the reference family
(tfimm/architectures/vit.py:238-295 + vit_hybrid.py): a non-preact ResNetV2
stem (or stem+stages) feeds the ViT patch projection. Registrations reuse the
``ViT`` class with ``patch_layer="hybrid_embeddings"``.

Paper: ViT (hybrid variants), https://arxiv.org/abs/2010.11929.
"""

from __future__ import annotations

import jax

from tfimm_tpu.architectures.resnetv2 import ResNetV2, ResNetV2Config, ResNetV2Stem
from tfimm_tpu.architectures.vit import ViT, ViTConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import Conv2d, trunc_normal

__all__ = ["HybridEmbeddings"]


class HybridEmbeddings:
    """CNN feature extraction + conv projection to patch tokens."""

    def __init__(self, in_channels, input_size, nb_blocks, patch_size,
                 embed_dim, drop_path_rate=0.0):
        if nb_blocks == ():
            self.backbone = ResNetV2Stem(
                in_channels, stem_type="same", stem_width=64,
                conv_padding="same", preact=False, act_layer="relu",
                norm_layer="group_norm",
            )
            self._backbone_is_stem = True
            backbone_out = 64
        else:
            backbone_cfg = ResNetV2Config(
                nb_classes=0,
                in_channels=in_channels,
                input_size=input_size,
                nb_blocks=nb_blocks,
                preact=False,
                stem_type="same",
                global_pool="",
                conv_padding="same",
                drop_path_rate=drop_path_rate,
            )
            self.backbone = ResNetV2(backbone_cfg)
            self._backbone_is_stem = False
            backbone_out = self.backbone.nb_features
        self.proj = Conv2d(backbone_out, embed_dim, patch_size,
                           stride=patch_size, padding="valid",
                           kernel_init=trunc_normal(0.02))

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        if self._backbone_is_stem:
            backbone = self.backbone.init(r1)
        else:
            backbone = self.backbone.init_params(r1)
        return {"backbone": backbone, "proj": self.proj.init(r2)}

    def __call__(self, p, x):
        from tfimm_tpu.core import current_context

        # The backbone's internal features are not part of the ViT feature
        # namespace (reference calls patch_embed without return_features).
        ctx = current_context()
        saved = ctx.capture_features
        ctx.capture_features = False
        try:
            if self._backbone_is_stem:
                x = self.backbone(p["backbone"], x)
            else:
                x = self.backbone.forward_features(p["backbone"], x)
        finally:
            ctx.capture_features = saved
        x = self.proj(p["proj"], x)
        grid = (x.shape[1], x.shape[2])
        x = x.reshape(x.shape[0], grid[0] * grid[1], -1)
        return x, grid


def _register(name, **kwargs):
    def fn():
        return ViT, ViTConfig(name=name, url="[timm]",
                              patch_layer="hybrid_embeddings", **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_STEM_FC = "patch_embed.backbone.conv"
_FULL_FC = "patch_embed.backbone.stem.conv"

_register("vit_tiny_r_s16_p8_224", patch_nb_blocks=(), patch_size=8,
          embed_dim=192, nb_blocks=12, nb_heads=3, crop_pct=0.9,
          first_conv=_STEM_FC)
_register("vit_tiny_r_s16_p8_384", input_size=(384, 384), patch_nb_blocks=(),
          patch_size=8, embed_dim=192, nb_blocks=12, nb_heads=3, crop_pct=1.0,
          first_conv=_STEM_FC)
_register("vit_small_r26_s32_224", patch_nb_blocks=(2, 2, 2, 2), patch_size=1,
          embed_dim=384, nb_blocks=12, nb_heads=6, crop_pct=0.9,
          first_conv=_FULL_FC)
_register("vit_small_r26_s32_384", input_size=(384, 384),
          patch_nb_blocks=(2, 2, 2, 2), patch_size=1, embed_dim=384,
          nb_blocks=12, nb_heads=6, crop_pct=1.0, first_conv=_FULL_FC)
_register("vit_base_r50_s16_384", input_size=(384, 384),
          patch_nb_blocks=(3, 4, 9), patch_size=1, embed_dim=768, nb_blocks=12,
          nb_heads=12, crop_pct=1.0, first_conv=_FULL_FC)
_register("vit_large_r50_s32_224", patch_nb_blocks=(3, 4, 6, 3), patch_size=1,
          embed_dim=1024, nb_blocks=24, nb_heads=16, crop_pct=0.9,
          first_conv=_FULL_FC)
_register("vit_large_r50_s32_384", input_size=(384, 384),
          patch_nb_blocks=(3, 4, 6, 3), patch_size=1, embed_dim=1024,
          nb_blocks=24, nb_heads=16, crop_pct=1.0, first_conv=_FULL_FC)
_register("vit_tiny_r_s16_p8_224_in21k", nb_classes=21843, patch_nb_blocks=(),
          patch_size=8, embed_dim=192, nb_blocks=12, nb_heads=3, crop_pct=0.9,
          first_conv=_STEM_FC)
_register("vit_small_r26_s32_224_in21k", nb_classes=21843,
          patch_nb_blocks=(2, 2, 2, 2), patch_size=1, embed_dim=384,
          nb_blocks=12, nb_heads=6, crop_pct=0.9, first_conv=_FULL_FC)
_register("vit_base_r50_s16_224_in21k", nb_classes=21843,
          patch_nb_blocks=(3, 4, 9), patch_size=1, embed_dim=768, nb_blocks=12,
          nb_heads=12, representation_size=768, crop_pct=0.9,
          first_conv=_FULL_FC)
_register("vit_large_r50_s32_224_in21k", nb_classes=21843,
          patch_nb_blocks=(3, 4, 6, 3), patch_size=1, embed_dim=1024,
          nb_blocks=24, nb_heads=16, crop_pct=0.9, first_conv=_FULL_FC)
