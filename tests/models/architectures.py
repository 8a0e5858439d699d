"""Tiny registered test architectures (the reference's key testing trick,
tests/models/architectures.py:33-55): miniature configs per family keep the
full factory/transfer/serialization matrix fast on CPU."""

from tfimm_tpu.architectures.resnet import ResNet, ResNetConfig
from tfimm_tpu.architectures.vit import ViT, ViTConfig
from tfimm_tpu.models.registry import is_model, register_model

# Names of all registered tiny test models, one (or more) per family.
TEST_ARCHITECTURES = []


def _register_test_model(fn):
    if not is_model(fn.__name__):
        register_model(fn)
    TEST_ARCHITECTURES.append(fn.__name__)
    return fn


@_register_test_model
def vit_test_model():
    cfg = ViTConfig(
        name="vit_test_model",
        input_size=(32, 32),
        patch_size=8,
        embed_dim=8,
        nb_blocks=2,
        nb_heads=2,
    )
    return ViT, cfg


@_register_test_model
def vit_test_model_distilled():
    cfg = ViTConfig(
        name="vit_test_model_distilled",
        input_size=(32, 32),
        patch_size=8,
        embed_dim=8,
        nb_blocks=2,
        nb_heads=2,
        distilled=True,
        classifier=("head", "head_dist"),
    )
    return ViT, cfg


@_register_test_model
def resnet_test_model():
    cfg = ResNetConfig(
        name="resnet_test_model",
        input_size=(32, 32),
        block="basic_block",
        nb_blocks=(1, 1, 1, 1),
        nb_channels=(4, 4, 4, 4),
    )
    return ResNet, cfg


@_register_test_model
def resnet_test_model_deep():
    cfg = ResNetConfig(
        name="resnet_test_model_deep",
        input_size=(32, 32),
        block="bottleneck",
        nb_blocks=(1, 1, 1, 1),
        nb_channels=(4, 4, 4, 4),
        stem_width=4,
        stem_type="deep",
        downsample_mode="avg",
        attn_layer="se",
        first_conv="conv1.0",
    )
    return ResNet, cfg


# Test models with fixed input size (no variable-resolution inference).
FIXED_SIZE_MODELS = []
# Test models that cannot change in_channels losslessly.
EXCLUDE_IN_CHANNELS_MODELS = []


from tfimm_tpu.architectures.convnext import ConvNeXt, ConvNeXtConfig  # noqa: E402


@_register_test_model
def convnext_test_model():
    cfg = ConvNeXtConfig(
        name="convnext_test_model",
        input_size=(32, 32),
        patch_size=4,
        embed_dim=(4, 4, 4, 4),
        nb_blocks=(1, 1, 1, 1),
    )
    return ConvNeXt, cfg


from tfimm_tpu.architectures.convmixer import ConvMixer, ConvMixerConfig  # noqa: E402
from tfimm_tpu.architectures.mlp_mixer import MLPMixer, MLPMixerConfig  # noqa: E402
from tfimm_tpu.architectures.vgg import VGG, VGGConfig  # noqa: E402


@_register_test_model
def mixer_test_model():
    cfg = MLPMixerConfig(
        name="mixer_test_model", input_size=(32, 32), patch_size=8,
        embed_dim=8, nb_blocks=2,
    )
    return MLPMixer, cfg


@_register_test_model
def resmlp_test_model():
    cfg = MLPMixerConfig(
        name="resmlp_test_model", input_size=(32, 32), patch_size=8,
        embed_dim=8, nb_blocks=2, mlp_ratio=(4.0, 4.0),
        block_layer="res_block", norm_layer="affine",
    )
    return MLPMixer, cfg


@_register_test_model
def gmlp_test_model():
    cfg = MLPMixerConfig(
        name="gmlp_test_model", input_size=(32, 32), patch_size=8,
        embed_dim=8, nb_blocks=2, mlp_ratio=(6.0, 6.0),
        block_layer="spatial_gating_block", mlp_layer="gated_mlp",
    )
    return MLPMixer, cfg


@_register_test_model
def convmixer_test_model():
    cfg = ConvMixerConfig(
        name="convmixer_test_model", input_size=(32, 32), patch_size=(8, 8),
        embed_dim=8, depth=2, kernel_size=3,
    )
    return ConvMixer, cfg


@_register_test_model
def vgg_test_model():
    cfg = VGGConfig(
        name="vgg_test_model", input_size=(32, 32), layers=(4, "M", 4, "M"),
        nb_features=16,
    )
    return VGG, cfg


# Mixer-family models have token-dim Dense layers -> fixed input size.
FIXED_SIZE_MODELS += ["mixer_test_model", "resmlp_test_model",
                      "gmlp_test_model", "vgg_test_model"]


from tfimm_tpu.architectures.cait import CaiT, CaiTConfig  # noqa: E402
from tfimm_tpu.architectures.poolformer import PoolFormer, PoolFormerConfig  # noqa: E402


@_register_test_model
def cait_test_model():
    cfg = CaiTConfig(
        name="cait_test_model", input_size=(32, 32), patch_size=8,
        embed_dim=8, nb_blocks=2, nb_heads=2,
    )
    return CaiT, cfg


@_register_test_model
def poolformer_test_model():
    cfg = PoolFormerConfig(
        name="poolformer_test_model", input_size=(32, 32),
        embed_dim=(4, 8), nb_blocks=(1, 1), mlp_ratio=(4.0, 4.0),
    )
    return PoolFormer, cfg


from tfimm_tpu.architectures.swin import SwinTransformer, SwinTransformerConfig  # noqa: E402


@_register_test_model
def swin_test_model():
    cfg = SwinTransformerConfig(
        name="swin_test_model", input_size=(32, 32), patch_size=4,
        embed_dim=4, nb_blocks=(1, 1), nb_heads=(2, 4), window_size=4,
    )
    return SwinTransformer, cfg


FIXED_SIZE_MODELS += ["swin_test_model"]


from tfimm_tpu.architectures.pit import (  # noqa: E402
    PoolingVisionTransformer, PoolingVisionTransformerConfig)
from tfimm_tpu.architectures.pvt import (  # noqa: E402
    PyramidVisionTransformer, PyramidVisionTransformerConfig)
from tfimm_tpu.architectures.pvt_v2 import (  # noqa: E402
    PyramidVisionTransformerV2, PyramidVisionTransformerV2Config)
from tfimm_tpu.architectures.resnetv2 import ResNetV2, ResNetV2Config  # noqa: E402
from tfimm_tpu.architectures.vit import ViT as _ViT, ViTConfig as _ViTConfig  # noqa: E402


@_register_test_model
def pvt_test_model():
    cfg = PyramidVisionTransformerConfig(
        name="pvt_test_model", input_size=(32, 32), patch_size=(4, 2, 2, 2),
        embed_dim=(4, 4, 4, 4), nb_blocks=(1, 1, 1, 1), nb_heads=(1, 1, 1, 1),
        mlp_ratio=(2.0, 2.0, 2.0, 2.0), sr_ratio=(4, 2, 2, 1),
    )
    return PyramidVisionTransformer, cfg


@_register_test_model
def pvt_v2_test_model():
    cfg = PyramidVisionTransformerV2Config(
        name="pvt_v2_test_model", input_size=(32, 32),
        embed_dim=(4, 4, 4, 4), nb_blocks=(1, 1, 1, 1), nb_heads=(1, 1, 1, 1),
        mlp_ratio=(2.0, 2.0, 2.0, 2.0), sr_ratio=(4, 2, 2, 1),
    )
    return PyramidVisionTransformerV2, cfg


@_register_test_model
def pit_test_model():
    cfg = PoolingVisionTransformerConfig(
        name="pit_test_model", input_size=(32, 32), patch_size=4, stride=4,
        embed_dim=(4, 8), nb_blocks=(1, 1), nb_heads=(2, 2),
    )
    return PoolingVisionTransformer, cfg


@_register_test_model
def resnetv2_test_model():
    cfg = ResNetV2Config(
        name="resnetv2_test_model", input_size=(32, 32),
        nb_blocks=(1, 1), nb_channels=(8, 8), stem_width=8,
        norm_layer="group_norm_1grp",
    )
    return ResNetV2, cfg


@_register_test_model
def vit_hybrid_test_model():
    cfg = _ViTConfig(
        name="vit_hybrid_test_model", input_size=(32, 32),
        patch_layer="hybrid_embeddings", patch_nb_blocks=(1, 1), patch_size=1,
        embed_dim=8, nb_blocks=1, nb_heads=2,
        first_conv="patch_embed.backbone.stem.conv",
    )
    return _ViT, cfg


from tfimm_tpu.architectures.efficientnet import EfficientNet, EfficientNetConfig  # noqa: E402


@_register_test_model
def efficientnet_test_model():
    cfg = EfficientNetConfig(
        name="efficientnet_test_model", input_size=(32, 32), stem_size=8,
        nb_features=16,
        architecture=(("ds_r1_k3_s1_e1_c8_se0.25",),
                      ("ir_r1_k3_s2_e4_c16_se0.25",),
                      ("er_r1_k3_s2_e4_c16",)),
    )
    return EfficientNet, cfg


@_register_test_model
def efficientnet_tf_test_model():
    cfg = EfficientNetConfig(
        name="efficientnet_tf_test_model", input_size=(32, 32), stem_size=8,
        nb_features=16, padding="same", norm_layer="batch_norm_tf",
        architecture=(("cn_r1_k3_s1_e1_c8_skip",),
                      ("er_r1_k3_s2_e4_c16",),
                      ("ir_r1_k3_s2_e4_c16_se0.25",)),
    )
    return EfficientNet, cfg
