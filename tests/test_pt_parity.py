"""Numerical parity vs PyTorch ground truth (reference: tests/test_timm.py:38-71).

timm is unavailable here, so the ground truth is an independent PyTorch
implementation per family with timm-style state_dict keys (tests/torch_refs/).
Random weights, fixed-seed image, fp32 CPU; tolerance matches the reference's
CI bar (relative max error < 1e-3; we assert much tighter in practice).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tfimm_tpu import create_model  # noqa: E402
from tfimm_tpu.utils.pt_convert import load_pt_state_dict  # noqa: E402

import tests.models.architectures  # noqa: F401, E402 (registers test models)


def _parity(jax_model, torch_model, input_hw, in_channels=3, atol_scale=1e-5):
    torch_model.eval()
    load_pt_state_dict(jax_model, torch_model.state_dict())

    rng = np.random.default_rng(42)
    img = rng.uniform(-1, 1, size=(2, *input_hw, in_channels)).astype("float32")
    with torch.no_grad():
        pt_out = torch_model(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    jax_out = np.asarray(jax_model(jnp.asarray(img)))

    assert jax_out.shape == pt_out.shape
    scale = np.abs(pt_out).max()
    err = np.abs(jax_out - pt_out).max()
    assert err / max(scale, 1e-6) < 1e-3, f"rel err {err / scale:.2e}"
    np.testing.assert_allclose(jax_out, pt_out, atol=atol_scale * max(scale, 1.0),
                               rtol=1e-4)


def test_vit_parity():
    from tests.torch_refs.vit_ref import TorchViT

    torch.manual_seed(0)
    torch_model = TorchViT(input_size=64, patch_size=16, dim=64, depth=3,
                           nb_heads=4, nb_classes=11)
    jax_model = create_model("vit_test_model", input_size=(64, 64), patch_size=16,
                             embed_dim=64, nb_blocks=3, nb_heads=4, nb_classes=11)
    _parity(jax_model, torch_model, (64, 64))


def test_vit_distilled_parity():
    from tests.torch_refs.vit_ref import TorchViT

    torch.manual_seed(1)
    torch_model = TorchViT(input_size=32, patch_size=8, dim=32, depth=2,
                           nb_heads=2, nb_classes=5, distilled=True)
    jax_model = create_model("vit_test_model_distilled", patch_size=8,
                             embed_dim=32, nb_blocks=2, nb_heads=2, nb_classes=5)
    _parity(jax_model, torch_model, (32, 32))


def test_resnet_basic_parity():
    from tests.torch_refs.resnet_ref import BasicBlock as TB, TorchResNet

    torch.manual_seed(2)
    torch_model = TorchResNet(TB, (1, 1, 1, 1), nb_classes=7)
    jax_model = create_model("resnet18", input_size=(64, 64),
                             nb_blocks=(1, 1, 1, 1), nb_classes=7)
    _parity(jax_model, torch_model, (64, 64))


def test_resnet_bottleneck_resnext_se_parity():
    from tests.torch_refs.resnet_ref import Bottleneck as TB, TorchResNet

    torch.manual_seed(3)
    torch_model = TorchResNet(TB, (1, 1, 1, 1), nb_classes=7, groups=4,
                              base_width=16, downsample_mode="avg", se=True)
    jax_model = create_model("seresnext50_32x4d", input_size=(64, 64),
                             nb_blocks=(1, 1, 1, 1), nb_classes=7,
                             cardinality=4, base_width=16,
                             downsample_mode="avg")
    _parity(jax_model, torch_model, (64, 64))


def test_convnext_parity():
    from tests.torch_refs.convnext_ref import TorchConvNeXt

    torch.manual_seed(4)
    torch_model = TorchConvNeXt(dims=(16, 32, 64, 128), depths=(1, 1, 2, 1),
                                nb_classes=9)
    jax_model = create_model("convnext_tiny", input_size=(64, 64),
                             embed_dim=(16, 32, 64, 128),
                             nb_blocks=(1, 1, 2, 1), nb_classes=9)
    _parity(jax_model, torch_model, (64, 64))


def test_mlp_mixer_parity():
    from tests.torch_refs.mixer_ref import TorchMixer

    torch.manual_seed(5)
    torch_model = TorchMixer(input_size=64, patch_size=8, dim=32, depth=2,
                             nb_classes=10)
    jax_model = create_model("mixer_s16_224", input_size=(64, 64), patch_size=8,
                             embed_dim=32, nb_blocks=2, nb_classes=10)
    _parity(jax_model, torch_model, (64, 64))


def test_gmlp_parity():
    from tests.torch_refs.mixer_ref import TorchMixer

    torch.manual_seed(6)
    torch_model = TorchMixer(input_size=64, patch_size=8, dim=32, depth=2,
                             nb_classes=10, block="gmlp")
    jax_model = create_model("gmlp_ti16_224", input_size=(64, 64), patch_size=8,
                             embed_dim=32, nb_blocks=2, nb_classes=10)
    _parity(jax_model, torch_model, (64, 64))


def test_cait_parity():
    from tests.torch_refs.cait_ref import TorchCaiT

    torch.manual_seed(7)
    torch_model = TorchCaiT(input_size=64, patch_size=16, dim=32, depth=2,
                            nb_heads=2, nb_classes=10)
    jax_model = create_model("cait_xxs24_224", input_size=(64, 64),
                             patch_size=16, embed_dim=32, nb_blocks=2,
                             nb_heads=2, nb_classes=10)
    _parity(jax_model, torch_model, (64, 64))


def test_poolformer_parity():
    from tests.torch_refs.poolformer_ref import TorchPoolFormer

    torch.manual_seed(8)
    torch_model = TorchPoolFormer(dims=(16, 32), depths=(1, 1), nb_classes=10)
    jax_model = create_model("poolformer_s12", input_size=(64, 64),
                             embed_dim=(16, 32), nb_blocks=(1, 1),
                             mlp_ratio=(4.0, 4.0), nb_classes=10)
    _parity(jax_model, torch_model, (64, 64))


def test_swin_parity():
    from tests.torch_refs.swin_ref import TorchSwin

    torch.manual_seed(9)
    torch_model = TorchSwin(input_size=32, patch_size=4, dim=16, depths=(2, 2),
                            nb_heads=(2, 4), ws=4, nb_classes=10)
    jax_model = create_model("swin_tiny_patch4_window7_224", input_size=(32, 32),
                             patch_size=4, embed_dim=16, nb_blocks=(2, 2),
                             nb_heads=(2, 4), window_size=4, nb_classes=10)
    _parity(jax_model, torch_model, (32, 32))


def test_pvt_v2_parity():
    from tests.torch_refs.pvt_ref import TorchPVTv2

    torch.manual_seed(10)
    torch_model = TorchPVTv2(dims=(8, 16), depths=(1, 1), heads=(1, 2),
                             sr=(4, 2), mlp_ratio=(2.0, 2.0), nb_classes=10)
    jax_model = create_model("pvt_v2_b0", input_size=(64, 64),
                             embed_dim=(8, 16), nb_blocks=(1, 1),
                             nb_heads=(1, 2), sr_ratio=(4, 2),
                             mlp_ratio=(2.0, 2.0), nb_classes=10)
    _parity(jax_model, torch_model, (64, 64))


def test_resnetv2_parity():
    from tests.torch_refs.resnetv2_ref import TorchResNetV2

    torch.manual_seed(11)
    torch_model = TorchResNetV2(channels=(8, 16), depths=(1, 1), stem_width=8,
                                nb_classes=10)
    jax_model = create_model("resnetv2_50x1_bitm", input_size=(64, 64),
                             nb_blocks=(1, 1), nb_channels=(8, 16),
                             stem_width=8, norm_layer="group_norm_1grp",
                             nb_classes=10)
    _parity(jax_model, torch_model, (64, 64))


def test_efficientnet_parity():
    from tests.torch_refs.efficientnet_ref import TorchEfficientNet

    torch.manual_seed(12)
    torch_model = TorchEfficientNet(nb_classes=10)
    jax_model = create_model("pt_efficientnet_b0", input_size=(64, 64),
                             stem_size=8, nb_features=32, nb_classes=10,
                             drop_rate=0.0, drop_path_rate=0.0,
                             architecture=(("ds_r1_k3_s1_e1_c8_se0.25",),
                                           ("ir_r1_k3_s2_e4_c16_se0.25",),
                                           ("er_r1_k3_s2_e4_c16",)))
    _parity(jax_model, torch_model, (64, 64))


def test_efficientnet_tf_same_padding_parity():
    """The `tf_` variants' parity trap (SURVEY.md §7): TF/XLA SAME padding is
    ASYMMETRIC for stride-2 convs on even inputs (e.g. pad (0,1) for k3 s2 on
    32px), unlike PyTorch's symmetric (1,1). Exercises SAME stem conv,
    stride-2 SAME dwconv (ir block), stride-2 SAME expansion conv (er block)
    and BN eps 1e-3 — reference: tfimm/layers/conv.py:15-148 and the tf_
    variant docstring tfimm/architectures/efficientnet.py:40-45."""
    from tests.torch_refs.efficientnet_ref import TorchEfficientNetTF

    torch.manual_seed(21)
    torch_model = TorchEfficientNetTF(nb_classes=10)
    # `efficientnet_b0` follows the reference naming: it is the TF-weights
    # variant (timm tf_efficientnet_b0) with SAME padding + BN eps 1e-3.
    jax_model = create_model("efficientnet_b0", input_size=(64, 64),
                             stem_size=8, nb_features=32, nb_classes=10,
                             drop_rate=0.0, drop_path_rate=0.0,
                             architecture=(("ds_r1_k3_s1_e1_c8_se0.25",),
                                           ("ir_r1_k3_s2_e4_c16_se0.25",),
                                           ("er_r1_k3_s2_e4_c16",)))
    assert jax_model.cfg.padding == "same"
    assert jax_model.cfg.norm_layer == "batch_norm_tf"
    _parity(jax_model, torch_model, (64, 64))


def test_pit_parity():
    from tests.torch_refs.pit_ref import TorchPiT

    torch.manual_seed(13)
    torch_model = TorchPiT(input_size=32, patch_size=4, stride=4,
                           dims=(8, 16), depths=(1, 1), heads=(2, 2),
                           nb_classes=10)
    jax_model = create_model("pit_ti_224", input_size=(32, 32), patch_size=4,
                             stride=4, embed_dim=(8, 16), nb_blocks=(1, 1),
                             nb_heads=(2, 2), nb_classes=10)
    _parity(jax_model, torch_model, (32, 32))


def test_convmixer_parity():
    from tests.torch_refs.convmixer_ref import TorchConvMixer

    torch.manual_seed(7)
    torch_model = TorchConvMixer(dim=8, depth=2, kernel_size=3, patch_size=8,
                                 nb_classes=7)
    jax_model = create_model("convmixer_test_model", nb_classes=7)
    _parity(jax_model, torch_model, (32, 32))


def test_vgg_parity():
    from tests.torch_refs.vgg_ref import TorchVGG

    torch.manual_seed(8)
    torch_model = TorchVGG(layers=(4, "M", 4, "M"), nb_features=16,
                           nb_classes=9)
    jax_model = create_model("vgg_test_model", nb_classes=9)
    _parity(jax_model, torch_model, (32, 32))


def test_vit_hybrid_parity():
    """Hybrid ViT end to end: non-preact ResNetV2 'same' backbone + patch
    projection + transformer."""
    from tests.torch_refs.vit_hybrid_ref import TorchViTHybrid

    torch.manual_seed(9)
    torch_model = TorchViTHybrid(input_size=32, depths=(1, 1), dim=8,
                                 depth=1, nb_heads=2, nb_classes=6)
    jax_model = create_model("vit_hybrid_test_model", nb_classes=6)
    _parity(jax_model, torch_model, (32, 32))
