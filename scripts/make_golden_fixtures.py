#!/usr/bin/env python
"""Generate offline golden parity fixtures from INDEPENDENT PyTorch
implementations (not authored in this repo).

Ground-truth sources:
  * the upstream reference checkout's *vendored* third-party PyTorch code
    (sail-sg PoolFormer, whai362 PVT/PVTv2 — the same files timm's parity
    tests use; reference: tfimm/architectures/timm/),
  * HuggingFace `transformers` implementations (ViT, ConvNeXt, Swin),
  * Meta's vendored Segment Anything code (generated separately, see
    make_golden_fixtures_sam.py).

Each fixture is an .npz holding the full PT state_dict (tiny config, random
weights, fixed seed), a fixed input image batch, the fp32 eval-mode output,
and JSON metadata naming the tfimm_tpu model + config-override kwargs. The
committed fixtures let CI exercise the complete
create_model -> convert_pt_state_dict chain against ground truth produced by
code nobody in this repo wrote — without network access or a timm install
(tests/test_golden_parity.py).

Run ONCE where /root/reference exists; only the .npz files are committed.
"""

import importlib.machinery
import importlib.util
import json
import os
import sys
import types
from functools import partial

import numpy as np
import torch
import torch.nn as nn

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tests", "fixtures", "golden")
REF = "/root/reference/tfimm/architectures"


# -- timm shim so the vendored files import without timm installed -------------
def install_timm_shim():
    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)

    layers = types.ModuleType("timm.layers")

    class DropPath(nn.Module):  # eval-mode identity; fixtures use rate 0
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = lambda t, std=0.02, **kw: nn.init.trunc_normal_(
        t, std=std, a=-2 * std, b=2 * std)

    models = types.ModuleType("timm.models")
    models.register_model = lambda f: f
    vit_mod = types.ModuleType("timm.models.vision_transformer")
    vit_mod._cfg = lambda url="", **kw: {"url": url, **kw}
    models.vision_transformer = vit_mod

    # transformers probes timm.__spec__ to decide availability; make the shim
    # look like a regular module so HF imports keep working alongside it.
    for m in (timm, data, layers, models, vit_mod):
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)

    timm.data, timm.layers, timm.models = data, layers, models
    sys.modules.update({
        "timm": timm, "timm.data": data, "timm.layers": layers,
        "timm.models": models, "timm.models.vision_transformer": vit_mod,
    })


def load_vendored(filename, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, "timm", filename))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def save_fixture(name, state_dict, inp, out, model_name, kwargs, source,
                 extra_arrays=None):
    os.makedirs(OUT_DIR, exist_ok=True)
    arrays = {f"sd::{k}": v.detach().numpy() for k, v in state_dict.items()
              if v is not None}
    arrays["input"] = inp
    arrays["output"] = out
    for k, v in (extra_arrays or {}).items():
        arrays[k] = v
    meta = {"model_name": model_name, "kwargs": kwargs, "source": source}
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    kb = os.path.getsize(path) / 1024
    print(f"wrote {path} ({kb:.0f} KiB, output shape {out.shape})")


def shrink_weights(model, factor=0.5):
    """Scale down matrix/conv weights so activations stay O(1) through deep
    random-weight models (residual stacks otherwise blow up to ~1e2, where
    softmax rounding noise dominates the parity signal)."""
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("weight") and p.ndim >= 2:
                p.mul_(factor)
    return model


def fixed_image(seed, n, size, channels=3):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=(n, size, size, channels)).astype("float32")


def run_eval(model, inp_nhwc):
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(inp_nhwc).permute(0, 3, 1, 2))
    return out.numpy()


# -- vendored timm families ----------------------------------------------------

def gen_poolformer():
    mod = load_vendored("poolformer.py", "vendored_poolformer")
    torch.manual_seed(100)
    model = mod.PoolFormer(
        layers=[1, 1], embed_dims=(16, 32), mlp_ratios=(2.0, 2.0),
        downsamples=(False, True), num_classes=7,
    )
    inp = fixed_image(100, 2, 64)
    out = run_eval(model, inp)
    save_fixture(
        "poolformer", model.state_dict(), inp, out,
        model_name="poolformer_s12",
        kwargs=dict(input_size=(64, 64), embed_dim=(16, 32), nb_blocks=(1, 1),
                    mlp_ratio=(2.0, 2.0), nb_classes=7),
        source="sail-sg/poolformer via reference vendored copy "
               "(tfimm/architectures/timm/poolformer.py)",
    )


def gen_pvt():
    mod = load_vendored("pvt.py", "vendored_pvt")
    torch.manual_seed(101)
    model = mod.PyramidVisionTransformer(
        img_size=64, patch_size=4, embed_dims=[8, 16, 24, 32],
        num_heads=[1, 2, 3, 4], mlp_ratios=[2, 2, 2, 2], qkv_bias=True,
        depths=[1, 1, 1, 1], sr_ratios=[8, 4, 2, 1], num_classes=7,
        norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    shrink_weights(model)
    inp = fixed_image(101, 2, 64)
    out = run_eval(model, inp)
    save_fixture(
        "pvt", model.state_dict(), inp, out,
        model_name="pvt_tiny",
        kwargs=dict(input_size=(64, 64), embed_dim=(8, 16, 24, 32),
                    nb_heads=(1, 2, 3, 4), mlp_ratio=(2.0, 2.0, 2.0, 2.0),
                    nb_blocks=(1, 1, 1, 1), sr_ratio=(8, 4, 2, 1),
                    nb_classes=7),
        source="whai362/PVT via reference vendored copy "
               "(tfimm/architectures/timm/pvt.py)",
    )


def gen_pvt_v2():
    mod = load_vendored("pvt_v2.py", "vendored_pvt_v2")
    torch.manual_seed(102)
    model = mod.PyramidVisionTransformerV2(
        # embed_dims is indexed [3] for the head even with 2 stages; pad it.
        img_size=64, embed_dims=[8, 16, 16, 16], num_heads=[1, 2],
        mlp_ratios=[2, 2],
        qkv_bias=True, depths=[1, 1], sr_ratios=[4, 2], num_stages=2,
        num_classes=7, linear=False, norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    inp = fixed_image(102, 2, 64)
    out = run_eval(model, inp)
    save_fixture(
        "pvt_v2", model.state_dict(), inp, out,
        model_name="pvt_v2_b0",
        kwargs=dict(input_size=(64, 64), embed_dim=(8, 16), nb_heads=(1, 2),
                    mlp_ratio=(2.0, 2.0), nb_blocks=(1, 1), sr_ratio=(4, 2),
                    nb_classes=7),
        source="whai362/PVT v2 via reference vendored copy "
               "(tfimm/architectures/timm/pvt_v2.py)",
    )


def gen_pvt_v2_linear():
    mod = load_vendored("pvt_v2.py", "vendored_pvt_v2_lin")
    torch.manual_seed(103)
    model = mod.PyramidVisionTransformerV2(
        # embed_dims is indexed [3] for the head even with 2 stages; pad it.
        img_size=64, embed_dims=[8, 16, 16, 16], num_heads=[1, 2],
        mlp_ratios=[2, 2],
        qkv_bias=True, depths=[1, 1], sr_ratios=[4, 2], num_stages=2,
        num_classes=7, linear=True, norm_layer=partial(nn.LayerNorm, eps=1e-6),
    )
    inp = fixed_image(103, 2, 64)
    out = run_eval(model, inp)
    save_fixture(
        "pvt_v2_linear", model.state_dict(), inp, out,
        model_name="pvt_v2_b2_linear",
        kwargs=dict(input_size=(64, 64), embed_dim=(8, 16), nb_heads=(1, 2),
                    mlp_ratio=(2.0, 2.0), nb_blocks=(1, 1), sr_ratio=(4, 2),
                    nb_classes=7),
        source="whai362/PVT v2 (linear SRA) via reference vendored copy",
    )


# -- HuggingFace transformers families ------------------------------------------

def _remap(sd, rules):
    """Apply (regex, repl) rules to every key; drop keys mapped to None."""
    import re

    out = {}
    for k, v in sd.items():
        nk = k
        for pat, repl in rules:
            nk = re.sub(pat, repl, nk)
        if nk:
            out[nk] = v
    return out


def _merge_qkv(sd, fmt_q, fmt_k, fmt_v, fmt_out, n_layers):
    """Concatenate HF's separate q/k/v projections into timm's fused qkv."""
    for i in range(n_layers):
        for suffix in ("weight", "bias"):
            q = sd.pop(fmt_q.format(i=i, s=suffix))
            k = sd.pop(fmt_k.format(i=i, s=suffix))
            v = sd.pop(fmt_v.format(i=i, s=suffix))
            sd[fmt_out.format(i=i, s=suffix)] = torch.cat([q, k, v], dim=0)
    return sd


def gen_hf_vit():
    from transformers import ViTConfig, ViTForImageClassification

    torch.manual_seed(104)
    cfg = ViTConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                    intermediate_size=64, image_size=64, patch_size=16,
                    num_labels=7, layer_norm_eps=1e-6, hidden_act="gelu")
    model = ViTForImageClassification(cfg)
    inp = fixed_image(104, 2, 64)
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(inp).permute(0, 3, 1, 2)).logits.numpy()

    sd = dict(model.state_dict())
    sd = _merge_qkv(
        sd,
        "vit.encoder.layer.{i}.attention.attention.query.{s}",
        "vit.encoder.layer.{i}.attention.attention.key.{s}",
        "vit.encoder.layer.{i}.attention.attention.value.{s}",
        "vit.encoder.layer.{i}.attention.attention.qkv.{s}",
        n_layers=2,
    )
    sd = _remap(sd, [
        (r"^vit\.embeddings\.cls_token$", "cls_token"),
        (r"^vit\.embeddings\.position_embeddings$", "pos_embed"),
        (r"^vit\.embeddings\.patch_embeddings\.projection\.", "patch_embed.proj."),
        (r"^vit\.encoder\.layer\.(\d+)\.attention\.attention\.qkv\.",
         r"blocks.\1.attn.qkv."),
        (r"^vit\.encoder\.layer\.(\d+)\.attention\.output\.dense\.",
         r"blocks.\1.attn.proj."),
        (r"^vit\.encoder\.layer\.(\d+)\.intermediate\.dense\.",
         r"blocks.\1.mlp.fc1."),
        (r"^vit\.encoder\.layer\.(\d+)\.output\.dense\.", r"blocks.\1.mlp.fc2."),
        (r"^vit\.encoder\.layer\.(\d+)\.layernorm_before\.", r"blocks.\1.norm1."),
        (r"^vit\.encoder\.layer\.(\d+)\.layernorm_after\.", r"blocks.\1.norm2."),
        (r"^vit\.layernorm\.", "norm."),
        (r"^classifier\.", "head."),
    ])
    save_fixture(
        "hf_vit", sd, inp, out,
        model_name="vit_base_patch16_224",
        kwargs=dict(input_size=(64, 64), patch_size=16, embed_dim=32,
                    nb_blocks=2, nb_heads=2, mlp_ratio=2.0, nb_classes=7),
        source="huggingface/transformers ViTForImageClassification "
               "(independent implementation; state_dict remapped to timm keys)",
    )


def gen_hf_convnext():
    from transformers import ConvNextConfig, ConvNextForImageClassification

    torch.manual_seed(105)
    # HF's encoder hard-codes 4 stages (hidden_sizes indexed 0..3).
    cfg = ConvNextConfig(num_channels=3, hidden_sizes=[8, 12, 16, 20],
                         depths=[1, 1, 1, 1], num_labels=7, image_size=64,
                         layer_scale_init_value=1e-6)
    model = ConvNextForImageClassification(cfg)
    inp = fixed_image(105, 2, 64)
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(inp).permute(0, 3, 1, 2)).logits.numpy()

    sd = dict(model.state_dict())
    sd = _remap(sd, [
        # Specific rules first: the generic ".layernorm." rule below must not
        # consume the stem/head norms.
        (r"^convnext\.embeddings\.patch_embeddings\.", "stem.0."),
        (r"^convnext\.embeddings\.layernorm\.", "stem.1."),
        (r"^convnext\.layernorm\.", "head.norm."),
        (r"^convnext\.encoder\.stages\.0\.layers\.(\d+)\.", r"stages.0.blocks.\1."),
        (r"^convnext\.encoder\.stages\.(\d+)\.downsampling_layer\.0\.",
         r"stages.\1.downsample.0."),
        (r"^convnext\.encoder\.stages\.(\d+)\.downsampling_layer\.1\.",
         r"stages.\1.downsample.1."),
        (r"^convnext\.encoder\.stages\.(\d+)\.layers\.(\d+)\.",
         r"stages.\1.blocks.\2."),
        (r"\.dwconv\.", ".conv_dw."),
        (r"\.layernorm\.", ".norm."),
        (r"\.pwconv1\.", ".mlp.fc1."),
        (r"\.pwconv2\.", ".mlp.fc2."),
        (r"\.layer_scale_parameter$", ".gamma"),
        (r"^classifier\.", "head.fc."),
    ])
    save_fixture(
        "hf_convnext", sd, inp, out,
        model_name="convnext_tiny",
        kwargs=dict(input_size=(64, 64), embed_dim=(8, 12, 16, 20),
                    nb_blocks=(1, 1, 1, 1), nb_classes=7),
        source="huggingface/transformers ConvNextForImageClassification "
               "(independent implementation; state_dict remapped to timm keys)",
    )


def gen_hf_swin():
    from transformers import SwinConfig, SwinForImageClassification

    torch.manual_seed(106)
    cfg = SwinConfig(image_size=64, patch_size=4, embed_dim=16,
                     depths=[2, 2], num_heads=[2, 4], window_size=4,
                     mlp_ratio=2.0, num_labels=7, drop_path_rate=0.0)
    model = SwinForImageClassification(cfg)
    inp = fixed_image(106, 2, 64)
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(inp).permute(0, 3, 1, 2)).logits.numpy()

    sd = dict(model.state_dict())
    # Drop precomputed index buffers (recomputed on our side).
    sd = {k: v for k, v in sd.items()
          if not k.endswith("relative_position_index")}
    for l_ in range(2):
        for i in range(2):
            for s in ("weight", "bias"):
                base = f"swin.encoder.layers.{l_}.blocks.{i}.attention.self"
                q = sd.pop(f"{base}.query.{s}")
                k = sd.pop(f"{base}.key.{s}")
                v = sd.pop(f"{base}.value.{s}")
                sd[f"{base}.qkv.{s}"] = torch.cat([q, k, v], dim=0)
    sd = _remap(sd, [
        (r"^swin\.embeddings\.patch_embeddings\.projection\.",
         "patch_embed.proj."),
        (r"^swin\.embeddings\.norm\.", "patch_embed.norm."),
        (r"^swin\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.layernorm_before\.",
         r"layers.\1.blocks.\2.norm1."),
        (r"^swin\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.layernorm_after\.",
         r"layers.\1.blocks.\2.norm2."),
        (r"^swin\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.attention\.self\."
         r"relative_position_bias_table$",
         r"layers.\1.blocks.\2.attn.relative_position_bias_table"),
        (r"^swin\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.attention\.self\.qkv\.",
         r"layers.\1.blocks.\2.attn.qkv."),
        (r"^swin\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.attention\.output\."
         r"dense\.", r"layers.\1.blocks.\2.attn.proj."),
        (r"^swin\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.intermediate\.dense\.",
         r"layers.\1.blocks.\2.mlp.fc1."),
        (r"^swin\.encoder\.layers\.(\d+)\.blocks\.(\d+)\.output\.dense\.",
         r"layers.\1.blocks.\2.mlp.fc2."),
        (r"^swin\.encoder\.layers\.(\d+)\.downsample\.reduction\.",
         r"layers.\1.downsample.reduction."),
        (r"^swin\.encoder\.layers\.(\d+)\.downsample\.norm\.",
         r"layers.\1.downsample.norm."),
        (r"^swin\.layernorm\.", "norm."),
        (r"^classifier\.", "head."),
    ])
    save_fixture(
        "hf_swin", sd, inp, out,
        model_name="swin_tiny_patch4_window7_224",
        kwargs=dict(input_size=(64, 64), patch_size=4, embed_dim=16,
                    nb_blocks=(2, 2), nb_heads=(2, 4), window_size=4,
                    mlp_ratio=2.0, nb_classes=7),
        source="huggingface/transformers SwinForImageClassification "
               "(independent implementation; state_dict remapped to timm keys)",
    )


def gen_hf_resnet():
    """HF transformers ResNet (torchvision-v1.5 semantics: stride on the 3x3)
    vs our resnet50-config bottleneck path — the zoo's largest family."""
    from transformers import ResNetConfig, ResNetForImageClassification

    torch.manual_seed(107)
    cfg = ResNetConfig(embedding_size=64, hidden_sizes=[32, 32, 64, 64],
                       depths=[1, 1, 1, 1], layer_type="bottleneck",
                       hidden_act="relu", num_labels=7,
                       downsample_in_first_stage=False,
                       downsample_in_bottleneck=False)
    model = ResNetForImageClassification(cfg)
    inp = fixed_image(107, 2, 64)
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(inp).permute(0, 3, 1, 2)).logits.numpy()

    sd = _remap(dict(model.state_dict()), [
        (r"^resnet\.embedder\.embedder\.convolution\.", "conv1."),
        (r"^resnet\.embedder\.embedder\.normalization\.", "bn1."),
        (r"^resnet\.encoder\.stages\.0\.", "layer1#"),
        (r"^resnet\.encoder\.stages\.1\.", "layer2#"),
        (r"^resnet\.encoder\.stages\.2\.", "layer3#"),
        (r"^resnet\.encoder\.stages\.3\.", "layer4#"),
        (r"#layers\.(\d+)\.shortcut\.convolution\.", r".\1.downsample.0."),
        (r"#layers\.(\d+)\.shortcut\.normalization\.", r".\1.downsample.1."),
        (r"#layers\.(\d+)\.layer\.0\.convolution\.", r".\1.conv1."),
        (r"#layers\.(\d+)\.layer\.0\.normalization\.", r".\1.bn1."),
        (r"#layers\.(\d+)\.layer\.1\.convolution\.", r".\1.conv2."),
        (r"#layers\.(\d+)\.layer\.1\.normalization\.", r".\1.bn2."),
        (r"#layers\.(\d+)\.layer\.2\.convolution\.", r".\1.conv3."),
        (r"#layers\.(\d+)\.layer\.2\.normalization\.", r".\1.bn3."),
        (r"^classifier\.1\.", "fc."),
    ])
    save_fixture(
        "hf_resnet", sd, inp, out,
        model_name="resnet50",
        kwargs=dict(input_size=(64, 64), nb_blocks=(1, 1, 1, 1),
                    nb_channels=(8, 8, 16, 16), nb_classes=7),
        source="huggingface/transformers ResNetForImageClassification "
               "(independent implementation; state_dict remapped to timm keys)",
    )


def gen_hf_bit():
    """HF transformers BiT (pre-activation ResNetV2: weight-standardized
    convs + GroupNorm + TF-SAME padding) vs our resnetv2 bitm path."""
    from transformers import BitConfig, BitForImageClassification

    torch.manual_seed(108)
    # global_padding=None -> symmetric conv pads + zero-padded fixed-stem
    # pool: exactly the reference's bitm default (conv_padding="symmetric",
    # stem_type="fixed"). (HF's "SAME" mode zero-pads its dynamic maxpool
    # where TF/timm SAME pads -inf, so the SAME configs are not comparable.)
    cfg = BitConfig(embedding_size=64, hidden_sizes=[128, 256],
                    depths=[1, 2], layer_type="preactivation",
                    hidden_act="relu", num_labels=7, num_groups=32,
                    global_padding=None, embedding_dynamic_padding=False,
                    output_stride=32, drop_path_rate=0.0)
    model = BitForImageClassification(cfg)
    inp = fixed_image(108, 2, 64)
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(inp).permute(0, 3, 1, 2)).logits.numpy()

    sd = _remap(dict(model.state_dict()), [
        (r"^bit\.embedder\.convolution\.", "stem.conv."),
        (r"^bit\.encoder\.stages\.(\d+)\.layers\.(\d+)\.", r"stages.\1.blocks.\2."),
        (r"^bit\.norm\.", "norm."),
        (r"^classifier\.1\.", "head.fc."),
    ])
    save_fixture(
        "hf_bit", sd, inp, out,
        model_name="resnetv2_50x1_bitm",
        kwargs=dict(input_size=(64, 64), nb_blocks=(1, 2),
                    nb_channels=(128, 256), nb_classes=7),
        source="huggingface/transformers BitForImageClassification "
               "(independent implementation; state_dict remapped to timm keys)",
    )


def gen_hf_efficientnet():
    """HF transformers EfficientNet (faithful TF port: asymmetric SAME pads
    via ZeroPad2d for stride-2 convs, BN eps 1e-3, swish) vs our
    efficientnet_b0 config at width/depth 0.5 — exercises the tf_-SAME
    trap end to end against code nobody in this repo wrote."""
    from transformers import (EfficientNetConfig,
                              EfficientNetForImageClassification)

    torch.manual_seed(211)
    cfg = EfficientNetConfig(width_coefficient=0.25, depth_coefficient=0.5,
                             image_size=64, num_labels=10, hidden_dim=320)
    model = EfficientNetForImageClassification(cfg)
    inp = fixed_image(211, 2, 64)
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(inp).permute(0, 3, 1, 2)).logits.numpy()

    # Flat HF block index -> timm (stage, idx); ceil(0.5 * [1,2,2,3,3,4,1]).
    repeats = [1, 1, 1, 2, 2, 2, 1]
    expand = [1, 6, 6, 6, 6, 6, 6]
    rules = [
        (r"^efficientnet\.embeddings\.convolution\.", "conv_stem."),
        (r"^efficientnet\.embeddings\.batchnorm\.", "bn1."),
        (r"^efficientnet\.encoder\.top_conv\.", "conv_head."),
        (r"^efficientnet\.encoder\.top_bn\.", "bn2."),
    ]
    b = 0
    for s, (r, e) in enumerate(zip(repeats, expand)):
        for i in range(r):
            src = rf"^efficientnet\.encoder\.blocks\.{b}\."
            dst = f"blocks.{s}.{i}."
            if e == 1:  # ds block: dw -> bn1 -> se -> pw -> bn2
                rules += [
                    (src + r"depthwise_conv\.depthwise_conv\.",
                     dst + "conv_dw."),
                    (src + r"depthwise_conv\.depthwise_norm\.", dst + "bn1."),
                    (src + r"squeeze_excite\.reduce\.",
                     dst + "se.conv_reduce."),
                    (src + r"squeeze_excite\.expand\.",
                     dst + "se.conv_expand."),
                    (src + r"projection\.project_conv\.", dst + "conv_pw."),
                    (src + r"projection\.project_bn\.", dst + "bn2."),
                ]
            else:  # ir block: pw -> bn1 -> dw -> bn2 -> se -> pwl -> bn3
                rules += [
                    (src + r"expansion\.expand_conv\.", dst + "conv_pw."),
                    (src + r"expansion\.expand_bn\.", dst + "bn1."),
                    (src + r"depthwise_conv\.depthwise_conv\.",
                     dst + "conv_dw."),
                    (src + r"depthwise_conv\.depthwise_norm\.", dst + "bn2."),
                    (src + r"squeeze_excite\.reduce\.",
                     dst + "se.conv_reduce."),
                    (src + r"squeeze_excite\.expand\.",
                     dst + "se.conv_expand."),
                    (src + r"projection\.project_conv\.", dst + "conv_pwl."),
                    (src + r"projection\.project_bn\.", dst + "bn3."),
                ]
            b += 1

    sd = _remap(dict(model.state_dict()), rules)
    save_fixture(
        "hf_efficientnet", sd, inp, out,
        model_name="efficientnet_b0",
        kwargs=dict(input_size=(64, 64), stem_size=8, nb_features=320,
                    channel_multiplier=0.25, depth_multiplier=0.5,
                    nb_classes=10, drop_rate=0.0, drop_path_rate=0.0),
        source="huggingface/transformers EfficientNetForImageClassification "
               "(independent TF-semantics implementation; state_dict "
               "remapped to timm keys)",
    )


def main():
    install_timm_shim()
    gens = (gen_poolformer, gen_pvt, gen_pvt_v2, gen_pvt_v2_linear,
            gen_hf_vit, gen_hf_convnext, gen_hf_swin, gen_hf_resnet,
            gen_hf_bit, gen_hf_efficientnet)
    only = set(sys.argv[1:])
    for fn in gens:
        if only and fn.__name__ not in only:
            continue
        try:
            fn()
        except Exception as e:  # keep generating the rest; report at the end
            print(f"FAILED {fn.__name__}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
