"""Generate per-family documentation pages (docs/families/<module>.md).

The reference ships per-architecture Sphinx pages
(/root/reference/docs/source/content/convnext.rst, efficientnet.rst, ...);
here each page combines hand-authored prose (PROSE below: distinctive
machinery, config surface, TPU notes) with tables generated live from the
model registry and results CSVs, so variant lists and perf rows never drift
from the code.

Usage: python scripts/make_family_docs.py   (rerun after zoo/registry edits)
"""

import csv
import os
import sys
from dataclasses import fields

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

import tfimm_tpu  # noqa: E402,F401
from tfimm_tpu.models.registry import (  # noqa: E402
    list_models,
    model_config,
)

OUT_DIR = os.path.join(ROOT, "docs", "families")

# Hand-authored per-family content. "title", "prose" (architecture +
# TPU-specific notes), "config" (the config class + fields worth calling
# out), "ref" (reference anchor for parity checks).
PROSE = {
    "vit": dict(
        title="ViT / DeiT",
        config="ViTConfig",
        ref="tfimm/architectures/vit.py",
        prose="""\
Vision Transformer (and its distilled DeiT variants). Patchify via a strided
conv (`PatchEmbeddings`), prepend a class token (plus a distillation token
when `distilled=True`), add learned position embeddings, run pre-norm
transformer blocks, classify from the class token (distilled models return
both heads stacked; `ClassificationProblem` averages them).

Key config fields: `patch_size`, `embed_dim`, `nb_blocks`, `nb_heads`,
`mlp_ratio`, `qkv_bias`, `representation_size` (pre-logits layer),
`distilled`, `interpolate_input` (resize any input to the trained grid at
inference). Loading weights at a new `input_size` goes through the
`transform_pos_embed` hook (bicubic token-grid interpolation).

**TPU path.** Attention runs the fused masked-pair MHA Pallas kernel
(`ops/pallas/fused_mha.py`) from the packed qkv projection: online scores
for a pair of heads per lane group, clamped no-max softmax, sublane-stacked
pair bodies (default-on), custom VJP for training. Head dims outside
{16, 32, 64} or odd head counts fall back to XLA (measured slower to pad).
ViT-B/16 bs128 bf16 inference is the repo's headline benchmark
(`bench.py`).""",
    ),
    "vit_hybrid": dict(
        title="ViT-Hybrid (R+ViT)",
        config="ViTConfig (patch_layer=\"hybrid_embeddings\")",
        ref="tfimm/architectures/vit_hybrid.py",
        prose="""\
ViT on top of a ResNetV2 stem/stage stack (`HybridEmbeddings`): the
convolutional trunk (weight-standardized convs + GroupNorm, pre-activation)
produces the token grid that feeds the standard ViT blocks. Variants select
trunk depth via `patch_nb_blocks` (e.g. R26 = (2,2,2,2), R50 = (3,4,9)).
Everything else — attention kernels, pos-embed interpolation, distillation —
is inherited from the ViT page.""",
    ),
    "cait": dict(
        title="CaiT",
        config="CaiTConfig",
        ref="tfimm/architectures/cait.py",
        prose="""\
Class-Attention in Image Transformers: a two-stage ViT where patch tokens
run `nb_blocks` self-attention blocks with **talking-head attention**
(learned head mixing before and after the softmax) and per-block layer
scale (`init_scale`), then two **class-attention** blocks update only the
class token against the frozen patch tokens.

**TPU path.** The talking-head kernel (`ops/pallas/cait_attention.py`)
fuses both head-mix matmuls with the attention body per batch row, with
sublane-stacked head chunks (default-on, `TFIMM_TPU_CAIT_STACKED=0` opts
out) and a custom VJP; measured +8.6% inference / +13.1% backprop on
cait_s24 vs its own per-head bodies. 577-token (384px) variants fit the
default VMEM gate and take the kernel, with backward on the XLA twin;
the 784-token cait_m48_448 exceeds the XLA:TPU scoped-vmem compile limit
(measured) and runs the XLA path.""",
    ),
    "swin": dict(
        title="Swin Transformer",
        config="SwinTransformerConfig",
        ref="tfimm/architectures/swin.py",
        prose="""\
Hierarchical windowed attention: 7x7 (or 12x12) token windows with a
learned relative-position-bias table, alternating cyclic shifts, and
`PatchMerging` downsampling between stages. The shift masks and
relative-position index are precomputed in numpy at build time — static
constants in the jitted graph.

**TPU path.** Three stacked levers (all default-on, each measured):
(1) `ops/pallas/window_mha.py` — fused windowed attention over window
*pairs* per lane group (g=2 packing; g=4 measured worse), 49→52-token
sublane padding (+1.35-1.47x), clamped no-max softmax, sublane-stacked
group bodies, custom VJP; (2) `ops/pallas/swin_block.py` — whole-block
fusion (LN+QKV+attention+proj+MLP) for inference; (3) window-resident
stages (`ops/window_gather.py`): every roll/partition/reverse chain is a
static token permutation, so a stage enters the padded window layout with
one gather and hops blocks with one composed re-window gather (+18% on
swin_tiny). Gradient workloads re-run the per-block composition (stage-
level AD swap) — backprop keeps the unfused-path speed.""",
    ),
    "mlp_mixer": dict(
        title="MLP-Mixer / ResMLP / gMLP",
        config="MLPMixerConfig",
        ref="tfimm/architectures/mlp_mixer.py",
        prose="""\
Three all-MLP block types behind one config (`block_layer`): `mixer_block`
(token-mixing MLP + channel MLP), `res_block` (ResMLP: Affine norms, layer
scale, single token Dense), and `spatial_gating_block` (gMLP: spatial
gating unit splitting channels). Fixed input size — the token-dim Dense
bakes the grid in; `input_size` overrides rebuild the token MLPs.

**TPU notes.** Pure matmul/elementwise graphs — XLA fuses these optimally
(mixer_b16 = 7046 img/s bs128 bf16); no custom kernels needed. Token-MLP
matmuls at 196x196 are small; batch keeps the MXU fed.""",
    ),
    "convmixer": dict(
        title="ConvMixer",
        config="ConvMixerConfig",
        ref="tfimm/architectures/convmixer.py",
        prose="""\
Patch embedding followed by `depth` identical blocks: depthwise conv
(kernel_size up to 9) with residual, then pointwise 1x1 conv, BN+act after
each. TPU note: like ConvNeXt's dwconv, the large depthwise kernels are
VPU-bound — the 0.30-0.34 roofline fractions are that ceiling class, not
overhead (see results/README.md).""",
    ),
    "convnext": dict(
        title="ConvNeXt",
        config="ConvNeXtConfig",
        ref="tfimm/architectures/convnext.py",
        prose="""\
Modernized conv net: per block, 7x7 depthwise conv → LayerNorm → pointwise
MLP (Dense, or 1x1 convs when `conv_mlp_block=True`) → layer scale
(`init_scale`) → drop path → residual. Stages downsample with (LN, strided
2x2 conv); the stem is a patchify 4x4/4 conv.

**TPU path.** The depthwise conv stays on XLA — every Pallas dwconv variant
measured slower (it is VPU-compute-bound at ~4.5 TF/s, not HBM-bound;
scripts/perf/exp_dwconv.py). The LN+MLP+layer-scale+residual tail runs the
fused `ops/pallas/convnext_mlp.py` kernel (default-on,
`TFIMM_TPU_CONVNEXT_MLP=0` opts out): the standalone LayerNorm HBM passes
(3.4 ms/batch on ConvNeXt-B, zero FLOPs) disappear into the fc1 read, and
layer scale + residual ride the fc2 epilogue. The hidden dimension is
chunked across the grid so C=1024 stages fit VMEM. Training uses the XLA
composition via the kernel's XLA-twin VJP.""",
    ),
    "pvt": dict(
        title="PVT (Pyramid Vision Transformer)",
        config="PyramidVisionTransformerConfig",
        ref="tfimm/architectures/pvt.py",
        prose="""\
Four-stage pyramid transformer with **spatial-reduction attention**: keys/
values are downsampled per stage by strided convs (`sr_ratios` 8/4/2/1),
making global attention affordable at 56x56 tokens. Per-stage patch embeds
and position embeddings (interpolated on input-size change).""",
    ),
    "pvt_v2": dict(
        title="PVTv2",
        config="PyramidVisionTransformerV2Config",
        ref="tfimm/architectures/pvt_v2.py",
        prose="""\
PVT with overlapping patch embeddings, a depthwise conv inside each MLP
(positional information without pos-embeds), and — in the `_linear`
variants — linear SRA (7x7 adaptive average pooling + GELU instead of
strided convs). The adaptive-pool corner case is covered by a golden
fixture that caught a real off-by-one (pvt_v2_linear.npz).""",
    ),
    "pit": dict(
        title="PiT (Pooling-based ViT)",
        config="PoolingVisionTransformerConfig",
        ref="tfimm/architectures/pit.py",
        prose="""\
ViT with a shrinking token pyramid: between stages, `ConvHeadPooling`
(strided depthwise conv on the token grid + Dense on the class token)
halves the spatial resolution and widens channels. Distilled variants carry
a second token/head like DeiT.""",
    ),
    "resnet": dict(
        title="ResNet family",
        config="ResNetConfig",
        ref="tfimm/architectures/resnet.py",
        prose="""\
One config drives the whole family: `block` (basic/bottleneck),
`cardinality`/`base_width` (ResNeXt), `attn_layer` ("se"/"eca"),
`aa_layer` (BlurPool anti-aliasing), `stem_type` (deep/tiered),
`stem_width`, `downsample_mode` (conv/avg-pool), per-variant drop path.
Covers ResNet/ResNeXt/SE/ECA/Wide/ResNet-RS and the ssl/swsl/ig weight
releases.

**TPU notes.** ResNet-50 runs at its practical ceiling (13.2k img/s bs256
bf16): deep stages at ~88% of MXU peak, stages 1-2 at the HBM ceiling for
low-arithmetic-intensity 1x1 convs; the classic space-to-depth stem
reformulation measured *negative* on v5e (XLA already runs the 7x7/2 stem
as an implicit im2col matmul). See results/README.md for the budget.""",
    ),
    "resnetv2": dict(
        title="ResNetV2 (Big Transfer)",
        config="ResNetV2Config",
        ref="tfimm/architectures/resnetv2.py",
        prose="""\
Pre-activation bottlenecks with weight-standardized convs (`StdConv2d`) and
GroupNorm — BiT's transfer-friendly recipe, also the ViT-Hybrid trunk.
`width_factor` scales to the x3/x4 giants (152x4 ≈ 936M params); those run
at bs1-4 per chip in bf16 — multi-chip execution via the mesh API is the
intended deployment (docs/parallel.md).""",
    ),
    "vgg": dict(
        title="VGG",
        config="VGGConfig",
        ref="tfimm/architectures/vgg.py",
        prose="""\
Layer-spec-driven builder (e.g. `(1, 1, 'M', 2, 2, 'M', ...)`) with
optional BatchNorm, plus the timm-style `ConvMlp` pre-logits head (6x6
conv + 1x1 conv) so pretrained classifier weights transfer. Pure conv/
matmul graph — XLA-optimal, no custom kernels.""",
    ),
    "efficientnet": dict(
        title="EfficientNet family",
        config="EfficientNetConfig",
        ref="tfimm/architectures/efficientnet.py (+_blocks.py, _builder.py)",
        prose="""\
The block-string DSL family: variants are arch-def strings
(`"ir_r2_k3_s2_e6_c24_se0.25"` → InvertedResidual, 2 repeats, 3x3, stride
2, expansion 6, 24 channels, SE 0.25) scaled by `channel_multiplier` /
`depth_multiplier` and resolution. Covers MobileNetV2, B0-B8/L2 (+AdvProp
`_ap`, NoisyStudent `_ns`), Edge-TPU (`es/em/el`), Lite, and V2
(FusedMBConv stages, S/M/L/XL + 21k releases). The builder reproduces
timm's depth-scaling rounding, `output_stride` dilation conversion, and
per-block drop-path ramp exactly.

**TPU notes.** The weak stages are physics, not overhead: C=24 stem stages
are HBM-bound (10% peak), depthwise+SE stages sit at the VPU floor; the
whole model runs *faster* than the sum of its stage blocks because XLA
fuses BN/act/SE glue into conv epilogues (probe_effv2.py). V2's
FusedMBConv stages lift arithmetic intensity exactly as designed — v2_b0
measures 50k img/s bs256 bf16.""",
    ),
    "poolformer": dict(
        title="PoolFormer",
        config="PoolFormerConfig",
        ref="tfimm/architectures/poolformer.py",
        prose="""\
MetaFormer with average-pool token mixing: each block is GroupNorm(1 group)
→ 3x3 avg-pool (count_exclude_pad, minus identity) → residual, then a
1x1-conv MLP with drop path. The pool-minus-identity trick and 1-group
GroupNorm match the reference numerics exactly (golden fixture
poolformer.npz).""",
    ),
}

ORDER = ["vit", "vit_hybrid", "cait", "swin", "mlp_mixer", "convmixer",
         "convnext", "poolformer", "pvt", "pvt_v2", "pit", "resnet",
         "resnetv2", "vgg", "efficientnet"]


def zoo_rows():
    rows = {}
    for fn in ("v5e_zoo.csv",):
        path = os.path.join(ROOT, "results", fn)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for r in csv.DictReader(f):
                rows[r["model"]] = r
    return rows


def coverage():
    path = os.path.join(ROOT, "results", "coverage.csv")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return {r["model"]: r for r in csv.DictReader(f)}


def family_page(mod, zoo, cov):
    meta = PROSE[mod]
    names = list_models(module=mod)
    cfg = model_config(names[0])
    lines = [f"# {meta['title']}", ""]
    lines += [meta["prose"], ""]
    lines += [f"Config class: `{meta['config']}` "
              f"({len(fields(cfg))} fields). "
              f"Reference parity anchor: `{meta['ref']}`.", ""]
    lines += [f"## Variants ({len(names)})", ""]
    lines += ["| variant | perf row | inference img/s | backprop img/s | bs |",
              "|---|---|---|---|---|"]
    for n in names:
        if n in zoo:
            r = zoo[n]
            lines.append(f"| `{n}` | measured | "
                         f"{r['inference_img_per_sec']} | "
                         f"{r['backprop_img_per_sec']} | "
                         f"{r['inference_batch_size']} |")
        else:
            c = cov.get(n, {})
            status = c.get("status", "")
            alias = c.get("alias_of", "")
            note = ("alias of `%s`" % alias) if alias else status
            lines.append(f"| `{n}` | {note or '—'} | | | |")
    lines += ["", "Throughput: v5e chip, bf16, fixed batch "
              "(results/v5e_zoo.csv; scripts/perf/zoo_sweep.py). "
              "Aliases share the measured variant's compiled graph "
              "(results/coverage.csv).", ""]
    lines += ["## Loading pretrained weights", "",
              "```python",
              "import tfimm_tpu as tfm",
              f"model = tfm.create_model(\"{names[0]}\", pretrained=\"timm\")",
              "preprocess = tfm.create_preprocessing("
              f"\"{names[0]}\", dtype=\"float32\")",
              "```", "",
              "Conversion (layout transposes, name rules) is automatic "
              "(docs/conversion.md).", ""]
    return "\n".join(lines)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    zoo, cov = zoo_rows(), coverage()
    index = ["# Model families", "",
             "One page per architecture family: design, config surface, "
             "TPU kernel paths, variants with measured throughput.", ""]
    for mod in ORDER:
        page = family_page(mod, zoo, cov)
        fn = os.path.join(OUT_DIR, f"{mod}.md")
        with open(fn, "w") as f:
            f.write(page)
        index.append(f"- [{PROSE[mod]['title']}]({mod}.md)")
        print("wrote", fn)
    index += ["- [Segment Anything](../segment_anything.md)", ""]
    with open(os.path.join(OUT_DIR, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print("wrote", os.path.join(OUT_DIR, "index.md"))


if __name__ == "__main__":
    main()
