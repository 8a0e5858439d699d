"""ConvNeXt.

TPU-native re-implementation of the reference family
(tfimm/architectures/convnext.py:67-420): patchify stem, 7x7 depthwise conv +
LN + MLP blocks (Dense or 1x1-conv variants), layer scale (gamma), stage
downsampling by norm+strided conv. Param paths mirror timm
(stem.0 / stages.N.blocks.i.conv_dw / head.fc).

Paper: A ConvNet for the 2020s, https://arxiv.org/abs/2201.03545.
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
    MLP,
    Conv2d,
    ConvMLP,
    Dense,
    DepthwiseConv2d,
    norm_layer_factory,
    trunc_normal,
)
from tfimm_tpu.ops.basic import zeros_init
from tfimm_tpu.ops.stochastic import drop_path, dropout
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["ConvNeXt", "ConvNeXtConfig", "ConvNeXtBlock"]


@dataclass
class ConvNeXtConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    patch_size: int = 4
    embed_dim: Tuple = (96, 192, 384, 768)
    nb_blocks: Tuple = (3, 3, 9, 3)
    mlp_ratio: float = 4.0
    conv_mlp_block: bool = False
    # Regularization
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    # Other parameters
    norm_layer: str = "layer_norm_eps_1e-6"
    act_layer: str = "gelu"
    init_scale: float = 1e-6
    # Parameters for inference
    crop_pct: float = 0.875
    interpolation: str = "bicubic"
    # Preprocessing
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    # Weight transfer
    first_conv: str = "stem.0"
    classifier: str = "head.fc"


class ConvNeXtBlock:
    """DwConv7x7 -> LN -> MLP (Dense or 1x1 conv) -> layer scale -> drop path."""

    def __init__(self, embed_dim, mlp_ratio, conv_mlp_block, drop_rate,
                 drop_path_rate, norm_layer, act_layer, init_scale):
        norm = norm_layer_factory(norm_layer)
        kinit = trunc_normal(0.02)
        self.conv_dw = DepthwiseConv2d(embed_dim, 7, padding=3,
                                       kernel_init=kinit,
                                       bias_init=zeros_init())
        self.norm = norm(embed_dim)
        mlp_cls = ConvMLP if conv_mlp_block else MLP
        self.mlp = mlp_cls(embed_dim, int(mlp_ratio * embed_dim),
                           act_layer=act_layer, drop_rate=drop_rate,
                           kernel_init=kinit)
        self.init_scale = init_scale
        self.embed_dim = embed_dim
        self.drop_path_rate = drop_path_rate
        self.conv_mlp_block = conv_mlp_block
        self.drop_rate = drop_rate
        self.norm_name = norm_layer
        self.act_name = act_layer

    def init(self, rng):
        r = jax.random.split(rng, 3)
        return {
            "conv_dw": self.conv_dw.init(r[0]),
            "norm": self.norm.init(r[1]),
            "mlp": self.mlp.init(r[2]),
            "gamma": jnp.full((self.embed_dim,), self.init_scale),
        }

    def _use_fused_kernel(self, x):
        import os

        from tfimm_tpu.core import current_context

        # Opt-in: measured slower than XLA on v5e (see
        # ops/pallas/convnext_block.py docstring).
        if os.environ.get("TFIMM_TPU_FUSED_CONVNEXT", "0") != "1":
            return False
        if os.environ.get("TFIMM_TPU_EXACT_GELU", "0") == "1":
            return False
        ctx = current_context()
        if ctx.training or self.conv_mlp_block or self.drop_rate:
            return False
        if x.dtype not in (jnp.bfloat16, jnp.float16):
            return False  # kernel uses tanh-GELU, the low-precision policy
        try:
            import jax

            if jax.default_backend() != "tpu":
                return False
        except Exception:
            return False
        # VMEM estimate: padded input + MLP hidden + output (+ weights).
        b, h, w, c = x.shape
        hidden = self.mlp.fc1.out_features
        vmem = ((h + 6) * (w + 6) * c + 2 * h * w * c + h * w * hidden
                + c * hidden * 2) * 2
        return vmem < 12 * 1024 * 1024

    def _mlp_kernel_ok(self):
        """Gate for the fused LN+MLP kernel (ops/pallas/convnext_mlp.py):
        inference only (drop path / dropout are identity), Dense MLP,
        standard LayerNorm + GELU. Shape/VMEM/backends checks live in the
        dispatcher. Default-on; TFIMM_TPU_CONVNEXT_MLP=0 opts out."""
        from tfimm_tpu.core import current_context

        if current_context().training:
            return False
        if self.conv_mlp_block or self.drop_rate:
            return False
        return self.norm_name.startswith("layer_norm") \
            and self.act_name == "gelu"

    def __call__(self, p, x):
        from tfimm_tpu.quant import any_quantized

        # int8 params -> XLA path. The fused paths read BOTH MLP kernels
        # raw, and a custom quantize_int8 skip list can quantize either
        # subset, so gate on both.
        quantized = any_quantized(p["mlp"]["fc1"], p["mlp"]["fc2"])
        if self._use_fused_kernel(x) and not quantized:
            from tfimm_tpu.ops.pallas.convnext_block import fused_convnext_block

            return fused_convnext_block(
                x, p["conv_dw"]["kernel"], p["conv_dw"]["bias"],
                p["norm"]["scale"], p["norm"]["bias"],
                p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
                p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
                p["gamma"], eps=self.norm.eps,
            )
        shortcut = x
        x = self.conv_dw(p["conv_dw"], x)
        if self._mlp_kernel_ok() and not quantized:
            from tfimm_tpu.ops.pallas.convnext_mlp import convnext_mlp_or_none

            out = convnext_mlp_or_none(
                x, shortcut, p["norm"]["scale"], p["norm"]["bias"],
                p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
                p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
                p["gamma"], eps=self.norm.eps,
            )
            if out is not None:
                return out
        x = self.norm(p["norm"], x)
        x = self.mlp(p["mlp"], x)
        x = x * p["gamma"].astype(x.dtype)
        x = drop_path(x, self.drop_path_rate)
        return x + shortcut


class ConvNeXtStage:
    """Optional (norm, strided conv) downsample + block sequence."""

    def __init__(self, stride, in_dim, embed_dim, nb_blocks, mlp_ratio,
                 conv_mlp_block, drop_rate, drop_path_rates, norm_layer,
                 act_layer, init_scale):
        norm = norm_layer_factory(norm_layer)
        kinit = trunc_normal(0.02)
        if stride > 1:
            self.downsample_norm = norm(in_dim)
            self.downsample_conv = Conv2d(in_dim, embed_dim, stride,
                                          stride=stride, padding="valid",
                                          kernel_init=kinit,
                                          bias_init=zeros_init())
        else:
            self.downsample_norm = None
            self.downsample_conv = None
        self.blocks = [
            ConvNeXtBlock(embed_dim, mlp_ratio, conv_mlp_block, drop_rate,
                          drop_path_rates[i], norm_layer, act_layer, init_scale)
            for i in range(nb_blocks)
        ]

    def init(self, rng):
        p = {}
        if self.downsample_conv is not None:
            r1, r2 = jax.random.split(rng)
            p["downsample"] = {"0": self.downsample_norm.init(r1),
                               "1": self.downsample_conv.init(r2)}
        p["blocks"] = {str(i): blk.init(jax.random.fold_in(rng, i + 10))
                       for i, blk in enumerate(self.blocks)}
        return p

    def __call__(self, p, x, stage_idx):
        if self.downsample_conv is not None:
            x = self.downsample_norm(p["downsample"]["0"], x)
            x = self.downsample_conv(p["downsample"]["1"], x)
            capture_feature(f"stage_{stage_idx}/downsample", x)
        for i, blk in enumerate(self.blocks):
            x = blk(p["blocks"][str(i)], x)
            capture_feature(f"stage_{stage_idx}/block_{i}", x)
        return x


class ConvNeXt(Model):
    cfg_class = ConvNeXtConfig

    def __init__(self, cfg: ConvNeXtConfig, params=None):
        super().__init__(cfg, params)
        norm = norm_layer_factory(cfg.norm_layer)
        kinit = trunc_normal(0.02)
        self.stem_conv = Conv2d(cfg.in_channels, cfg.embed_dim[0],
                                cfg.patch_size, stride=cfg.patch_size,
                                padding="valid", kernel_init=kinit,
                                bias_init=zeros_init())
        self.stem_norm = norm(cfg.embed_dim[0])

        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        dpr = np.split(dpr, np.cumsum(cfg.nb_blocks))
        self.stages = []
        for j in range(len(cfg.nb_blocks)):
            in_dim = cfg.embed_dim[max(j - 1, 0)]
            self.stages.append(ConvNeXtStage(
                stride=2 if j > 0 else 1, in_dim=in_dim,
                embed_dim=cfg.embed_dim[j], nb_blocks=cfg.nb_blocks[j],
                mlp_ratio=cfg.mlp_ratio, conv_mlp_block=cfg.conv_mlp_block,
                drop_rate=cfg.drop_rate, drop_path_rates=dpr[j],
                norm_layer=cfg.norm_layer, act_layer=cfg.act_layer,
                init_scale=cfg.init_scale,
            ))
        self.nb_features = cfg.embed_dim[-1]
        self.head_norm = norm(self.nb_features)
        self.fc = (Dense(self.nb_features, cfg.nb_classes, kernel_init=kinit,
                         bias_init=zeros_init())
                   if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        r = jax.random.split(rng, 4)
        p = {"stem": {"0": self.stem_conv.init(r[0]),
                      "1": self.stem_norm.init(r[1])}}
        p["stages"] = {str(j): stage.init(jax.random.fold_in(r[2], j))
                       for j, stage in enumerate(self.stages)}
        head = {"norm": self.head_norm.init(r[3])}
        if self.fc is not None:
            head["fc"] = self.fc.init(jax.random.fold_in(r[3], 1))
        p["head"] = head
        return p

    def forward_features(self, params, x):
        x = self.stem_conv(params["stem"]["0"], x)
        x = self.stem_norm(params["stem"]["1"], x)
        capture_feature("stem", x)
        for j, stage in enumerate(self.stages):
            x = stage(params["stages"][str(j)], x, j)
        capture_feature("conv_features", x)
        return x

    def forward(self, params, x):
        x = self.forward_features(params, x)
        x = x.mean(axis=(1, 2))
        x = self.head_norm(params["head"]["norm"], x)
        x = dropout(x, self.cfg.drop_rate)
        if self.fc is not None:
            x = self.fc(params["head"]["fc"], x)
        capture_feature("logits", x)
        return x

    @property
    def feature_names(self):
        names = ["stem"]
        for j, n in enumerate(self.cfg.nb_blocks):
            if j > 0:
                names.append(f"stage_{j}/downsample")
            names += [f"stage_{j}/block_{i}" for i in range(n)]
        return tuple(names + ["conv_features", "logits"])


# -- variant registrations ---------------------------------------------------
# Mirrors the reference (tfimm/architectures/convnext.py:423-659).

def _register(name, **kwargs):
    def fn():
        return ConvNeXt, ConvNeXtConfig(name=name, url="[timm]", **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_DIMS = {
    "tiny": ((96, 192, 384, 768), (3, 3, 9, 3)),
    "small": ((96, 192, 384, 768), (3, 3, 27, 3)),
    "base": ((128, 256, 512, 1024), (3, 3, 27, 3)),
    "large": ((192, 384, 768, 1536), (3, 3, 27, 3)),
    "xlarge": ((256, 512, 1024, 2048), (3, 3, 27, 3)),
}

for _size in ("tiny", "small", "base", "large"):
    _d, _b = _DIMS[_size]
    _register(f"convnext_{_size}", embed_dim=_d, nb_blocks=_b)
for _size in ("tiny", "small", "base", "large", "xlarge"):
    _d, _b = _DIMS[_size]
    _register(f"convnext_{_size}_in22ft1k", embed_dim=_d, nb_blocks=_b)
    _register(f"convnext_{_size}_384_in22ft1k", input_size=(384, 384),
              embed_dim=_d, nb_blocks=_b)
    _register(f"convnext_{_size}_in22k", nb_classes=21841, embed_dim=_d,
              nb_blocks=_b)
