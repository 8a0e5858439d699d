"""EfficientNet-family building blocks and the block-definition string DSL.

Behavioral re-implementation of the reference DSL and blocks
(tfimm/architectures/efficientnet_blocks.py:18-523): block strings like
``"ir_r2_k3_s2_e6_c24_se0.25"`` decode into BlockArgs (type, repeats, kernel,
stride, expansion, channels, SE ratio, activation, skip), which instantiate
ConvBnAct / DepthwiseSeparableConv / InvertedResidual (MBConv) / EdgeResidual
(FusedMBConv). Param paths mirror timm (conv_pw / conv_dw / conv_pwl /
se.conv_reduce / se.conv_expand / bn1..bn3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Tuple

import jax

from tfimm_tpu.ops import (
    Conv2d,
    DepthwiseConv2d,
    FanoutInitializer,
    act_layer_factory,
    norm_layer_factory,
)
from tfimm_tpu.ops.stochastic import drop_path
from tfimm_tpu.utils.etc import make_divisible

__all__ = ["BlockArgs", "SqueezeExcite", "ConvBnAct", "DepthwiseSeparableConv",
           "InvertedResidual", "EdgeResidual", "create_conv2d"]


def create_conv2d(in_channels, filters=None, kernel_size=3, strides=1,
                  padding="symmetric", dilation_rate=1, nb_groups=1,
                  depthwise=False, use_bias=False):
    """Conv factory used throughout the EfficientNet family."""
    padding = padding or "symmetric"
    if depthwise:
        return DepthwiseConv2d(
            in_channels, kernel_size, stride=strides, padding=padding,
            dilation=dilation_rate, use_bias=use_bias,
            kernel_init=FanoutInitializer(groups=in_channels),
        )
    return Conv2d(
        in_channels, filters, kernel_size, stride=strides, padding=padding,
        dilation=dilation_rate, groups=nb_groups, use_bias=use_bias,
        kernel_init=FanoutInitializer(groups=nb_groups),
    )


@dataclass
class BlockArgs:
    """Arguments for one residual block, decoded from the string DSL."""

    block_type: str
    nb_repeats: int
    nb_experts: Optional[int]
    filters: int
    force_in_channels: Optional[int]
    exp_kernel_size: Tuple[int, int]
    dw_kernel_size: Tuple[int, int]
    pw_kernel_size: Tuple[int, int]
    stride: int
    padding: Optional[str]
    dilation_rate: int
    group_size: Optional[int]
    exp_ratio: float
    pw_act: bool
    use_se: bool
    se_ratio: float
    norm_layer: Optional[str]
    act_layer: Optional[str]
    skip_connection: bool
    drop_path_rate: float

    @staticmethod
    def decode(block_string: str) -> "BlockArgs":
        """Decode e.g. ``"ir_r2_k3_s2_e1_i32_o16_se0.25_noskip"``."""
        ops = block_string.split("_")
        options = {"block_type": ops[0]}
        for op in ops[1:]:
            if op == "noskip":
                options["skip"] = False
            elif op == "skip":
                options["skip"] = True
            elif op.startswith("n"):
                act_dict = {"re": "relu", "r6": "relu6", "hs": "hard_swish",
                            "sw": "swish", "mi": "mish"}
                options["n"] = act_dict[op[1:]]
            else:
                splits = re.split(r"(\d.*)", op)
                if len(splits) >= 2:
                    key, value = splits[:2]
                    options[key] = value

        skip = False if options["block_type"] == "dsa" else options.get("skip", True)
        if options["block_type"] != "er":
            exp_kernel_size = BlockArgs._parse_ksize(options.get("a", "1"))
            dw_kernel_size = BlockArgs._parse_ksize(options.get("k"))
        else:
            exp_kernel_size = BlockArgs._parse_ksize(options.get("k"))
            dw_kernel_size = (1, 1)

        return BlockArgs(
            block_type=options["block_type"],
            nb_repeats=int(options.get("r")),
            nb_experts=int(options.get("cc", 0)) or None,
            filters=int(options.get("c")),
            force_in_channels=int(options.get("fc", 0)) or None,
            exp_kernel_size=exp_kernel_size,
            dw_kernel_size=dw_kernel_size,
            pw_kernel_size=BlockArgs._parse_ksize(options.get("p", "1")),
            stride=int(options.get("s")),
            padding=None,
            dilation_rate=1,
            group_size=int(options["gs"]) if "gs" in options else None,
            exp_ratio=float(options.get("e", 1.0)),
            pw_act=options["block_type"] == "dsa",
            use_se=True,
            se_ratio=float(options.get("se", 0.0)),
            norm_layer=None,
            act_layer=options.get("n", None),
            skip_connection=skip,
            drop_path_rate=0.0,
        )

    @staticmethod
    def _parse_ksize(ss: str) -> Tuple[int, int]:
        if ss.isdigit():
            return int(ss), int(ss)
        a, b = ss.split(".")
        return int(a), int(b)

    @property
    def nb_groups(self):
        if not self.group_size:
            return 1
        assert self.filters % self.group_size == 0
        return self.filters // self.group_size


class SqueezeExcite:
    """SE with conv_reduce/conv_expand naming and round() channel reduction."""

    def __init__(self, channels, rd_ratio=0.25, rd_channels=None,
                 act_layer="relu", gate_layer="sigmoid", force_act_layer=None):
        rd_channels = rd_channels or round(channels * rd_ratio)
        self.conv_reduce = Conv2d(channels, rd_channels, 1, use_bias=True,
                                  kernel_init=FanoutInitializer())
        self.conv_expand = Conv2d(rd_channels, channels, 1, use_bias=True,
                                  kernel_init=FanoutInitializer())
        self.act = act_layer_factory(force_act_layer or act_layer)
        self.gate = act_layer_factory(gate_layer)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"conv_reduce": self.conv_reduce.init(r1),
                "conv_expand": self.conv_expand.init(r2)}

    def __call__(self, p, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = self.act(self.conv_reduce(p["conv_reduce"], s))
        s = self.gate(self.conv_expand(p["conv_expand"], s))
        return x * s


class ConvBnAct:
    def __init__(self, cfg: BlockArgs, in_channels: int):
        norm = norm_layer_factory(cfg.norm_layer)
        self.act = act_layer_factory(cfg.act_layer)
        self.conv = create_conv2d(in_channels, cfg.filters, cfg.dw_kernel_size,
                                  strides=cfg.stride, padding=cfg.padding,
                                  dilation_rate=cfg.dilation_rate)
        self.bn1 = norm(cfg.filters)
        self.skip = (cfg.stride == 1 and cfg.filters == in_channels
                     and cfg.skip_connection)
        self.dpr = cfg.drop_path_rate
        self.out_channels = cfg.filters

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"conv": self.conv.init(r1), "bn1": self.bn1.init(r2)}

    def __call__(self, p, x):
        shortcut = x
        x = self.act(self.bn1(p["bn1"], self.conv(p["conv"], x)))
        if self.skip:
            x = drop_path(x, self.dpr) + shortcut
        return x


class DepthwiseSeparableConv:
    def __init__(self, cfg: BlockArgs, in_channels: int):
        norm = norm_layer_factory(cfg.norm_layer)
        self.act = act_layer_factory(cfg.act_layer)
        self.conv_dw = create_conv2d(in_channels, kernel_size=cfg.dw_kernel_size,
                                     strides=cfg.stride, padding=cfg.padding,
                                     dilation_rate=cfg.dilation_rate,
                                     depthwise=True)
        self.bn1 = norm(in_channels)
        self.se = (SqueezeExcite(in_channels, rd_ratio=cfg.se_ratio,
                                 act_layer=cfg.act_layer)
                   if cfg.use_se and cfg.se_ratio > 0.0 else None)
        self.conv_pw = create_conv2d(in_channels, cfg.filters,
                                     cfg.pw_kernel_size, padding=cfg.padding,
                                     nb_groups=cfg.nb_groups)
        self.bn2 = norm(cfg.filters)
        self.pw_act = cfg.pw_act
        self.skip = (cfg.stride == 1 and cfg.filters == in_channels
                     and cfg.skip_connection)
        self.dpr = cfg.drop_path_rate
        self.out_channels = cfg.filters

    def init(self, rng):
        r = jax.random.split(rng, 5)
        p = {"conv_dw": self.conv_dw.init(r[0]), "bn1": self.bn1.init(r[1]),
             "conv_pw": self.conv_pw.init(r[2]), "bn2": self.bn2.init(r[3])}
        if self.se is not None:
            p["se"] = self.se.init(r[4])
        return p

    def __call__(self, p, x):
        shortcut = x
        x = self.act(self.bn1(p["bn1"], self.conv_dw(p["conv_dw"], x)))
        if self.se is not None:
            x = self.se(p["se"], x)
        x = self.bn2(p["bn2"], self.conv_pw(p["conv_pw"], x))
        if self.pw_act:
            x = self.act(x)
        if self.skip:
            x = drop_path(x, self.dpr) + shortcut
        return x


class InvertedResidual:
    """MBConv: pointwise expand -> depthwise -> SE -> pointwise-linear."""

    def __init__(self, cfg: BlockArgs, in_channels: int):
        norm = norm_layer_factory(cfg.norm_layer)
        self.act = act_layer_factory(cfg.act_layer)
        mid = make_divisible(in_channels * cfg.exp_ratio, 8)
        self.conv_pw = create_conv2d(in_channels, mid, cfg.exp_kernel_size,
                                     padding=cfg.padding,
                                     nb_groups=cfg.nb_groups)
        self.bn1 = norm(mid)
        self.conv_dw = create_conv2d(mid, kernel_size=cfg.dw_kernel_size,
                                     strides=cfg.stride, padding=cfg.padding,
                                     dilation_rate=cfg.dilation_rate,
                                     depthwise=True)
        self.bn2 = norm(mid)
        self.se = (SqueezeExcite(mid, rd_ratio=cfg.se_ratio,
                                 act_layer=cfg.act_layer)
                   if cfg.use_se and cfg.se_ratio > 0.0 else None)
        self.conv_pwl = create_conv2d(mid, cfg.filters, cfg.pw_kernel_size,
                                      padding=cfg.padding)
        self.bn3 = norm(cfg.filters)
        self.skip = (cfg.stride == 1 and cfg.filters == in_channels
                     and cfg.skip_connection)
        self.dpr = cfg.drop_path_rate
        self.out_channels = cfg.filters

    def init(self, rng):
        r = jax.random.split(rng, 7)
        p = {"conv_pw": self.conv_pw.init(r[0]), "bn1": self.bn1.init(r[1]),
             "conv_dw": self.conv_dw.init(r[2]), "bn2": self.bn2.init(r[3]),
             "conv_pwl": self.conv_pwl.init(r[4]), "bn3": self.bn3.init(r[5])}
        if self.se is not None:
            p["se"] = self.se.init(r[6])
        return p

    def __call__(self, p, x):
        shortcut = x
        x = self.act(self.bn1(p["bn1"], self.conv_pw(p["conv_pw"], x)))
        x = self.act(self.bn2(p["bn2"], self.conv_dw(p["conv_dw"], x)))
        if self.se is not None:
            x = self.se(p["se"], x)
        x = self.bn3(p["bn3"], self.conv_pwl(p["conv_pwl"], x))
        if self.skip:
            x = drop_path(x, self.dpr) + shortcut
        return x


class EdgeResidual:
    """FusedMBConv: full conv expand (w/ stride) -> SE -> pointwise-linear."""

    def __init__(self, cfg: BlockArgs, in_channels: int):
        norm = norm_layer_factory(cfg.norm_layer)
        self.act = act_layer_factory(cfg.act_layer)
        force_in = cfg.force_in_channels or in_channels
        mid = make_divisible(force_in * cfg.exp_ratio, 8)
        self.conv_exp = create_conv2d(in_channels, mid, cfg.exp_kernel_size,
                                      strides=cfg.stride, padding=cfg.padding,
                                      nb_groups=cfg.nb_groups)
        self.bn1 = norm(mid)
        self.se = (SqueezeExcite(mid, rd_ratio=cfg.se_ratio,
                                 act_layer=cfg.act_layer)
                   if cfg.use_se and cfg.se_ratio > 0.0 else None)
        self.conv_pwl = create_conv2d(mid, cfg.filters, cfg.pw_kernel_size,
                                      padding=cfg.padding)
        self.bn2 = norm(cfg.filters)
        self.skip = (cfg.stride == 1 and cfg.filters == in_channels
                     and cfg.skip_connection)
        self.dpr = cfg.drop_path_rate
        self.out_channels = cfg.filters

    def init(self, rng):
        r = jax.random.split(rng, 5)
        p = {"conv_exp": self.conv_exp.init(r[0]), "bn1": self.bn1.init(r[1]),
             "conv_pwl": self.conv_pwl.init(r[2]), "bn2": self.bn2.init(r[3])}
        if self.se is not None:
            p["se"] = self.se.init(r[4])
        return p

    def __call__(self, p, x):
        shortcut = x
        x = self.act(self.bn1(p["bn1"], self.conv_exp(p["conv_exp"], x)))
        if self.se is not None:
            x = self.se(p["se"], x)
        x = self.bn2(p["bn2"], self.conv_pwl(p["conv_pwl"], x))
        if self.skip:
            x = drop_path(x, self.dpr) + shortcut
        return x
