"""Swin Transformer.

TPU-native re-implementation of the reference family
(tfimm/architectures/swin.py:37-679). All the window machinery — partition /
reverse reshapes, cyclic shifts (jnp.roll), shifted-window attention masks and
the relative-position-bias index — is computed from *static* shapes at model
construction (numpy), so the jitted graph contains only reshapes, rolls and
batched matmuls; XLA fuses the bias+mask adds into the attention softmax.
Param paths mirror timm (layers.N.blocks.i.attn.qkv / downsample.reduction).

Paper: Swin Transformer, https://arxiv.org/abs/2103.14030.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfimm_tpu.core import capture_feature, current_context
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.ops import (
    MLP,
    Dense,
    PatchEmbeddings,
    norm_layer_factory,
    trunc_normal,
)
from tfimm_tpu.ops.stochastic import drop_path, dropout
from tfimm_tpu.quant import any_quantized as _any_quantized
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["SwinTransformer", "SwinTransformerConfig", "window_partition",
           "window_reverse"]


@dataclass
class SwinTransformerConfig(ModelConfig):
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)
    patch_size: int = 4
    embed_dim: int = 96
    nb_blocks: Tuple = (2, 2, 6, 2)
    nb_heads: Tuple = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    norm_layer: str = "layer_norm"
    act_layer: str = "gelu"
    patch_norm: bool = True
    interpolate_input: bool = False
    crop_pct: float = 0.9
    interpolation: str = "bicubic"
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    first_conv: str = "patch_embed.proj"
    classifier: str = "head"

    @property
    def patch_resolution(self):
        return (self.input_size[0] // self.patch_size,
                self.input_size[1] // self.patch_size)

    @property
    def nb_patches(self):
        return self.patch_resolution[0] * self.patch_resolution[1]


def window_partition(x, window_size: int):
    """(B, H, W, C) -> (B * nb_windows, ws, ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window_size, window_size, w // window_size,
                  window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window_size, window_size, c)


def window_reverse(windows, window_size: int, h: int, w: int):
    """(B * nb_windows, ws, ws, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    x = windows.reshape(-1, h // window_size, w // window_size, window_size,
                        window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


def _relative_position_index(window_size: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window_size),
                                  np.arange(window_size), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1).astype(np.int32)  # (ws^2, ws^2)


def _attention_mask(input_size, window_size, shift_size) -> np.ndarray:
    """Mask distinguishing the 9 shifted regions; 0 within-region, -100 across."""
    h, w = input_size
    img_mask = np.zeros((1, h, w, 1), dtype=np.float32)
    slices = (slice(0, -window_size), slice(-window_size, -shift_size),
              slice(-shift_size, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    # Pure-numpy window partition (construction-time; keeps model building
    # off-device).
    mw = img_mask.reshape(1, h // window_size, window_size,
                          w // window_size, window_size, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5)
    mask_windows = mw.reshape(-1, window_size ** 2)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention:
    """Window MHA with learned relative-position bias."""

    def __init__(self, cfg, embed_dim, nb_heads, window_size):
        self.nb_heads = nb_heads
        self.head_dim = embed_dim // nb_heads
        self.scale = self.head_dim ** -0.5
        self.window_size = window_size
        self.attn_drop_rate = cfg.attn_drop_rate
        self.proj_drop_rate = cfg.drop_rate
        kinit = trunc_normal(0.02)
        self.qkv = Dense(embed_dim, embed_dim * 3, use_bias=cfg.qkv_bias,
                         kernel_init=kinit)
        self.proj = Dense(embed_dim, embed_dim, kernel_init=kinit)
        self.rel_pos_index = _relative_position_index(window_size)  # static

    def init(self, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        ws = self.window_size
        return {
            "qkv": self.qkv.init(r1),
            "proj": self.proj.init(r2),
            "relative_position_bias_table": trunc_normal(0.02)(
                r3, ((2 * ws - 1) * (2 * ws - 1), self.nb_heads)
            ),
        }

    def __call__(self, p, x, mask=None):
        bw, n, c = x.shape  # (B*nw, ws^2, C)
        h, hd = self.nb_heads, self.head_dim

        ctx = current_context()
        if (os.environ.get("TFIMM_TPU_NO_FLASH", "0") != "1"
                and (jax.default_backend() == "tpu"
                     or os.environ.get("TFIMM_TPU_PALLAS_INTERPRET") == "1")
                and "kernel_q" not in p["qkv"]  # int8 params -> XLA path
                and not (ctx.training and self.attn_drop_rate > 0.0)):
            # Fused windowed-attention kernel: bias and shift mask are added
            # to the scores in VMEM, heads contract at full lane width
            # (tfimm_tpu/ops/pallas/window_mha.py). q/k/v are produced by
            # three sliced matmuls instead of the packed qkv so the kernel
            # operands need no re-layout copies. Differentiable (custom VJP
            # incl. the bias-table gradient); unused ops are DCE'd when the
            # dispatcher declines.
            from tfimm_tpu.ops.pallas.window_mha import window_mha_or_none

            wk = p["qkv"]["kernel"].astype(x.dtype)
            bk = p["qkv"].get("bias")
            parts = []
            for i in range(3):
                t = jnp.dot(x, wk[:, i * c:(i + 1) * c])
                if bk is not None:
                    t = t + bk[i * c:(i + 1) * c].astype(x.dtype)
                parts.append(t)
            bias = p["relative_position_bias_table"][
                self.rel_pos_index.reshape(-1)
            ].reshape(n, n, h).transpose(2, 0, 1)
            out = window_mha_or_none(parts[0], parts[1], parts[2], bias,
                                     mask, nb_heads=h, scale=self.scale)
            if out is not None:
                out = self.proj(p["proj"], out)
                return dropout(out, self.proj_drop_rate)

        qkv = self.qkv(p["qkv"], x).reshape(bw, n, 3, h, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        scale = jnp.asarray(self.scale, q.dtype)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        bias = p["relative_position_bias_table"][
            self.rel_pos_index.reshape(-1)
        ].reshape(n, n, h)
        attn = attn + bias.transpose(2, 0, 1).astype(attn.dtype)[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, h, n, n) + mask[None, :, None].astype(
                attn.dtype)
            attn = attn.reshape(-1, h, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = dropout(attn, self.attn_drop_rate)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        out = self.proj(p["proj"], out)
        return dropout(out, self.proj_drop_rate)


class SwinTransformerBlock:
    def __init__(self, cfg, input_size, embed_dim, nb_heads, drop_path_rate,
                 shift_size):
        self.input_size = input_size
        self.shift_size = shift_size
        self.window_size = cfg.window_size
        if min(input_size) <= self.window_size:
            self.shift_size = 0
            self.window_size = min(input_size)
        norm = norm_layer_factory(cfg.norm_layer)
        self.norm1 = norm(embed_dim)
        self.attn = WindowAttention(cfg, embed_dim, nb_heads, self.window_size)
        self.norm2 = norm(embed_dim)
        # The fused whole-block kernel hard-codes standard LayerNorm
        # (scale/bias, eps 1e-5) and the gelu policy; any other configured
        # norm/activation must decline the kernel, not silently drift.
        self.fused_block_ok = (cfg.norm_layer == "layer_norm"
                               and cfg.act_layer == "gelu")
        self.mlp = MLP(embed_dim, int(embed_dim * cfg.mlp_ratio),
                       act_layer=cfg.act_layer, drop_rate=cfg.drop_rate,
                       kernel_init=trunc_normal(0.02))
        self.dpr = drop_path_rate
        # Static shifted-window mask (reference stores it as a non-trainable
        # Variable, swin.py:246-289; here it's a trace-time constant).
        self.attn_mask = (
            jnp.asarray(_attention_mask(input_size, self.window_size,
                                        self.shift_size))
            if self.shift_size > 0 else None
        )

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"norm1": self.norm1.init(r[0]), "attn": self.attn.init(r[1]),
                "norm2": self.norm2.init(r[2]), "mlp": self.mlp.init(r[3])}

    def _rel_bias(self, p):
        ws = self.window_size
        return p["attn"]["relative_position_bias_table"][
            self.attn.rel_pos_index.reshape(-1)
        ].reshape(ws * ws, ws * ws, self.attn.nb_heads).transpose(2, 0, 1)

    def padded_kernel(self, p, wins_padded):
        """Fused kernel on the padded single-gather window layout (see
        ops/window_gather.py; called from the stage's window-resident
        path). Returns None when the kernel dispatcher declines."""
        from tfimm_tpu.ops.pallas.swin_block import swin_block_padded_or_none

        # Gate on EVERY param dict the fused kernel reads raw (qkv, proj,
        # fc1, fc2 — ops/pallas/swin_block.py _prep_params), not just qkv:
        # a custom quantize_int8 skip list can quantize any subset.
        if not self.fused_block_ok or _any_quantized(
                p["attn"]["qkv"], p["attn"]["proj"],
                p["mlp"]["fc1"], p["mlp"]["fc2"]):
            return None
        return swin_block_padded_or_none(
            p, wins_padded, self._rel_bias(p), self.attn_mask,
            nb_heads=self.attn.nb_heads, scale=self.attn.scale,
            n_real=self.window_size ** 2)

    def __call__(self, p, x):
        h, w = self.input_size
        b, l, c = x.shape
        ws, ss = self.window_size, self.shift_size

        # Fused whole-block kernel (inference): LN1 -> windowed MHA -> +res
        # -> LN2 -> MLP -> +res with every intermediate VMEM-resident — the
        # early stages are HBM-bound (see ops/pallas/swin_block.py). LN and
        # the residuals are per-token, so the whole block commutes with the
        # roll/partition layout; only the roll/partition/reverse transposes
        # stay in XLA. Training uses the unfused path below.
        if (os.environ.get("TFIMM_TPU_NO_FLASH", "0") != "1"
                and os.environ.get("TFIMM_TPU_NO_FUSED_BLOCK", "0") != "1"
                and not current_context().training
                and self.fused_block_ok
                # int8 -> XLA path; check every dict the kernel reads raw
                and not _any_quantized(p["attn"]["qkv"], p["attn"]["proj"],
                                       p["mlp"]["fc1"], p["mlp"]["fc2"])
                and h % ws == 0 and w % ws == 0):
            from tfimm_tpu.ops.pallas.swin_block import swin_block_or_none

            xg = x.reshape(b, h, w, c)
            if ss > 0:
                xg = jnp.roll(xg, shift=(-ss, -ss), axis=(1, 2))
            wins = window_partition(xg, ws).reshape(-1, ws * ws, c)
            out = swin_block_or_none(p, wins, self._rel_bias(p),
                                     self.attn_mask,
                                     nb_heads=self.attn.nb_heads,
                                     scale=self.attn.scale)
            if out is not None:
                out = window_reverse(out.reshape(-1, ws, ws, c), ws, h, w)
                if ss > 0:
                    out = jnp.roll(out, shift=(ss, ss), axis=(1, 2))
                return out.reshape(b, h * w, c)

        shortcut = x
        x = self.norm1(p["norm1"], x).reshape(b, h, w, c)
        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
        windows = window_partition(x, ws).reshape(-1, ws * ws, c)
        attn_out = self.attn(p["attn"], windows, mask=self.attn_mask)
        attn_out = attn_out.reshape(-1, ws, ws, c)
        x = window_reverse(attn_out, ws, h, w)
        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        x = x.reshape(b, h * w, c)
        x = shortcut + drop_path(x, self.dpr)

        y = self.mlp(p["mlp"], self.norm2(p["norm2"], x))
        return x + drop_path(y, self.dpr)


class PatchMerging:
    def __init__(self, cfg, input_size, embed_dim):
        self.input_size = input_size
        norm = norm_layer_factory(cfg.norm_layer)
        self.norm = norm(4 * embed_dim)
        self.reduction = Dense(4 * embed_dim, 2 * embed_dim, use_bias=False,
                               kernel_init=trunc_normal(0.02))

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        return {"norm": self.norm.init(r1), "reduction": self.reduction.init(r2)}

    def __call__(self, p, x):
        h, w = self.input_size
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
             x[:, 1::2, 1::2]], axis=-1,
        )
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = self.norm(p["norm"], x)
        return self.reduction(p["reduction"], x)


class SwinTransformerStage:
    def __init__(self, cfg, input_size, embed_dim, nb_blocks, nb_heads,
                 drop_path_rates, downsample):
        self.blocks = [
            SwinTransformerBlock(
                cfg, input_size, embed_dim, nb_heads, drop_path_rates[i],
                shift_size=0 if i % 2 == 0 else cfg.window_size // 2,
            )
            for i in range(nb_blocks)
        ]
        self.downsample = (PatchMerging(cfg, input_size, embed_dim)
                           if downsample else None)

    def init(self, rng):
        p = {"blocks": {str(i): blk.init(jax.random.fold_in(rng, i))
                        for i, blk in enumerate(self.blocks)}}
        if self.downsample is not None:
            p["downsample"] = self.downsample.init(jax.random.fold_in(rng, 999))
        return p

    def _resident_applies(self, p, x):
        """Static predicate: every block qualifies for the fused padded
        kernel at this geometry, so :meth:`_window_resident` will succeed."""
        from tfimm_tpu.ops.pallas.swin_block import padded_block_applies
        from tfimm_tpu.ops.window_gather import padded_rows

        if not self.blocks:
            return False
        b, l, c = x.shape
        blk0 = self.blocks[0]
        h, w = blk0.input_size
        ws = blk0.window_size
        if h % ws or w % ws:
            return False
        nb_windows = (h // ws) * (w // ws)
        n_pad = padded_rows(ws * ws)
        for i, blk in enumerate(self.blocks):
            if blk.window_size != ws or not blk.fused_block_ok:
                return False
            bp = p["blocks"][str(i)]
            if _any_quantized(bp["attn"]["qkv"], bp["attn"]["proj"],
                              bp["mlp"]["fc1"], bp["mlp"]["fc2"]):
                return False  # int8-quantized params -> XLA path
            has_mask = blk.attn_mask is not None
            nb_win = nb_windows if has_mask else 1
            hidden = bp["mlp"]["fc1"]["kernel"].shape[1]
            if not padded_block_applies(b * nb_windows, n_pad, c,
                                        blk.attn.nb_heads, nb_win, has_mask,
                                        hidden, x.dtype):
                return False
        return True

    def _window_resident(self, p, x):
        """Run every block fused while the activation stays in the padded
        window layout, with ONE static gather per block boundary.

        The XLA path pays roll + 6D partition transpose + pad going in and
        the mirror chain coming out of EVERY block — several full-map HBM
        passes of pure token permutation (~0.55 ms/block at Swin-T stage 1,
        scripts/perf/exp_swin_budget.py). Since everything but attention is
        per-token, each chain is one static permutation: this path enters
        the padded window layout once, hops between consecutive blocks'
        layouts with a single composed re-window gather
        (ops/window_gather.py repack_indices — un-window at shift s_i +
        re-window at shift s_{i+1} fused), and leaves once. Callers must
        check :meth:`_resident_applies` first.
        """
        from tfimm_tpu.ops.window_gather import (pack_windows, padded_rows,
                                                 repack_windows,
                                                 unpack_windows)

        b, l, c = x.shape
        blk0 = self.blocks[0]
        h, w = blk0.input_size
        ws = blk0.window_size
        nb_windows = (h // ws) * (w // ws)
        n_pad = padded_rows(ws * ws)
        wins = pack_windows(x, h, w, ws, blk0.shift_size)
        wins = wins.reshape(b * nb_windows, n_pad, c)
        for i, blk in enumerate(self.blocks):
            out = blk.padded_kernel(p["blocks"][str(i)], wins)
            assert out is not None, "predicate out of sync with kernel gate"
            flat = out.reshape(b, nb_windows * n_pad, c)
            nxt = self.blocks[i + 1] if i + 1 < len(self.blocks) else None
            if nxt is not None:
                wins = repack_windows(flat, h, w, ws, blk.shift_size,
                                      nxt.shift_size)
                wins = wins.reshape(b * nb_windows, n_pad, c)
            else:
                return unpack_windows(flat, h, w, ws, blk.shift_size)

    def _blocks_sequential(self, p, x):
        """Plain per-block composition (no feature capture) — the
        gradient-workload twin of :meth:`_window_resident`."""
        for i, blk in enumerate(self.blocks):
            x = blk(p["blocks"][str(i)], x)
        return x

    def _window_resident_diff(self, p, x):
        """Window-resident stage for the primal, per-block composition for
        gradients. Under AD the fused kernels already swap to their unfused
        twins (swin_block_diff), so the gather path's +18% does not apply
        there — and the boundary gathers, unlike the per-block transposes,
        cannot fuse into the twins' elementwise ops, which measured a net
        backprop loss (swin_tiny 1225 -> ~1163 img/s) whether the gather
        VJP ran as an inverse gather or the structured chain. This wrapper
        mirrors the swin_block_diff pattern one level up: grad workloads
        re-run the per-block composition for BOTH primal and backward, so
        backprop is exactly the per-block path while inference keeps the
        single-gather layout."""
        if not self._resident_applies(p, x):
            return None

        @jax.custom_vjp
        def stage_fast(p, x):
            return self._window_resident(p, x)

        def fwd_fn(p, x):
            primal, vjp = jax.vjp(self._blocks_sequential, p, x)
            return primal, vjp

        def bwd_fn(vjp, g):
            return vjp(g)

        stage_fast.defvjp(fwd_fn, bwd_fn)
        return stage_fast(p, x)

    def __call__(self, p, x, stage_idx):
        ctx = current_context()
        if (os.environ.get("TFIMM_TPU_NO_FLASH", "0") != "1"
                and os.environ.get("TFIMM_TPU_NO_FUSED_BLOCK", "0") != "1"
                and os.environ.get("TFIMM_TPU_SWIN_GATHER", "1") != "0"
                and not ctx.training and not ctx.capture_features
                and self.blocks):
            out = self._window_resident_diff(p, x)
            if out is not None:
                from tfimm_tpu.ops.pallas.dispatch import log_dispatch

                log_dispatch("swin_window_resident_stage")
                if self.downsample is not None:
                    return self.downsample(p["downsample"], out)
                return out
        for i, blk in enumerate(self.blocks):
            x = blk(p["blocks"][str(i)], x)
            capture_feature(f"stage_{stage_idx}/block_{i}", x)
        if self.downsample is not None:
            x = self.downsample(p["downsample"], x)
        capture_feature(f"stage_{stage_idx}/features", x)
        return x


class SwinTransformer(Model):
    cfg_class = SwinTransformerConfig

    def __init__(self, cfg: SwinTransformerConfig, params=None):
        super().__init__(cfg, params)
        norm = norm_layer_factory(cfg.norm_layer)
        self.patch_embed = PatchEmbeddings(
            cfg.patch_size, cfg.embed_dim, in_channels=cfg.in_channels,
            norm_layer=(norm_layer_factory(cfg.norm_layer) if cfg.patch_norm
                        else None),
        )
        dpr = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.nb_blocks))
        nb_stages = len(cfg.nb_blocks)
        self.stages = []
        start = 0
        for idx in range(nb_stages):
            self.stages.append(SwinTransformerStage(
                cfg,
                input_size=(cfg.patch_resolution[0] // (2 ** idx),
                            cfg.patch_resolution[1] // (2 ** idx)),
                embed_dim=int(cfg.embed_dim * 2 ** idx),
                nb_blocks=cfg.nb_blocks[idx],
                nb_heads=cfg.nb_heads[idx],
                drop_path_rates=dpr[start:start + cfg.nb_blocks[idx]],
                downsample=idx < nb_stages - 1,
            ))
            start += cfg.nb_blocks[idx]
        self.nb_features = int(cfg.embed_dim * 2 ** (nb_stages - 1))
        self.norm = norm(self.nb_features)
        self.head = (Dense(self.nb_features, cfg.nb_classes)
                     if cfg.nb_classes > 0 else None)

    def init_params(self, rng):
        r = jax.random.split(rng, 4)
        p = {"patch_embed": self.patch_embed.init(r[0]),
             "layers": {str(j): stage.init(jax.random.fold_in(r[1], j))
                        for j, stage in enumerate(self.stages)},
             "norm": self.norm.init(r[2])}
        if self.head is not None:
            p["head"] = self.head.init(r[3])
        return p

    def forward_features(self, params, x):
        x, _ = self.patch_embed(params["patch_embed"], x)
        x = dropout(x, self.cfg.drop_rate)
        capture_feature("patch_embedding", x)
        for j, stage in enumerate(self.stages):
            x = stage(params["layers"][str(j)], x, j)
        x = self.norm(params["norm"], x)
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
        names = ["patch_embedding"]
        for j, n in enumerate(self.cfg.nb_blocks):
            names += [f"stage_{j}/block_{i}" for i in range(n)]
            names.append(f"stage_{j}/features")
        return tuple(names + ["features_all", "features", "logits"])


def _register(name, **kwargs):
    def fn():
        return SwinTransformer, SwinTransformerConfig(name=name, url="[timm]",
                                                      **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_register("swin_tiny_patch4_window7_224", patch_size=4, embed_dim=96,
          nb_blocks=(2, 2, 6, 2), nb_heads=(3, 6, 12, 24), window_size=7)
_register("swin_small_patch4_window7_224", patch_size=4, embed_dim=96,
          nb_blocks=(2, 2, 18, 2), nb_heads=(3, 6, 12, 24), window_size=7)
_register("swin_base_patch4_window7_224", patch_size=4, embed_dim=128,
          nb_blocks=(2, 2, 18, 2), nb_heads=(4, 8, 16, 32), window_size=7)
_register("swin_base_patch4_window12_384", input_size=(384, 384), patch_size=4,
          embed_dim=128, nb_blocks=(2, 2, 18, 2), nb_heads=(4, 8, 16, 32),
          window_size=12, crop_pct=1.0)
_register("swin_base_patch4_window7_224_in22k", nb_classes=21841, patch_size=4,
          embed_dim=128, nb_blocks=(2, 2, 18, 2), nb_heads=(4, 8, 16, 32),
          window_size=7)
_register("swin_base_patch4_window12_384_in22k", nb_classes=21841,
          input_size=(384, 384), patch_size=4, embed_dim=128,
          nb_blocks=(2, 2, 18, 2), nb_heads=(4, 8, 16, 32), window_size=12,
          crop_pct=1.0)
_register("swin_large_patch4_window7_224", patch_size=4, embed_dim=192,
          nb_blocks=(2, 2, 18, 2), nb_heads=(6, 12, 24, 48), window_size=7)
_register("swin_large_patch4_window12_384", input_size=(384, 384),
          patch_size=4, embed_dim=192, nb_blocks=(2, 2, 18, 2),
          nb_heads=(6, 12, 24, 48), window_size=12, crop_pct=1.0)
_register("swin_large_patch4_window7_224_in22k", nb_classes=21841,
          patch_size=4, embed_dim=192, nb_blocks=(2, 2, 18, 2),
          nb_heads=(6, 12, 24, 48), window_size=7)
_register("swin_large_patch4_window12_384_in22k", nb_classes=21841,
          input_size=(384, 384), patch_size=4, embed_dim=192,
          nb_blocks=(2, 2, 18, 2), nb_heads=(6, 12, 24, 48), window_size=12,
          crop_pct=1.0)
