"""SAM image encoder (ViT-Det style).

TPU-native re-implementation of the reference
(segment_anything/image_encoder.py:11-460): windowed attention blocks with a
few global-attention blocks, decomposed relative position embeddings (MViTv2),
and a conv neck. Everything runs on static shapes under jit — window padding
sizes and rel-pos index gathers are computed at trace time from Python ints,
removing the reference's tf.cond/dynamic-shape machinery.

Papers: SAM https://arxiv.org/abs/2304.02643, ViT-Det 2203.16527,
MViTv2 2112.01526.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfimm_tpu.architectures.segment_anything.common import MLPBlock
from tfimm_tpu.core import capture_feature
from tfimm_tpu.ops import Conv2d, Dense, PatchEmbeddings, norm_layer_factory
from tfimm_tpu.ops.stochastic import drop_path, dropout

__all__ = ["ImageEncoder", "window_partition", "window_unpartition",
           "get_rel_pos", "add_decomposed_rel_pos"]


def window_partition(x, window_size: int):
    """Pad (B, H, W, C) to window multiples and split into windows.
    Returns (B*nw, ws, ws, C) and padded (Hp, Wp)."""
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size,
                  window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window_size, window_size, c), (hp, wp)


def window_unpartition(windows, window_size: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    c = windows.shape[-1]
    b = windows.shape[0] // ((hp // window_size) * (wp // window_size))
    x = windows.reshape(b, hp // window_size, wp // window_size, window_size,
                        window_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if hp > h or wp > w:
        x = x[:, :h, :w]
    return x


def get_rel_pos(q_size: int, k_size: int, rel_pos, interpolate_pos: bool):
    """Relative positional embeddings for given query/key sizes: (q, k, C)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if interpolate_pos and rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32), (max_rel_dist, rel_pos.shape[1]),
            method="bilinear",
        )
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(relative.astype(np.int32))]


def add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_size, k_size,
                           interpolate_pos):
    """Add decomposed rel-pos (MViTv2) to the attention map.
    attn: (B*, qh*qw, kh*kw), q: (B*, qh*qw, C)."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    n, _, c = q.shape
    r_h = get_rel_pos(q_h, k_h, rel_pos_h, interpolate_pos)
    r_w = get_rel_pos(q_w, k_w, rel_pos_w, interpolate_pos)
    q_grid = q.reshape(n, q_h, q_w, c)
    rel_h = jnp.einsum("nhwc,hkc->nhwk", q_grid, r_h.astype(q.dtype))
    rel_w = jnp.einsum("nhwc,wkc->nhwk", q_grid, r_w.astype(q.dtype))
    attn = attn.reshape(n, q_h, q_w, k_h, k_w)
    attn = attn + (rel_h[..., :, None] + rel_w[..., None, :]).astype(attn.dtype)
    return attn.reshape(n, q_h * q_w, k_h * k_w)


class RelPosAttention:
    """MHA over a (B, H, W, C) grid with decomposed rel-pos embeddings."""

    def __init__(self, fixed_input_size, embed_dim, nb_heads, qkv_bias,
                 use_rel_pos, drop_rate, attn_drop_rate, rel_pos_size):
        self.fixed_input_size = fixed_input_size
        self.nb_heads = nb_heads
        self.head_dim = embed_dim // nb_heads
        self.scale = self.head_dim ** -0.5
        self.use_rel_pos = use_rel_pos
        self.drop_rate = drop_rate
        self.attn_drop_rate = attn_drop_rate
        self.rel_pos_size = rel_pos_size  # (H, W) of the attention grid
        self.qkv = Dense(embed_dim, embed_dim * 3, use_bias=qkv_bias)
        self.proj = Dense(embed_dim, embed_dim)

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        p = {"qkv": self.qkv.init(r1), "proj": self.proj.init(r2)}
        if self.use_rel_pos:
            h, w = self.rel_pos_size
            p["rel_pos_h"] = jnp.zeros((2 * h - 1, self.head_dim))
            p["rel_pos_w"] = jnp.zeros((2 * w - 1, self.head_dim))
        return p

    def _use_flash_kernel(self, h, w):
        import os

        from tfimm_tpu.ops.pallas.dispatch import interpret_forced, on_tpu

        if os.environ.get("TFIMM_TPU_NO_FLASH", "0") == "1":
            return False
        if not (on_tpu() or interpret_forced()) or not self.use_rel_pos:
            return False
        # Global attention at SAM scale (>= 1024 tokens): the XLA path
        # materializes (heads, N, N) scores + bias — the fused kernel keeps
        # everything in VMEM, streaming K in 512-wide blocks that must cover
        # whole key-grid rows.
        if h * w >= 1024:
            return (h * w) % 512 == 0 and 512 % w == 0
        # Windowed blocks (N = window² = 196 for SAM ViT): a single
        # block_q = block_k = N program per (window, head) row. Measured
        # (scripts/perf/exp_sam_window.py, slope timing): kernel 0.225 ms vs
        # XLA 0.315 ms forward (1.40x). Training measured NEGATIVE twice:
        # the round-2 streaming backward lost 2.5x at this size, and the
        # round-3 single-pass fused backward (_bwd_fused_kernel, score
        # matrix VMEM-resident) narrowed that to ~1.33x fwd+bwd but still
        # loses — XLA autodiff batches 300 windows' small matmuls with
        # better overlap than a one-program-per-row grid. The windowed
        # kernel therefore still serves inference only.
        from tfimm_tpu.core import is_training

        return h * w >= 128 and not is_training()

    def __call__(self, p, x):
        n, h, w, c = x.shape
        qkv = self.qkv(p["qkv"], x)
        qkv = qkv.reshape(n, h * w, 3, self.nb_heads, self.head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, n * self.nb_heads,
                                                   h * w, self.head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # Differentiable: the rel-pos kernel has a custom VJP (Pallas
        # backward kernels incl. rel-term gradients), so SAM fine-tuning
        # takes the kernel path too on the global (N >= 1024) blocks; the
        # windowed blocks use it for inference only (see _use_flash_kernel).
        if self._use_flash_kernel(h, w):
            from tfimm_tpu.ops.pallas.flash_attention_relpos import (
                flash_attention_relpos,
            )

            r_h = get_rel_pos(h, h, p["rel_pos_h"],
                              not self.fixed_input_size)
            r_w = get_rel_pos(w, w, p["rel_pos_w"],
                              not self.fixed_input_size)
            qg = q.reshape(-1, h, w, self.head_dim)
            rh_term = jnp.einsum("bhwc,hkc->bhwk", qg,
                                 r_h.astype(q.dtype)).reshape(-1, h * w, h)
            rw_term = jnp.einsum("bhwc,wkc->bhwk", qg,
                                 r_w.astype(q.dtype)).reshape(-1, h * w, w)
            from tfimm_tpu.ops.pallas.dispatch import interpret_forced

            n_tok = h * w
            block = 512 if n_tok % 512 == 0 else n_tok
            out = flash_attention_relpos(q, k, v, rh_term, rw_term,
                                         grid_size=(h, w), scale=self.scale,
                                         block_q=block, block_k=block,
                                         interpret=interpret_forced())
        else:
            # Scores stored in compute dtype; softmax math in f32 (see
            # ops/attention.py for rationale/measurements).
            scale = jnp.asarray(self.scale, q.dtype)
            attn = jnp.einsum("bqd,bkd->bqk", q * scale, k)
            if self.use_rel_pos:
                attn = add_decomposed_rel_pos(
                    attn, q, p["rel_pos_h"], p["rel_pos_w"], (h, w), (h, w),
                    interpolate_pos=not self.fixed_input_size,
                )
            attn = jax.nn.softmax(attn.astype(jnp.float32),
                                  axis=-1).astype(x.dtype)
            attn = dropout(attn, self.attn_drop_rate)
            out = jnp.einsum("bqk,bkd->bqd", attn, v)

        out = out.reshape(n, self.nb_heads, h, w, self.head_dim)
        out = out.transpose(0, 2, 3, 1, 4).reshape(n, h, w, c)
        out = self.proj(p["proj"], out)
        return dropout(out, self.drop_rate)


class ImageEncoderBlock:
    def __init__(self, fixed_input_size, embed_dim, nb_heads, mlp_ratio,
                 qkv_bias, norm_layer, act_layer, use_rel_pos, window_size,
                 grid_size, drop_rate, attn_drop_rate, drop_path_rate):
        norm = norm_layer_factory(norm_layer)
        self.window_size = window_size
        rel_size = ((window_size, window_size) if window_size > 0
                    else grid_size)
        self.norm1 = norm(embed_dim)
        self.attn = RelPosAttention(fixed_input_size, embed_dim, nb_heads,
                                    qkv_bias, use_rel_pos, drop_rate,
                                    attn_drop_rate, rel_size)
        self.norm2 = norm(embed_dim)
        self.mlp = MLPBlock(embed_dim, int(embed_dim * mlp_ratio), act_layer,
                            drop_rate)
        self.dpr = drop_path_rate

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"norm1": self.norm1.init(r[0]), "attn": self.attn.init(r[1]),
                "norm2": self.norm2.init(r[2]), "mlp": self.mlp.init(r[3])}

    def __call__(self, p, x):
        shortcut = x
        x = self.norm1(p["norm1"], x)
        if self.window_size > 0:
            hw = (x.shape[1], x.shape[2])
            x, pad_hw = window_partition(x, self.window_size)
        x = self.attn(p["attn"], x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        x = shortcut + drop_path(x, self.dpr)
        y = self.mlp(p["mlp"], self.norm2(p["norm2"], x))
        return x + drop_path(y, self.dpr)


class ImageEncoder:
    def __init__(self, input_size=(1024, 1024), fixed_input_size=True,
                 patch_size=16, in_channels=3, embed_dim=768, nb_blocks=12,
                 nb_heads=12, mlp_ratio=4.0, out_channels=256, qkv_bias=True,
                 norm_layer="layer_norm", act_layer="gelu", use_abs_pos=True,
                 use_rel_pos=False, global_attn_indices=(), window_size=0,
                 drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0):
        self.input_size = input_size
        self.patch_size = patch_size
        self.embed_dim = embed_dim
        self.use_abs_pos = use_abs_pos
        self.fixed_input_size = fixed_input_size
        self.patch_embed = PatchEmbeddings(patch_size, embed_dim,
                                           in_channels=in_channels,
                                           flatten=False)
        self.blocks = [
            ImageEncoderBlock(
                fixed_input_size, embed_dim, nb_heads, mlp_ratio, qkv_bias,
                norm_layer, act_layer, use_rel_pos,
                window_size=window_size if j not in global_attn_indices else 0,
                grid_size=self.grid_size, drop_rate=drop_rate,
                attn_drop_rate=attn_drop_rate, drop_path_rate=drop_path_rate,
            )
            for j in range(nb_blocks)
        ]
        neck_norm = norm_layer_factory("layer_norm_eps_1e-6")
        self.neck_conv1 = Conv2d(embed_dim, out_channels, 1, use_bias=False,
                                 padding="valid")
        self.neck_norm1 = neck_norm(out_channels)
        self.neck_conv2 = Conv2d(out_channels, out_channels, 3, padding=1,
                                 use_bias=False)
        self.neck_norm2 = neck_norm(out_channels)

    @property
    def grid_size(self) -> Tuple[int, int]:
        return (self.input_size[0] // self.patch_size,
                self.input_size[1] // self.patch_size)

    def init(self, rng):
        r = jax.random.split(rng, 7)
        p = {"patch_embed": self.patch_embed.init(r[0])}
        if self.use_abs_pos:
            p["pos_embed"] = jnp.zeros((1, *self.grid_size, self.embed_dim))
        p["blocks"] = {str(j): blk.init(jax.random.fold_in(r[1], j))
                       for j, blk in enumerate(self.blocks)}
        p["neck"] = {"0": self.neck_conv1.init(r[2]),
                     "1": self.neck_norm1.init(r[3]),
                     "2": self.neck_conv2.init(r[4]),
                     "3": self.neck_norm2.init(r[5])}
        return p

    def __call__(self, p, x):
        x, _ = self.patch_embed(p["patch_embed"], x)  # (B, H'', W'', C)
        if self.use_abs_pos:
            pos_embed = p["pos_embed"]
            if pos_embed.shape[1:3] != x.shape[1:3]:
                pos_embed = jax.image.resize(
                    pos_embed.astype(jnp.float32),
                    (1, x.shape[1], x.shape[2], pos_embed.shape[-1]),
                    method="bilinear",
                )
            x = x + pos_embed.astype(x.dtype)
        capture_feature("patch_embedding", x)
        for j, blk in enumerate(self.blocks):
            x = blk(p["blocks"][str(j)], x)
            capture_feature(f"block_{j}", x)
        x = self.neck_norm1(p["neck"]["1"], self.neck_conv1(p["neck"]["0"], x))
        x = self.neck_norm2(p["neck"]["3"], self.neck_conv2(p["neck"]["2"], x))
        capture_feature("neck", x)
        return x
