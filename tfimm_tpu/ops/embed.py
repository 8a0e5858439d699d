"""Patch embedding and position-embedding interpolation
(reference: tfimm/layers/transformers.py:13-173)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tfimm_tpu.ops.basic import trunc_normal
from tfimm_tpu.ops.conv import Conv2d
from tfimm_tpu.ops.norm import Identity
from tfimm_tpu.utils.etc import to_2tuple

__all__ = ["PatchEmbeddings", "interpolate_pos_embeddings",
           "interpolate_pos_embeddings_grid"]


class PatchEmbeddings:
    """Conv patchify: (B, H, W, C) -> (B, N, D) tokens + grid shape.

    Supports overlapping patches via explicit stride/padding (PVTv2) and an
    optional post-projection norm (Swin / PVT).
    """

    def __init__(self, patch_size, embed_dim, in_channels=3, stride=None,
                 padding="valid", norm_layer=None, flatten=True,
                 use_bias=True, kernel_init=None):
        self.patch_size = to_2tuple(patch_size)
        self.stride = to_2tuple(stride) if stride is not None else self.patch_size
        self.embed_dim = embed_dim
        self.flatten = flatten
        self.proj = Conv2d(
            in_channels, embed_dim, self.patch_size, stride=self.stride,
            padding=padding, use_bias=use_bias,
            kernel_init=kernel_init or trunc_normal(0.02),
        )
        self.norm = norm_layer(embed_dim) if norm_layer else Identity()

    def init(self, rng):
        r1, r2 = jax.random.split(rng)
        p = {"proj": self.proj.init(r1)}
        norm_p = self.norm.init(r2)
        if norm_p:
            p["norm"] = norm_p
        return p

    def __call__(self, p, x) -> Tuple[jax.Array, Tuple[int, int]]:
        x = self.proj(p["proj"], x)
        grid = (x.shape[1], x.shape[2])
        if self.flatten:
            x = x.reshape(x.shape[0], grid[0] * grid[1], x.shape[-1])
        x = self.norm(p.get("norm", {}), x)
        return x, grid


def interpolate_pos_embeddings_grid(pos_embed, src_grid, dst_grid):
    """Bicubic resize of a (1, H*W, D) or (H, W, D) grid of position embeddings
    (reference: tfimm/layers/transformers.py:50-76)."""
    d = pos_embed.shape[-1]
    grid = jnp.reshape(pos_embed, (src_grid[0], src_grid[1], d)).astype(jnp.float32)
    grid = jax.image.resize(grid, (dst_grid[0], dst_grid[1], d), method="bicubic")
    return grid.reshape(1, dst_grid[0] * dst_grid[1], d).astype(pos_embed.dtype)


def interpolate_pos_embeddings(pos_embed, src_grid, dst_grid, nb_tokens: int = 1):
    """Interpolate token-layout pos embeddings (1, nb_tokens + H*W, D), keeping
    the leading class/dist tokens fixed (reference: transformers.py:13-47)."""
    pos_embed = jnp.asarray(pos_embed)
    tokens = pos_embed[:, :nb_tokens]
    grid_part = pos_embed[:, nb_tokens:]
    grid_part = interpolate_pos_embeddings_grid(grid_part, src_grid, dst_grid)
    return jnp.concatenate([tokens, grid_part], axis=1)
