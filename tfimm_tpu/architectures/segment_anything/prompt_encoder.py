"""SAM prompt encoder (reference: segment_anything/prompt_encoder.py:9-302).

Encodes point/box/mask prompts into sparse and dense embeddings. Under jit all
prompt counts (M1, M2, M3) are static per trace, so the reference's tf.cond
branches become Python conditionals on shapes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from tfimm_tpu.ops import Conv2d, act_layer_factory, norm_layer_factory

__all__ = ["PromptEncoder", "PositionalEmbeddingRandom"]


class PositionalEmbeddingRandom:
    """Fourier positional embedding with random (frozen) spatial frequencies."""

    def __init__(self, embed_dim: int, scale: float = 1.0):
        self.embed_dim = embed_dim
        self.scale = scale

    def init(self, rng):
        return {
            "positional_encoding_gaussian_matrix":
                self.scale * jax.random.normal(rng, (2, self.embed_dim // 2))
        }

    def __call__(self, p, x):
        """Embed points normalized to [0, 1]; x: (..., 2) -> (..., embed_dim)."""
        mat = p["positional_encoding_gaussian_matrix"]
        x = 2 * x - 1
        x = (2 * math.pi) * (x.astype(jnp.float32) @ mat.astype(jnp.float32))
        return jnp.concatenate([jnp.sin(x), jnp.cos(x)], axis=-1)

    def embed_grid(self, p, size: Tuple[int, int]):
        h, w = size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2)
        return self(p, grid)

    def embed_points(self, p, points, image_size):
        x = points[..., 0] / image_size[1]
        y = points[..., 1] / image_size[0]
        return self(p, jnp.stack([x, y], axis=-1))


class MaskDownscaling:
    """4x downscale conv stack embedding mask prompts (Meta naming 0..6)."""

    def __init__(self, embed_dim, mask_hidden_dim, act_layer):
        norm = norm_layer_factory("layer_norm_eps_1e-6")
        self.act = act_layer_factory(act_layer)
        self.conv1 = Conv2d(1, mask_hidden_dim // 4, 2, stride=2,
                            padding="valid")
        self.norm1 = norm(mask_hidden_dim // 4)
        self.conv2 = Conv2d(mask_hidden_dim // 4, mask_hidden_dim, 2, stride=2,
                            padding="valid")
        self.norm2 = norm(mask_hidden_dim)
        self.conv3 = Conv2d(mask_hidden_dim, embed_dim, 1, padding="valid")

    def init(self, rng):
        r = jax.random.split(rng, 5)
        return {"0": self.conv1.init(r[0]), "1": self.norm1.init(r[1]),
                "3": self.conv2.init(r[2]), "4": self.norm2.init(r[3]),
                "6": self.conv3.init(r[4])}

    def __call__(self, p, masks):
        n, m, h, w = masks.shape
        x = masks.reshape(n * m, h, w, 1)
        x = self.act(self.norm1(p["1"], self.conv1(p["0"], x)))
        x = self.act(self.norm2(p["4"], self.conv2(p["3"], x)))
        x = self.conv3(p["6"], x)
        _, hh, ww, d = x.shape
        return x.reshape(n, m, hh, ww, d).sum(axis=1)


class PromptEncoder:
    def __init__(self, embed_dim: int, mask_hidden_dim: int,
                 act_layer: str = "gelu"):
        self.embed_dim = embed_dim
        self.pe_layer = PositionalEmbeddingRandom(embed_dim)
        self.mask_downscaling = MaskDownscaling(embed_dim, mask_hidden_dim,
                                                act_layer)

    def init(self, rng):
        r = jax.random.split(rng, 8)
        return {
            "pe_layer": self.pe_layer.init(r[0]),
            "point_embeddings": {
                str(j): {"weight": jax.random.normal(r[j + 1],
                                                     (1, self.embed_dim))}
                for j in range(4)
            },
            "not_a_point_embed": {"weight": jax.random.normal(
                r[5], (1, self.embed_dim))},
            "no_mask_embed": {"weight": jax.random.normal(
                r[6], (1, self.embed_dim))},
            "mask_downscaling": self.mask_downscaling.init(r[7]),
        }

    def _embed_points(self, p, points, labels, input_size):
        points = points + 0.5  # shift to pixel centers
        emb = self.pe_layer.embed_points(p["pe_layer"], points, input_size)
        labels = labels[..., None]
        emb = emb + jnp.where(
            labels == 0,
            p["point_embeddings"]["0"]["weight"],
            p["point_embeddings"]["1"]["weight"],
        )
        return emb

    def _embed_boxes(self, p, boxes, input_size):
        n, m, _ = boxes.shape
        boxes = boxes + 0.5
        corners = boxes.reshape(n * m, 2, 2)
        emb = self.pe_layer.embed_points(p["pe_layer"], corners, input_size)
        corner_emb = jnp.stack([p["point_embeddings"]["2"]["weight"][0],
                                p["point_embeddings"]["3"]["weight"][0]], axis=0)
        emb = emb + corner_emb[None]
        return emb.reshape(n, 2 * m, self.embed_dim)

    def __call__(self, p, inputs):
        """Returns (sparse_embeddings (N, M, D), dense_embeddings (N, H'', W'', D))."""
        points, labels = inputs["points"], inputs["labels"]
        boxes, masks = inputs["boxes"], inputs["masks"]
        n = points.shape[0]
        h, w = masks.shape[2], masks.shape[3]
        input_size = (4 * h, 4 * w)

        point_emb = self._embed_points(p, points, labels, input_size)
        box_emb = self._embed_boxes(p, boxes, input_size)
        parts = [point_emb]
        if points.shape[1] > 0 and boxes.shape[1] == 0:
            pad = jnp.broadcast_to(p["not_a_point_embed"]["weight"][None],
                                   (n, 1, self.embed_dim))
            parts.append(pad.astype(point_emb.dtype))
        parts.append(box_emb)
        sparse = jnp.concatenate(parts, axis=1)

        if masks.shape[1] == 0:
            dense = jnp.broadcast_to(
                p["no_mask_embed"]["weight"].reshape(1, 1, 1, -1),
                (n, h // 4, w // 4, self.embed_dim),
            )
        else:
            dense = self.mask_downscaling(p["mask_downscaling"], masks)
        return sparse, dense

    def get_dense_pe(self, p, grid_size):
        return self.pe_layer.embed_grid(p["pe_layer"], grid_size)
