"""SAM TwoWayTransformer (reference: segment_anything/transformer.py:8-260).

Token <-> image cross attention with optional head-dim downsampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfimm_tpu.architectures.segment_anything.common import MLPBlock
from tfimm_tpu.ops import Dense, norm_layer_factory

__all__ = ["TwoWayTransformer", "TwoWayAttentionBlock", "DownsampleAttention"]


class DownsampleAttention:
    """Attention with internal dim = embed_dim / downsample_rate."""

    def __init__(self, embed_dim, nb_heads, downsample_rate):
        self.nb_heads = nb_heads
        internal = embed_dim // downsample_rate
        self.internal_dim = internal
        self.q_proj = Dense(embed_dim, internal)
        self.k_proj = Dense(embed_dim, internal)
        self.v_proj = Dense(embed_dim, internal)
        self.out_proj = Dense(internal, embed_dim)

    def init(self, rng):
        r = jax.random.split(rng, 4)
        return {"q_proj": self.q_proj.init(r[0]), "k_proj": self.k_proj.init(r[1]),
                "v_proj": self.v_proj.init(r[2]),
                "out_proj": self.out_proj.init(r[3])}

    def __call__(self, p, q, k, v):
        b = q.shape[0]
        h = self.nb_heads
        hd = self.internal_dim // h
        q = self.q_proj(p["q_proj"], q).reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
        k = self.k_proj(p["k_proj"], k).reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
        v = self.v_proj(p["v_proj"], v).reshape(b, -1, h, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        attn = attn / jnp.sqrt(jnp.float32(hd))
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.internal_dim)
        return self.out_proj(p["out_proj"], out)


class TwoWayAttentionBlock:
    """(1) token self-attn, (2) token->image cross-attn, (3) token MLP,
    (4) image->token cross-attn."""

    def __init__(self, embed_dim, nb_heads, mlp_dim, attention_downsample_rate,
                 skip_first_layer_pe, act_layer):
        norm = norm_layer_factory("layer_norm")
        self.skip_first_layer_pe = skip_first_layer_pe
        self.self_attn = DownsampleAttention(embed_dim, nb_heads, 1)
        self.norm1 = norm(embed_dim)
        self.cross_attn_token_to_image = DownsampleAttention(
            embed_dim, nb_heads, attention_downsample_rate)
        self.norm2 = norm(embed_dim)
        self.mlp = MLPBlock(embed_dim, mlp_dim, act_layer)
        self.norm3 = norm(embed_dim)
        self.cross_attn_image_to_token = DownsampleAttention(
            embed_dim, nb_heads, attention_downsample_rate)
        self.norm4 = norm(embed_dim)

    def init(self, rng):
        r = jax.random.split(rng, 8)
        return {"self_attn": self.self_attn.init(r[0]),
                "norm1": self.norm1.init(r[1]),
                "cross_attn_token_to_image":
                    self.cross_attn_token_to_image.init(r[2]),
                "norm2": self.norm2.init(r[3]),
                "mlp": self.mlp.init(r[4]),
                "norm3": self.norm3.init(r[5]),
                "cross_attn_image_to_token":
                    self.cross_attn_image_to_token.init(r[6]),
                "norm4": self.norm4.init(r[7])}

    def __call__(self, p, q, k, q_pe, k_pe):
        if self.skip_first_layer_pe:
            q = self.self_attn(p["self_attn"], q, q, q)
        else:
            q = q + self.self_attn(p["self_attn"], q + q_pe, q + q_pe, q)
        q = self.norm1(p["norm1"], q)
        q = q + self.cross_attn_token_to_image(
            p["cross_attn_token_to_image"], q + q_pe, k + k_pe, k)
        q = self.norm2(p["norm2"], q)
        q = q + self.mlp(p["mlp"], q)
        q = self.norm3(p["norm3"], q)
        k = k + self.cross_attn_image_to_token(
            p["cross_attn_image_to_token"], k + k_pe, q + q_pe, q)
        k = self.norm4(p["norm4"], k)
        return q, k


class TwoWayTransformer:
    def __init__(self, embed_dim, nb_blocks, nb_heads, mlp_dim,
                 attention_downsample_rate, act_layer):
        self.blocks = [
            TwoWayAttentionBlock(embed_dim, nb_heads, mlp_dim,
                                 attention_downsample_rate,
                                 skip_first_layer_pe=(j == 0),
                                 act_layer=act_layer)
            for j in range(nb_blocks)
        ]
        self.final_attn_token_to_image = DownsampleAttention(
            embed_dim, nb_heads, attention_downsample_rate)
        self.norm_final_attn = norm_layer_factory("layer_norm")(embed_dim)

    def init(self, rng):
        r = jax.random.split(rng, 3)
        return {"layers": {str(j): blk.init(jax.random.fold_in(r[0], j))
                           for j, blk in enumerate(self.blocks)},
                "final_attn_token_to_image":
                    self.final_attn_token_to_image.init(r[1]),
                "norm_final_attn": self.norm_final_attn.init(r[2])}

    def __call__(self, p, point_embeddings, image_embeddings, image_pe):
        """point_embeddings: (B, N, C); image_embeddings/image_pe: (B, H, W, C).
        Returns processed (queries (B, N, C), keys (B, H, W, C))."""
        b, h, w, c = image_embeddings.shape
        keys = image_embeddings.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c)
        queries = point_embeddings
        for j, blk in enumerate(self.blocks):
            queries, keys = blk(p["layers"][str(j)], queries, keys,
                                point_embeddings, key_pe)
        attn = self.final_attn_token_to_image(
            p["final_attn_token_to_image"], queries + point_embeddings,
            keys + key_pe, keys)
        queries = self.norm_final_attn(p["norm_final_attn"], queries + attn)
        return queries, keys.reshape(b, h, w, c)
