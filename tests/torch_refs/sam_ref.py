"""Ground-truth PyTorch implementations of SAM components (decomposed rel-pos
attention, two-way transformer, prompt encoder) with Meta state_dict naming,
for parity tests. Independent implementation of arXiv:2304.02643 /
arXiv:2112.01526."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def get_rel_pos(q_size, k_size, rel_pos):
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = F.interpolate(
            rel_pos.reshape(1, rel_pos.shape[0], -1).permute(0, 2, 1),
            size=max_rel_dist, mode="linear",
        ).reshape(-1, max_rel_dist).permute(1, 0)
    q_coords = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.long()]


class RelPosAttention(nn.Module):
    def __init__(self, dim, nb_heads, input_size):
        super().__init__()
        self.nb_heads = nb_heads
        head_dim = dim // nb_heads
        self.scale = head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.rel_pos_h = nn.Parameter(
            torch.randn(2 * input_size[0] - 1, head_dim) * 0.02)
        self.rel_pos_w = nn.Parameter(
            torch.randn(2 * input_size[1] - 1, head_dim) * 0.02)

    def forward(self, x):
        b, h, w, _ = x.shape
        qkv = self.qkv(x).reshape(b, h * w, 3, self.nb_heads, -1)
        qkv = qkv.permute(2, 0, 3, 1, 4).reshape(3, b * self.nb_heads, h * w, -1)
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        # decomposed rel pos
        r_h = get_rel_pos(h, h, self.rel_pos_h)
        r_w = get_rel_pos(w, w, self.rel_pos_w)
        q_grid = q.reshape(-1, h, w, q.shape[-1])
        rel_h = torch.einsum("nhwc,hkc->nhwk", q_grid, r_h)
        rel_w = torch.einsum("nhwc,wkc->nhwk", q_grid, r_w)
        attn = (attn.view(-1, h, w, h, w) + rel_h[..., :, None]
                + rel_w[..., None, :]).view(-1, h * w, h * w)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).view(b, self.nb_heads, h, w, -1)
        x = x.permute(0, 2, 3, 1, 4).reshape(b, h, w, -1)
        return self.proj(x)


class DownsampleAttention(nn.Module):
    def __init__(self, dim, nb_heads, downsample_rate=1):
        super().__init__()
        self.nb_heads = nb_heads
        internal = dim // downsample_rate
        self.q_proj = nn.Linear(dim, internal)
        self.k_proj = nn.Linear(dim, internal)
        self.v_proj = nn.Linear(dim, internal)
        self.out_proj = nn.Linear(internal, dim)

    def _split(self, x):
        b, n, c = x.shape
        return x.reshape(b, n, self.nb_heads, c // self.nb_heads).transpose(1, 2)

    def forward(self, q, k, v):
        q, k, v = self._split(self.q_proj(q)), self._split(self.k_proj(k)), \
            self._split(self.v_proj(v))
        attn = q @ k.transpose(-2, -1) / math.sqrt(q.shape[-1])
        out = (attn.softmax(dim=-1) @ v).transpose(1, 2)
        out = out.reshape(out.shape[0], out.shape[1], -1)
        return self.out_proj(out)


class MLPBlock(nn.Module):
    def __init__(self, dim, hidden, act=nn.ReLU):
        super().__init__()
        self.lin1 = nn.Linear(dim, hidden)
        self.lin2 = nn.Linear(hidden, dim)
        self.act = act()

    def forward(self, x):
        return self.lin2(self.act(self.lin1(x)))


class TwoWayAttentionBlock(nn.Module):
    def __init__(self, dim, nb_heads, mlp_dim, skip_first_layer_pe):
        super().__init__()
        self.skip_first_layer_pe = skip_first_layer_pe
        self.self_attn = DownsampleAttention(dim, nb_heads)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn_token_to_image = DownsampleAttention(dim, nb_heads, 2)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MLPBlock(dim, mlp_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.cross_attn_image_to_token = DownsampleAttention(dim, nb_heads, 2)
        self.norm4 = nn.LayerNorm(dim)

    def forward(self, q, k, q_pe, k_pe):
        if self.skip_first_layer_pe:
            q = self.self_attn(q, q, q)
        else:
            q = q + self.self_attn(q + q_pe, q + q_pe, q)
        q = self.norm1(q)
        q = self.norm2(q + self.cross_attn_token_to_image(q + q_pe, k + k_pe, k))
        q = self.norm3(q + self.mlp(q))
        k = self.norm4(k + self.cross_attn_image_to_token(k + k_pe, q + q_pe, q))
        return q, k


class TwoWayTransformer(nn.Module):
    def __init__(self, dim, nb_blocks, nb_heads, mlp_dim):
        super().__init__()
        self.layers = nn.ModuleList([
            TwoWayAttentionBlock(dim, nb_heads, mlp_dim, j == 0)
            for j in range(nb_blocks)
        ])
        self.final_attn_token_to_image = DownsampleAttention(dim, nb_heads, 2)
        self.norm_final_attn = nn.LayerNorm(dim)

    def forward(self, point_emb, image_emb, image_pe):
        b, h, w, c = image_emb.shape
        keys = image_emb.reshape(b, h * w, c)
        key_pe = image_pe.reshape(b, h * w, c)
        queries = point_emb
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_emb, key_pe)
        attn = self.final_attn_token_to_image(queries + point_emb,
                                              keys + key_pe, keys)
        queries = self.norm_final_attn(queries + attn)
        return queries, keys


class PositionalEmbeddingRandom(nn.Module):
    def __init__(self, embed_dim):
        super().__init__()
        self.register_buffer(
            "positional_encoding_gaussian_matrix",
            torch.randn(2, embed_dim // 2),
        )

    def forward(self, coords):
        coords = 2 * coords - 1
        coords = coords @ self.positional_encoding_gaussian_matrix
        coords = 2 * np.pi * coords
        return torch.cat([torch.sin(coords), torch.cos(coords)], dim=-1)

    def embed_points(self, points, image_size):
        x = points[..., 0] / image_size[1]
        y = points[..., 1] / image_size[0]
        return self(torch.stack([x, y], dim=-1))
