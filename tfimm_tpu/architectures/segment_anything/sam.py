"""Segment Anything Model (SAM).

TPU-native re-implementation of the reference composite model
(segment_anything/sam.py:62-470): ViT-Det image encoder + prompt encoder +
two-way-transformer mask decoder. Input is a dict (images/points/labels/
boxes/masks); under jit each distinct prompt-count combination compiles its
own specialization (the predictor buckets prompts to bound retracing).

Paper: Segment Anything, https://arxiv.org/abs/2304.02643.
Weights convert from the official Meta checkpoints via ``[pytorch]`` URLs.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tfimm_tpu.architectures.segment_anything.image_encoder import ImageEncoder
from tfimm_tpu.architectures.segment_anything.mask_decoder import MaskDecoder
from tfimm_tpu.architectures.segment_anything.prompt_encoder import PromptEncoder
from tfimm_tpu.architectures.segment_anything.transformer import TwoWayTransformer
from tfimm_tpu.models.base import Model
from tfimm_tpu.models.config import ModelConfig
from tfimm_tpu.models.registry import register_model
from tfimm_tpu.utils.constants import IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD

__all__ = ["SegmentAnythingModel", "SegmentAnythingModelConfig"]


@dataclass
class SegmentAnythingModelConfig(ModelConfig):
    nb_classes: int = 0  # segmentation model: no classifier
    in_channels: int = 3
    input_size: Tuple[int, int] = (1024, 1024)
    fixed_input_size: bool = True
    embed_dim: int = 256
    nb_multimask_outputs: int = 3
    mask_threshold: float = 0.0
    encoder_patch_size: int = 16
    encoder_embed_dim: int = 768
    encoder_nb_blocks: int = 12
    encoder_nb_heads: int = 12
    encoder_mlp_ratio: float = 4.0
    encoder_drop_rate: float = 0.0
    encoder_attn_drop_rate: float = 0.0
    encoder_drop_path_rate: float = 0.0
    encoder_norm_layer: str = "layer_norm_eps_1e-6"
    encoder_act_layer: str = "gelu"
    encoder_qkv_bias: bool = True
    encoder_global_attn_indices: Tuple = (2, 5, 8, 11)
    encoder_window_size: int = 14
    prompt_mask_hidden_dim: int = 16
    decoder_nb_blocks: int = 2
    decoder_nb_heads: int = 8
    decoder_mlp_channels: int = 2048
    decoder_iou_head_depth: int = 3
    decoder_iou_hidden_dim: int = 256
    mean: Tuple[float, float, float] = IMAGENET_DEFAULT_MEAN
    std: Tuple[float, float, float] = IMAGENET_DEFAULT_STD
    first_conv: str = "image_encoder.patch_embed.proj"

    @property
    def transform_weights(self):
        transforms = {"image_encoder.pos_embed": _transform_pos_embed}
        for j in self.encoder_global_attn_indices:
            prefix = f"image_encoder.blocks.{j}.attn.rel_pos"
            transforms[prefix + "_h"] = partial(_transform_rel_pos, axis=0)
            transforms[prefix + "_w"] = partial(_transform_rel_pos, axis=1)
        return transforms


def _transform_rel_pos(model, rel_pos, target_cfg, axis: int):
    grid_dim = target_cfg.input_size[axis] // target_cfg.encoder_patch_size
    new_size = 2 * grid_dim - 1
    return jax.image.resize(rel_pos.astype(jnp.float32),
                            (new_size, rel_pos.shape[1]), method="bilinear")


def _transform_pos_embed(model, pos_embed, target_cfg):
    grid = (target_cfg.input_size[0] // target_cfg.encoder_patch_size,
            target_cfg.input_size[1] // target_cfg.encoder_patch_size)
    return jax.image.resize(pos_embed.astype(jnp.float32),
                            (1, *grid, pos_embed.shape[-1]), method="bilinear")


class SegmentAnythingModel(Model):
    cfg_class = SegmentAnythingModelConfig

    def __init__(self, cfg: SegmentAnythingModelConfig, params=None):
        super().__init__(cfg, params)
        self.image_encoder = ImageEncoder(
            input_size=cfg.input_size,
            fixed_input_size=cfg.fixed_input_size,
            patch_size=cfg.encoder_patch_size,
            in_channels=cfg.in_channels,
            embed_dim=cfg.encoder_embed_dim,
            nb_blocks=cfg.encoder_nb_blocks,
            nb_heads=cfg.encoder_nb_heads,
            mlp_ratio=cfg.encoder_mlp_ratio,
            out_channels=cfg.embed_dim,
            qkv_bias=cfg.encoder_qkv_bias,
            norm_layer=cfg.encoder_norm_layer,
            act_layer=cfg.encoder_act_layer,
            use_abs_pos=True,
            use_rel_pos=True,
            global_attn_indices=cfg.encoder_global_attn_indices,
            window_size=cfg.encoder_window_size,
            drop_rate=cfg.encoder_drop_rate,
            attn_drop_rate=cfg.encoder_attn_drop_rate,
            drop_path_rate=cfg.encoder_drop_path_rate,
        )
        self.prompt_encoder = PromptEncoder(cfg.embed_dim,
                                            cfg.prompt_mask_hidden_dim, "gelu")
        self.mask_decoder = MaskDecoder(
            transformer=TwoWayTransformer(
                embed_dim=cfg.embed_dim,
                nb_blocks=cfg.decoder_nb_blocks,
                nb_heads=cfg.decoder_nb_heads,
                mlp_dim=cfg.decoder_mlp_channels,
                attention_downsample_rate=2,
                act_layer="relu",
            ),
            embed_dim=cfg.embed_dim,
            nb_multimask_outputs=cfg.nb_multimask_outputs,
            iou_head_depth=cfg.decoder_iou_head_depth,
            iou_head_hidden_dim=cfg.decoder_iou_hidden_dim,
            act_layer="gelu",
        )

    # PT ConvTranspose2d kernels are (I, O, kh, kw); ours are (kh, kw, I, O).
    def convert_pt_weight(self, path, arr, target_shape):
        if "output_upscaling" in path and path.endswith("kernel") and arr.ndim == 4:
            return arr.transpose(2, 3, 0, 1)
        return None  # default rules

    def grid_size(self, input_size: Optional[Tuple[int, int]] = None):
        input_size = input_size or self.cfg.input_size
        return (input_size[0] // self.cfg.encoder_patch_size,
                input_size[1] // self.cfg.encoder_patch_size)

    def mask_size(self, input_size: Optional[Tuple[int, int]] = None):
        g = self.grid_size(input_size)
        return 4 * g[0], 4 * g[1]

    @property
    def mask_threshold(self):
        return self.cfg.mask_threshold

    @property
    def dummy_inputs(self):
        return {
            "images": jnp.zeros((1, *self.cfg.input_size, self.cfg.in_channels)),
            "points": jnp.zeros((1, 1, 2)),
            "labels": jnp.zeros((1, 1), jnp.int32),
            "boxes": jnp.zeros((1, 1, 4)),
            "masks": jnp.zeros((1, 1, *self.mask_size())),
        }

    def init_params(self, rng):
        r = jax.random.split(rng, 3)
        return {"image_encoder": self.image_encoder.init(r[0]),
                "prompt_encoder": self.prompt_encoder.init(r[1]),
                "mask_decoder": self.mask_decoder.init(r[2])}

    def get_image_pe(self, params, image_embeddings):
        n, h, w, _ = image_embeddings.shape
        pe = self.prompt_encoder.get_dense_pe(params["prompt_encoder"], (h, w))
        return jnp.broadcast_to(pe[None], (n, *pe.shape)).astype(
            image_embeddings.dtype)

    def postprocess_logits(self, logits, input_size, return_logits):
        n, k, h, w = logits.shape
        masks = logits.transpose(0, 2, 3, 1).astype(jnp.float32)
        masks = jax.image.resize(masks, (n, *input_size, k), method="bilinear")
        masks = masks.transpose(0, 3, 1, 2)
        if not return_logits:
            masks = masks > self.mask_threshold
        return masks

    def forward_features(self, params, x):
        images = x["images"] if isinstance(x, dict) else x
        return self.image_encoder(params["image_encoder"], images)

    def forward(self, params, inputs, multimask_output=False,
                return_logits=False):
        image_embeddings = self.image_encoder(params["image_encoder"],
                                              inputs["images"])
        sparse, dense = self.prompt_encoder(
            params["prompt_encoder"],
            {"points": inputs["points"], "labels": inputs["labels"],
             "boxes": inputs["boxes"], "masks": inputs["masks"]},
        )
        logits, scores = self.mask_decoder(
            params["mask_decoder"],
            {"image_embeddings": image_embeddings,
             "image_pe": self.get_image_pe(params, image_embeddings),
             "sparse_embeddings": sparse.astype(image_embeddings.dtype),
             "dense_embeddings": dense.astype(image_embeddings.dtype)},
            multimask_output=multimask_output,
        )
        masks = self.postprocess_logits(
            logits, input_size=inputs["images"].shape[1:3],
            return_logits=return_logits,
        )
        return masks, scores, logits

    @property
    def feature_names(self):
        return tuple(["patch_embedding"]
                     + [f"block_{j}" for j in range(self.cfg.encoder_nb_blocks)]
                     + ["neck"])


def _register(name, url_file, **kwargs):
    def fn():
        url = ("[pytorch]https://dl.fbaipublicfiles.com/segment_anything/"
               + url_file)
        return SegmentAnythingModel, SegmentAnythingModelConfig(
            name=name, url=url, **kwargs)

    fn.__name__ = name
    fn.__qualname__ = name
    fn.__module__ = __name__
    globals()[name] = fn
    register_model(fn)


_register("sam_vit_b", "sam_vit_b_01ec64.pth", encoder_embed_dim=768,
          encoder_nb_blocks=12, encoder_nb_heads=12,
          encoder_global_attn_indices=(2, 5, 8, 11))
_register("sam_vit_l", "sam_vit_l_0b3195.pth", encoder_embed_dim=1024,
          encoder_nb_blocks=24, encoder_nb_heads=16,
          encoder_global_attn_indices=(5, 11, 17, 23))
_register("sam_vit_h", "sam_vit_h_4b8939.pth", encoder_embed_dim=1280,
          encoder_nb_blocks=32, encoder_nb_heads=16,
          encoder_global_attn_indices=(7, 15, 23, 31))
