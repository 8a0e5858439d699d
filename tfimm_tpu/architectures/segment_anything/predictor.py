"""SAMPredictor: numpy-in/numpy-out interactive interface
(reference: segment_anything/predictor.py:14-491).

``set_image`` computes and caches the image embedding once (the expensive
encoder pass, jit-compiled); ``__call__`` then embeds prompts and decodes masks
repeatedly. Each distinct prompt-count combination triggers one jit
specialization of the light decoder graph; the cached encoder graph is reused.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SAMPredictor", "ImageResizer"]


class SAMPredictor:
    def __init__(self, model, preprocessing: Optional[Callable] = None,
                 size_bucket: Optional[int] = None):
        """``size_bucket`` (flexible-input models only): round the padded
        input size up to a multiple of this many pixels, so images of similar
        sizes share one jit specialization of the encoder instead of
        compiling per exact shape. Must be a multiple of the encoder patch
        size. Padding is zeros after preprocessing and is cropped from the
        output masks, matching SAM's fixed-size semantics."""
        from tfimm_tpu.models.factory import create_preprocessing

        if preprocessing is None:
            preprocessing = create_preprocessing(
                model.cfg.name, in_channels=model.cfg.in_channels,
            )
        if size_bucket is not None and (
                size_bucket % model.cfg.encoder_patch_size != 0):
            raise ValueError(
                f"size_bucket must be a multiple of the encoder patch size "
                f"({model.cfg.encoder_patch_size}), got {size_bucket}")
        self.size_bucket = size_bucket
        self.model = model
        self.preprocessing = preprocessing
        self.resizer: Optional[ImageResizer] = None
        self.image_embedding = None
        self.image_set = False
        self._encode = jax.jit(
            lambda params, img: model.image_encoder(params["image_encoder"], img)
        )
        self._decode = jax.jit(self._decode_fn, static_argnames="multimask_output")

    # -- image ----------------------------------------------------------------
    def set_image(self, image: np.ndarray) -> None:
        """Compute and cache embeddings for an (H0, W0, C) uint8/float image."""
        if self.model.cfg.fixed_input_size:
            self.resizer = ImageResizer(image.shape[:2],
                                        self.model.cfg.input_size)
        else:
            patch = self.model.cfg.encoder_patch_size
            dst = (patch * math.ceil(image.shape[0] / patch),
                   patch * math.ceil(image.shape[1] / patch))
            if self.size_bucket is not None:
                b = self.size_bucket
                dst = (b * math.ceil(dst[0] / b), b * math.ceil(dst[1] / b))
            self.resizer = ImageResizer(image.shape[:2], dst, pad_only=True)
        image = self.resizer.scale_image(image)
        image = self.resizer.pad_image(image)
        x = self.preprocessing(jnp.asarray(image[None]))
        self.image_embedding = self._encode(self.model.params, x)
        self.image_set = True

    def clear_image(self) -> None:
        self.resizer = None
        self.image_embedding = None
        self.image_set = False

    def input_size(self):
        if self.image_set:
            return self.resizer.dst_size
        if self.model.cfg.fixed_input_size:
            return self.model.cfg.input_size
        raise ValueError("Set an image first (or use a fixed-input-size model).")

    def mask_size(self):
        return self.model.mask_size(self.input_size())

    def preprocess_masks(self, mask: np.ndarray) -> np.ndarray:
        """(N?, M, H0, W0) logit masks -> model mask-input size (H', W')."""
        mask = self.resizer.scale_image(mask, channels_last=False)
        mask = self.resizer.pad_image(mask, channels_last=False)
        return ImageResizer.scale_to_size(mask, self.mask_size(),
                                          channels_last=False)

    # -- prediction -----------------------------------------------------------
    def _decode_fn(self, params, image_embedding, points, labels, boxes,
                   masks, multimask_output):
        n = points.shape[0]
        emb = jnp.broadcast_to(image_embedding,
                               (n, *image_embedding.shape[1:]))
        sparse, dense = self.model.prompt_encoder(
            params["prompt_encoder"],
            {"points": points, "labels": labels, "boxes": boxes, "masks": masks},
        )
        logits, scores = self.model.mask_decoder(
            params["mask_decoder"],
            {"image_embeddings": emb,
             "image_pe": self.model.get_image_pe(params, emb),
             "sparse_embeddings": sparse.astype(emb.dtype),
             "dense_embeddings": dense.astype(emb.dtype)},
            multimask_output=multimask_output,
        )
        upscaled = self.model.postprocess_logits(
            logits, input_size=self.input_size(), return_logits=True,
        )
        return upscaled, scores, logits

    def __call__(self, points=None, labels=None, boxes=None, masks=None,
                 multimask_output: bool = True, return_logits: bool = False):
        if not self.image_set:
            raise ValueError("Need to set image before calling predict().")
        points = np.asarray(points, np.float32) if points is not None else None
        labels = np.asarray(labels, np.int32) if labels is not None else None
        boxes = np.asarray(boxes, np.float32) if boxes is not None else None
        masks = np.asarray(masks, np.float32) if masks is not None else None

        batch_shape = self._batch_shape(points, labels, boxes, masks)
        if points is None:
            points = np.zeros(batch_shape + (0, 2), np.float32)
        if labels is None:
            labels = np.zeros(batch_shape + (0,), np.int32)
        if boxes is None:
            boxes = np.zeros(batch_shape + (0, 4), np.float32)
        if masks is None:
            masks = np.zeros(batch_shape + (0, *self.mask_size()), np.float32)
        if (points.shape[:-2] != batch_shape or labels.shape[:-1] != batch_shape
                or boxes.shape[:-2] != batch_shape
                or masks.shape[:-3] != batch_shape):
            raise ValueError("All prompts must have the same batch shape.")
        batched = batch_shape != ()
        if not batched:
            points, labels = points[None], labels[None]
            boxes, masks = boxes[None], masks[None]

        points = self.resizer.scale_points(points)
        boxes = self.resizer.scale_boxes(boxes)

        upscaled, scores, logits = self._decode(
            self.model.params, self.image_embedding,
            jnp.asarray(points), jnp.asarray(labels), jnp.asarray(boxes),
            jnp.asarray(masks), multimask_output=multimask_output,
        )
        upscaled = np.asarray(upscaled)
        scores = np.asarray(scores)
        logits = np.asarray(logits)

        out_masks = self.resizer.postprocess_mask(upscaled)
        if not batched:
            out_masks, scores, logits = out_masks[0], scores[0], logits[0]
        if not return_logits:
            out_masks = out_masks > self.model.mask_threshold
        return out_masks, scores, logits

    @staticmethod
    def _batch_shape(points, labels, boxes, masks):
        if points is not None:
            return points.shape[:-2]
        if labels is not None:
            return labels.shape[:-1]
        if boxes is not None:
            return boxes.shape[:-2]
        if masks is not None:
            return masks.shape[:-3]
        return ()


class ImageResizer:
    """Longest-side scaling + padding, with coordinate/box/mask transforms
    (reference: predictor.py:287-491)."""

    def __init__(self, src_size: Tuple[int, int], dst_size: Tuple[int, int],
                 pad_only: bool = False):
        self.src_size = tuple(src_size)
        self.dst_size = tuple(dst_size)
        self.pad_only = pad_only
        self.scale, self.rescaled_size = self._get_scale()

    def _get_scale(self):
        if self.pad_only:
            return 1.0, self.src_size
        h_scale = self.dst_size[0] / self.src_size[0]
        w_scale = self.dst_size[1] / self.src_size[1]
        if h_scale >= w_scale:
            scale = w_scale
            rescaled = (int(scale * self.src_size[0]), self.dst_size[1])
        else:
            scale = h_scale
            rescaled = (self.dst_size[0], int(scale * self.src_size[1]))
        rescaled = (min(rescaled[0], self.dst_size[0]),
                    min(rescaled[1], self.dst_size[1]))
        return scale, rescaled

    @staticmethod
    def scale_to_size(image: np.ndarray, size: Tuple[int, int],
                      channels_last: bool = True) -> np.ndarray:
        no_batch = image.ndim == 3
        if no_batch:
            image = image[None]
        if not channels_last:
            image = np.transpose(image, (0, 2, 3, 1))
        dtype = image.dtype
        n, _, _, c = image.shape
        out = jax.image.resize(
            jnp.asarray(image, jnp.float32), (n, *size, c), method="linear",
            antialias=True,
        )
        image = np.asarray(out).astype(dtype)
        if not channels_last:
            image = np.transpose(image, (0, 3, 1, 2))
        if no_batch:
            image = image[0]
        return image

    def scale_image(self, image, channels_last: bool = True):
        return self.scale_to_size(image, self.rescaled_size, channels_last)

    def unscale_image(self, image, channels_last: bool = True):
        return self.scale_to_size(image, self.src_size, channels_last)

    def pad_image(self, image, channels_last: bool = True):
        no_batch = image.ndim == 3
        if no_batch:
            image = image[None]
        if not channels_last:
            image = np.transpose(image, (0, 2, 3, 1))
        pad_h = self.dst_size[0] - image.shape[1]
        pad_w = self.dst_size[1] - image.shape[2]
        if pad_h < 0 or pad_w < 0:
            raise ValueError("Cannot pad an image larger than dst_size.")
        image = np.pad(image, [[0, 0], [0, pad_h], [0, pad_w], [0, 0]])
        if not channels_last:
            image = np.transpose(image, (0, 3, 1, 2))
        if no_batch:
            image = image[0]
        return image

    def scale_points(self, points):
        return self.scale * points

    def scale_boxes(self, boxes):
        return self.scale * boxes

    def postprocess_mask(self, mask, threshold: Optional[float] = None):
        mask = mask[..., :self.rescaled_size[0], :self.rescaled_size[1]]
        mask = self.unscale_image(mask, channels_last=False)
        if threshold is not None:
            mask = mask > threshold
        return mask
