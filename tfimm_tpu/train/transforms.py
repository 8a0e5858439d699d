"""On-device batch augmentation: mixup, cutmix, random flip.

The reference's input pipeline (tfimm/train/datasets/tfds.py) ships raw
batches with no augmentation; this module goes beyond parity. All transforms
are jittable pure functions of (rng, batch) with static shapes, so they fuse
into the training step and run on the TPU — no host-side augmentation
bottleneck. Cutmix boxes are realised as iota-comparison masks (no dynamic
slicing), which XLA fuses into the blend.

Semantics follow timm's ``Mixup`` in "batch" mode: one lambda/box draw per
batch, labels become soft targets ``lam * y + (1 - lam) * y[::-1]`` with
optional label smoothing folded in.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["Mixup", "random_flip_horizontal", "smooth_one_hot"]


def random_flip_horizontal(rng, images):
    """Per-sample random horizontal flip of an NHWC batch."""
    flip = jax.random.bernoulli(rng, 0.5, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def smooth_one_hot(labels, nb_classes: int, label_smoothing: float = 0.0):
    """Integer labels -> (B, C) soft targets with label smoothing."""
    off = label_smoothing / nb_classes
    on = 1.0 - label_smoothing + off
    return jax.nn.one_hot(labels, nb_classes, dtype=jnp.float32) * (on - off) + off


def _box_mask(rng, h: int, w: int, lam):
    """Cutmix box mask (1, H, W, 1) covering ~``1 - lam`` of the image, and
    the exact covered fraction. Box is centred uniformly; realised with iota
    comparisons so shapes stay static under jit."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = jnp.round(h * ratio)
    cut_w = jnp.round(w * ratio)
    ky, kx = jax.random.split(rng)
    cy = jax.random.uniform(ky, (), minval=0.0, maxval=float(h))
    cx = jax.random.uniform(kx, (), minval=0.0, maxval=float(w))
    y0 = jnp.clip(cy - cut_h / 2, 0, h)
    y1 = jnp.clip(cy + cut_h / 2, 0, h)
    x0 = jnp.clip(cx - cut_w / 2, 0, w)
    x1 = jnp.clip(cx + cut_w / 2, 0, w)
    y0, y1, x0, x1 = (jnp.floor(y0), jnp.floor(y1), jnp.floor(x0), jnp.floor(x1))
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    mask = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))
    frac = (y1 - y0) * (x1 - x0) / (h * w)
    return mask[None, :, :, None], frac


class Mixup:
    """Mixup + cutmix with soft-label targets (timm-style, batch mode).

    ``alpha = 0`` disables the corresponding mode (resolved statically).
    Returns ``(images, soft_labels)``; feed the soft labels to
    ``optax.softmax_cross_entropy``. ``make_train_step``'s default loss
    handles both integer and soft labels.
    """

    def __init__(self, nb_classes: int, mixup_alpha: float = 0.8,
                 cutmix_alpha: float = 1.0, prob: float = 1.0,
                 switch_prob: float = 0.5, label_smoothing: float = 0.0):
        if mixup_alpha == 0.0 and cutmix_alpha == 0.0:
            raise ValueError("Enable at least one of mixup/cutmix")
        self.nb_classes = nb_classes
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.prob = prob
        self.switch_prob = switch_prob
        self.label_smoothing = label_smoothing

    def __call__(self, rng, images, labels) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k_apply, k_switch, k_lam, k_box = jax.random.split(rng, 4)
        b, h, w, _ = images.shape

        if self.cutmix_alpha == 0.0:
            use_cutmix = jnp.asarray(False)
        elif self.mixup_alpha == 0.0:
            use_cutmix = jnp.asarray(True)
        else:
            use_cutmix = jax.random.bernoulli(k_switch, self.switch_prob)

        alpha_mix = self.mixup_alpha or 1.0
        alpha_cut = self.cutmix_alpha or 1.0
        lam_mix = jax.random.beta(k_lam, alpha_mix, alpha_mix)
        lam_cut = jax.random.beta(k_lam, alpha_cut, alpha_cut)

        flipped = images[::-1]
        mixed_mix = lam_mix * images + (1.0 - lam_mix) * flipped
        mask, frac = _box_mask(k_box, h, w, lam_cut)
        mixed_cut = jnp.where(mask, flipped, images)
        lam_cut_exact = 1.0 - frac  # exact box area, not the Beta draw

        out = jnp.where(use_cutmix, mixed_cut, mixed_mix)
        lam = jnp.where(use_cutmix, lam_cut_exact, lam_mix)

        apply = jax.random.bernoulli(k_apply, self.prob)
        out = jnp.where(apply, out, images)
        lam = jnp.where(apply, lam, 1.0)

        y = smooth_one_hot(labels, self.nb_classes, self.label_smoothing)
        soft = lam * y + (1.0 - lam) * y[::-1]
        return out.astype(images.dtype), soft
