"""Classification problem (reference: tfimm/train/problems/classification.py).

TPU adaptation: the inner step is a jit-compiled, optionally mesh-sharded
function (forward in bf16 if mixed_precision, float32 softmax CE + optional
L2 weight decay, backward, optax update, BN-stat merge). No loss scaling is
needed for bf16. ``save_model`` exports via tfimm_tpu.save_model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tfimm_tpu.parallel import make_train_step
from tfimm_tpu.parallel.step import cross_entropy_loss
from tfimm_tpu.train.interface import ProblemBase
from tfimm_tpu.train.registry import cfg_serializable, get_class

__all__ = ["ClassificationConfig", "ClassificationProblem"]


@dataclass
class ClassificationConfig:
    model: Any = None
    model_class: str = ""
    optimizer: Any = None
    optimizer_class: str = ""
    # Whether to use binary crossentropy (single-logit sigmoid) for 2 classes
    binary_loss: bool = False
    weight_decay: float = 0.0
    label_smoothing: float = 0.0
    mixed_precision: bool = False  # bf16 compute on TPU
    # Weight averaging: keep an EMA of the params, validate/export with it.
    ema_decay: float = 0.0  # 0 = disabled; typical 0.9998
    # On-device mixup/cutmix (train/transforms.py); 0/0 = disabled.
    mixup_alpha: float = 0.0
    cutmix_alpha: float = 0.0
    mixup_prob: float = 1.0
    # Set by the experiment runner
    timekeeping: Any = None
    timekeeping_class: str = ""


@cfg_serializable
class ClassificationProblem(ProblemBase):
    cfg_class = ClassificationConfig

    def __init__(self, cfg: ClassificationConfig, timekeeping=None, mesh=None):
        self.cfg = cfg
        self.timekeeping = timekeeping or cfg.timekeeping
        self.mesh = mesh

        factory = get_class(cfg.model_class)(cfg=cfg.model)
        self.model, self.preprocessing = factory()
        opt_factory = get_class(cfg.optimizer_class)(
            cfg=cfg.optimizer, timekeeping=self.timekeeping,
            mixed_precision=cfg.mixed_precision,
        )
        self.tx, self.lr_schedule = opt_factory()
        self.params = self.model.params
        self.opt_state = self.tx.init(self.params)
        self.epoch = 0
        self._rng = jax.random.PRNGKey(0)

        self.ema_params = None
        if cfg.ema_decay:
            d = cfg.ema_decay
            self.ema_params = self.params
            self._ema_update = jax.jit(lambda ema, p: jax.tree.map(
                lambda e, q: e * d + q.astype(e.dtype) * (1.0 - d), ema, p))

        self._mixup = None
        if cfg.mixup_alpha or cfg.cutmix_alpha:
            from tfimm_tpu.train.transforms import Mixup

            self._mixup = jax.jit(Mixup(
                nb_classes=self.model.cfg.nb_classes,
                mixup_alpha=cfg.mixup_alpha, cutmix_alpha=cfg.cutmix_alpha,
                prob=cfg.mixup_prob, label_smoothing=cfg.label_smoothing))

        def loss_fn(logits, labels):
            if cfg.binary_loss:
                logits = logits[..., 0].astype(jnp.float32)
                return optax.sigmoid_binary_cross_entropy(
                    logits, labels.astype(jnp.float32)).mean()
            return cross_entropy_loss(logits, labels,
                                      label_smoothing=cfg.label_smoothing)

        compute_dtype = jnp.bfloat16 if cfg.mixed_precision else None
        model = self.model
        preprocessing = self.preprocessing

        def wrapped_model_apply(params, images, training, rng, mutable):
            x = preprocessing(images)
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
            return model.apply(params, x, training=training, rng=rng,
                               mutable=mutable)

        # Reuse the sharded-step machinery with our preprocessing baked in.
        shim = _ModelShim(wrapped_model_apply, model)
        self._train_step = make_train_step(
            shim, self.tx, mesh=self.mesh, loss_fn=loss_fn,
            weight_decay=cfg.weight_decay,
        )
        self._eval_step = jax.jit(
            lambda params, images: model.apply(params, preprocessing(images),
                                               training=False)
        )

    # -- ProblemBase ------------------------------------------------------------
    def train_step(self, data, it: int):
        images, labels = data
        images, labels = jnp.asarray(images), jnp.asarray(labels)
        self._rng, step_rng, mix_rng = jax.random.split(self._rng, 3)
        if self._mixup is not None:
            # Applied to raw images: blending commutes with the affine
            # (img - mean)/std preprocessing baked into the step.
            images, labels = self._mixup(mix_rng, images.astype(jnp.float32),
                                         labels)
        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, (images, labels), step_rng,
        )
        if self.ema_params is not None:
            self.ema_params = self._ema_update(self.ema_params, self.params)
        self.model.params = self.params
        logs = {"train/loss": float(metrics["loss"]),
                "train/accuracy": float(metrics["accuracy"])}
        return float(metrics["loss"]), logs

    def validation(self, dataset):
        # Validate the EMA weights when enabled (they're what gets deployed).
        eval_params = self.ema_params if self.ema_params is not None \
            else self.params
        correct, total, loss_sum = 0, 0, 0.0
        for images, labels in dataset:
            logits = np.asarray(self._eval_step(eval_params,
                                                jnp.asarray(images)))
            if logits.ndim == 3:
                logits = logits.mean(axis=1)
            preds = logits.argmax(-1)
            correct += int((preds == np.asarray(labels)).sum())
            total += len(labels)
        return {"val/accuracy": correct / max(total, 1)}

    @property
    def state(self):
        state = {"params": self.params, "opt_state": self.opt_state,
                 "epoch": self.epoch}
        if self.ema_params is not None:
            state["ema_params"] = self.ema_params
        return state

    def set_state(self, state, model_only: bool = False):
        self.params = state["params"]
        self.model.params = self.params
        if self.ema_params is not None:
            # Warm starts reset the average to the restored weights.
            self.ema_params = state.get("ema_params", self.params) \
                if not model_only else self.params
        if not model_only:
            self.opt_state = state["opt_state"]
            self.epoch = int(state["epoch"])

    def start_epoch(self):
        pass

    def save_model(self, save_dir: str):
        """Export both the parameter checkpoint and a deployment inference
        artifact (preprocessing + forward + normalized logits, f32), the
        jax.export analog of the reference's inference SavedModel
        (classification.py:202-247)."""
        import os

        from tfimm_tpu.models.serialization import save_model
        from tfimm_tpu.utils.export import export_model

        # Deploy the EMA weights when averaging is on.
        self.model.params = self.ema_params if self.ema_params is not None \
            else self.params
        try:
            save_model(self.model, save_dir)
            try:
                export_model(self.model,
                             os.path.join(save_dir, "model.stablehlo"),
                             preprocessing=self.preprocessing,
                             normalize_logits=True)
            except Exception as e:  # polymorphic export can fail, non-fatal
                import logging

                logging.warning(f"jax.export deployment artifact failed: {e}")
        finally:
            self.model.params = self.params


class _ModelShim:
    """Adapts a custom apply function to the interface make_train_step expects."""

    def __init__(self, apply_fn, model):
        self._apply_fn = apply_fn
        self.params = model.params
        self.cfg = model.cfg

    def apply(self, params, x, training=False, rng=None, mutable=False):
        return self._apply_fn(params, x, training, rng, mutable)
