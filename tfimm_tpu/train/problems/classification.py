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
    # Parameter layout when a mesh is supplied (ExperimentConfig.mesh):
    #   "tp"         Megatron TP over "model" where rules match, else
    #                replicated (pure dp when the model axis is 1)
    #   "fsdp"       ZeRO-3: large leaves + Adam moments sharded over "data",
    #                on top of the TP rules
    #   "replicated" every param on every chip (plain data parallel)
    param_sharding: str = "tp"
    # FSDP only: leaves below this many elements stay unsharded (an
    # all-gather on a LayerNorm bias costs more than it saves).
    fsdp_min_leaf_size: int = 2 ** 14
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

        # Mesh wiring: place params (and below, optimizer state / EMA) into
        # their sharded layout up front so the whole lifecycle — training,
        # eval, orbax save/restore — runs on sharded arrays.
        p_shard = None
        if self.mesh is not None:
            p_shard = self._make_param_sharding(cfg, self.mesh)
            self.params = jax.device_put(self.params, p_shard)
            self.model.params = self.params
        self._param_shard = p_shard

        opt_shard = None
        if self.mesh is not None:
            from tfimm_tpu.parallel import opt_state_sharding

            opt_shard = opt_state_sharding(self.tx, self.params, p_shard,
                                           self.mesh)
            self.opt_state = jax.jit(self.tx.init,
                                     out_shardings=opt_shard)(self.params)
        else:
            self.opt_state = self.tx.init(self.params)
        self._opt_shard = opt_shard
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
        shim.params = self.params
        self._train_step = make_train_step(
            shim, self.tx, mesh=self.mesh, loss_fn=loss_fn,
            weight_decay=cfg.weight_decay, param_sharding=p_shard,
        )

        def eval_fn(params, images):
            return model.apply(params, preprocessing(images), training=False)

        if self.mesh is None:
            self._eval_step = jax.jit(eval_fn)
        else:
            from tfimm_tpu.parallel import batch_sharding

            self._eval_step = jax.jit(
                eval_fn,
                in_shardings=(p_shard, batch_sharding(self.mesh)),
            )

    def _make_param_sharding(self, cfg, mesh):
        from tfimm_tpu.parallel import (
            fsdp_param_sharding,
            infer_param_sharding,
            replicated,
        )

        kind = cfg.param_sharding or "tp"
        if kind == "fsdp":
            return fsdp_param_sharding(self.model.params, mesh,
                                       min_leaf_size=cfg.fsdp_min_leaf_size)
        if kind == "tp":
            return infer_param_sharding(self.model.params, mesh)
        if kind == "replicated":
            return jax.tree.map(lambda _: replicated(mesh), self.model.params)
        raise ValueError(
            f"param_sharding must be tp|fsdp|replicated, got {kind!r}")

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
        if self._param_shard is not None:
            # Re-pin onto the mesh layout: a no-op for a checkpoint saved
            # under this sharding, a reshard for warm starts from a
            # single-device (or differently-sharded) checkpoint.
            self.params = jax.device_put(self.params, self._param_shard)
        self.model.params = self.params
        if self.ema_params is not None:
            # Warm starts reset the average to the restored weights.
            self.ema_params = state.get("ema_params", self.params) \
                if not model_only else self.params
            if self._param_shard is not None:
                self.ema_params = jax.device_put(self.ema_params,
                                                 self._param_shard)
        if not model_only:
            self.opt_state = state["opt_state"]
            if self._opt_shard is not None:
                self.opt_state = jax.device_put(self.opt_state,
                                                self._opt_shard)
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
