"""Distillation problem (reference: tfimm/train/problems/distillation.py):
frozen teacher / student embeddings, optional L2 normalization, MSE loss."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import optax

from tfimm_tpu.train.interface import ProblemBase
from tfimm_tpu.train.registry import cfg_serializable, get_class

__all__ = ["DistillationConfig", "DistillationProblem"]


@dataclass
class DistillationConfig:
    teacher: Any = None
    teacher_class: str = ""
    student: Any = None
    student_class: str = ""
    optimizer: Any = None
    optimizer_class: str = ""
    normalize_embeddings: bool = True
    mixed_precision: bool = False
    timekeeping: Any = None
    timekeeping_class: str = ""


@cfg_serializable
class DistillationProblem(ProblemBase):
    cfg_class = DistillationConfig

    def __init__(self, cfg: DistillationConfig, timekeeping=None, mesh=None):
        self.cfg = cfg
        self.timekeeping = timekeeping or cfg.timekeeping
        self.mesh = mesh

        self.teacher, self.teacher_preprocessing = get_class(
            cfg.teacher_class)(cfg=cfg.teacher)()
        self.student, self.student_preprocessing = get_class(
            cfg.student_class)(cfg=cfg.student)()
        opt_factory = get_class(cfg.optimizer_class)(
            cfg=cfg.optimizer, timekeeping=self.timekeeping,
            mixed_precision=cfg.mixed_precision,
        )
        self.tx, self.lr_schedule = opt_factory()
        self.params = self.student.params

        # Mesh wiring: student params take the TP rules (replicated for a
        # dp-only mesh), the frozen teacher is replicated, batch is sharded
        # over "data" — same recipe as ClassificationProblem.
        p_shard = t_shard = opt_shard = None
        if mesh is not None:
            from tfimm_tpu.parallel import (
                infer_param_sharding,
                opt_state_sharding,
                replicated,
            )

            p_shard = infer_param_sharding(self.params, mesh)
            self.params = jax.device_put(self.params, p_shard)
            self.student.params = self.params
            t_shard = jax.tree.map(lambda _: replicated(mesh),
                                   self.teacher.params)
            self.teacher.params = jax.device_put(self.teacher.params, t_shard)
            opt_shard = opt_state_sharding(self.tx, self.params, p_shard, mesh)
            self.opt_state = jax.jit(self.tx.init,
                                     out_shardings=opt_shard)(self.params)
        else:
            self.opt_state = self.tx.init(self.params)
        self._param_shard = p_shard
        self.epoch = 0
        self._rng = jax.random.PRNGKey(0)

        teacher, student = self.teacher, self.student
        t_prep, s_prep = self.teacher_preprocessing, self.student_preprocessing
        normalize = cfg.normalize_embeddings
        compute_dtype = jnp.bfloat16 if cfg.mixed_precision else None

        def embeddings(model, prep, params, images, training, rng):
            x = prep(images)
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
            emb = model.apply(params, x, training=training, rng=rng,
                              features_only=True)
            emb = emb.astype(jnp.float32)
            if normalize:
                emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
            return emb

        def step(params, opt_state, images, teacher_params, rng):
            target = embeddings(teacher, t_prep, teacher_params, images,
                                False, None)

            def loss_fn(p):
                emb = embeddings(student, s_prep, p, images, True, rng)
                return jnp.mean(jnp.square(emb - jax.lax.stop_gradient(target)))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        if mesh is None:
            self._step = jax.jit(step)
        else:
            from tfimm_tpu.parallel import batch_sharding, replicated

            b_shard = batch_sharding(mesh)
            self._step = jax.jit(
                step,
                in_shardings=(p_shard, opt_shard, b_shard, t_shard,
                              replicated(mesh)),
                out_shardings=(p_shard, opt_shard, replicated(mesh)),
            )

    def train_step(self, data, it: int):
        images = data[0] if isinstance(data, (tuple, list)) else data
        self._rng, step_rng = jax.random.split(self._rng)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, jnp.asarray(images),
            self.teacher.params, step_rng,
        )
        self.student.params = self.params
        return float(loss), {"train/loss": float(loss)}

    def validation(self, dataset):
        # Delegate to the dataset if it knows how to evaluate embeddings.
        if hasattr(dataset, "validation"):
            return dataset.validation(self.student)
        return {}

    @property
    def state(self):
        return {"params": self.params, "opt_state": self.opt_state,
                "epoch": self.epoch}

    def set_state(self, state, model_only: bool = False):
        self.params = state["params"]
        if self._param_shard is not None:
            self.params = jax.device_put(self.params, self._param_shard)
        self.student.params = self.params
        if not model_only:
            self.opt_state = state["opt_state"]
            self.epoch = int(state["epoch"])

    def save_model(self, save_dir: str):
        from tfimm_tpu.models.serialization import save_model

        self.student.params = self.params
        save_model(self.student, save_dir)
