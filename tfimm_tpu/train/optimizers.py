"""Optimizers and LR schedules (reference: tfimm/train/optimizers/*, 291 LoC).

optax-based re-implementation: the same config surface (sgd/adam/rmsprop/
adamax/adadelta/adagrad/adamw + clipnorm/clipvalue + epoch-denominated
schedules + linear warmup). TPU note: bf16 mixed precision needs no loss
scaling (bf16 shares float32's exponent range), so the reference's
LossScaleOptimizer has no counterpart here — problems simply run compute in
bf16 and keep params/optimizer state in f32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import optax

from tfimm_tpu.train.registry import cfg_serializable, get_class

__all__ = ["OptimizerConfig", "OptimizerFactory", "LRConstFactory",
           "LRMultiStepsFactory", "LRCosineDecayFactory", "LRExpDecayFactory"]


@dataclass
class OptimizerConfig:
    lr_schedule: Any = None
    lr_schedule_class: str = ""
    lr_warmup: int = -1  # epochs of linear warmup; -1 disables
    optimizer: str = "sgd"
    betas: tuple = (0.9, 0.999)
    weight_decay: float = 0.0  # decoupled decay (adamw); 0 disables
    clipnorm: float = -1.0
    clipvalue: float = -1.0
    # Average gradients over N micro-steps before applying one update
    # (optax.MultiSteps). TPU-relevant: large effective batches beyond HBM.
    accum_steps: int = 1
    epsilon: float = 1e-7
    rho: float = 0.95
    initial_accumulator_value: float = 0.1


@cfg_serializable
class OptimizerFactory:
    cfg_class = OptimizerConfig

    def __init__(self, cfg: OptimizerConfig, timekeeping,
                 mixed_precision: bool = False):
        self.cfg = cfg
        self.timekeeping = timekeeping
        self.mixed_precision = mixed_precision  # informational on TPU (bf16)

    def lr_schedule(self):
        """Returns an optax schedule fn: step -> learning rate."""
        schedule = get_class(self.cfg.lr_schedule_class)(
            cfg=self.cfg.lr_schedule, timekeeping=self.timekeeping
        )()
        if self.cfg.lr_warmup != -1:
            warmup_steps = (self.cfg.lr_warmup
                            * self.timekeeping.nb_steps_per_epoch)
            base = schedule
            warmup = optax.linear_schedule(0.0, base(0), warmup_steps)
            schedule = optax.join_schedules(
                [warmup, lambda step: base(step + warmup_steps)],
                boundaries=[warmup_steps],
            )
        return schedule

    def optimizer(self, lr) -> optax.GradientTransformation:
        cfg = self.cfg
        if cfg.clipnorm != -1.0 and cfg.clipvalue != -1.0:
            raise ValueError("clipnorm and clipvalue cannot both be used.")

        if cfg.optimizer == "sgd":
            tx = optax.sgd(lr, momentum=cfg.betas[0] or None)
        elif cfg.optimizer == "adam":
            tx = optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1],
                            eps=cfg.epsilon)
        elif cfg.optimizer == "adamw":
            tx = optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1],
                             eps=cfg.epsilon, weight_decay=cfg.weight_decay)
        elif cfg.optimizer == "rmsprop":
            tx = optax.rmsprop(lr, decay=cfg.betas[0], momentum=cfg.betas[1],
                               eps=cfg.epsilon)
        elif cfg.optimizer == "adamax":
            tx = optax.adamax(lr, b1=cfg.betas[0], b2=cfg.betas[1],
                              eps=cfg.epsilon)
        elif cfg.optimizer == "adadelta":
            tx = optax.adadelta(lr, rho=cfg.rho, eps=cfg.epsilon)
        elif cfg.optimizer == "adagrad":
            tx = optax.adagrad(
                lr, initial_accumulator_value=cfg.initial_accumulator_value,
                eps=cfg.epsilon)
        else:
            raise ValueError(f"Unknown optimizer: {cfg.optimizer}")

        if cfg.clipnorm != -1.0:
            tx = optax.chain(optax.clip_by_global_norm(cfg.clipnorm), tx)
        elif cfg.clipvalue != -1.0:
            tx = optax.chain(optax.clip(cfg.clipvalue), tx)
        if cfg.accum_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
        return tx

    def __call__(self) -> Tuple[optax.GradientTransformation, Any]:
        schedule = self.lr_schedule()
        return self.optimizer(schedule), schedule


# -- schedules (epoch-denominated via Timekeeping) ------------------------------

@dataclass
class LRConstConfig:
    lr: float = 0.01


@cfg_serializable
class LRConstFactory:
    cfg_class = LRConstConfig

    def __init__(self, cfg, timekeeping):
        self.cfg = cfg
        self.timekeeping = timekeeping

    def __call__(self):
        return optax.constant_schedule(self.cfg.lr)


@dataclass
class LRMultiStepsConfig:
    lr_boundaries: tuple = ()  # in epochs
    lr_values: tuple = ()


@cfg_serializable
class LRMultiStepsFactory:
    cfg_class = LRMultiStepsConfig

    def __init__(self, cfg, timekeeping):
        self.cfg = cfg
        self.timekeeping = timekeeping

    def __call__(self):
        steps_per_epoch = self.timekeeping.nb_steps_per_epoch
        boundaries_and_scales = {}
        values = list(self.cfg.lr_values)
        for epoch, (prev, new) in zip(self.cfg.lr_boundaries,
                                      zip(values[:-1], values[1:])):
            boundaries_and_scales[epoch * steps_per_epoch] = new / prev
        return optax.piecewise_constant_schedule(values[0],
                                                 boundaries_and_scales)


@dataclass
class LRCosineDecayConfig:
    lr: float = 0.01
    alpha: float = 0.0


@cfg_serializable
class LRCosineDecayFactory:
    cfg_class = LRCosineDecayConfig

    def __init__(self, cfg, timekeeping):
        self.cfg = cfg
        self.timekeeping = timekeeping

    def __call__(self):
        return optax.cosine_decay_schedule(
            self.cfg.lr, decay_steps=self.timekeeping.nb_steps,
            alpha=self.cfg.alpha)


@dataclass
class LRExpDecayConfig:
    lr: float = 0.01
    lr_decay_rate: float = 0.97
    lr_decay_frequency: int = 1  # in epochs
    staircase: bool = True


@cfg_serializable
class LRExpDecayFactory:
    cfg_class = LRExpDecayConfig

    def __init__(self, cfg, timekeeping):
        self.cfg = cfg
        self.timekeeping = timekeeping

    def __call__(self):
        return optax.exponential_decay(
            self.cfg.lr,
            transition_steps=(self.cfg.lr_decay_frequency
                              * self.timekeeping.nb_steps_per_epoch),
            decay_rate=self.cfg.lr_decay_rate,
            staircase=self.cfg.staircase,
        )
