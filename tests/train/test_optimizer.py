"""Optimizer x schedule grid smoke test (reference:
tests/train/test_optimizer.py:45-85): run real optimization steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tfimm_tpu.train.optimizers import (
    LRConstConfig,
    LRCosineDecayConfig,
    LRExpDecayConfig,
    LRMultiStepsConfig,
    OptimizerConfig,
    OptimizerFactory,
)
from tfimm_tpu.train.timekeeping import Timekeeping

TK = Timekeeping(nb_epochs=4, batch_size=2, nb_samples_per_epoch=8)

SCHEDULES = [
    ("LRConstFactory", LRConstConfig(lr=0.1)),
    ("LRMultiStepsFactory", LRMultiStepsConfig(lr_boundaries=(2,),
                                               lr_values=(0.1, 0.01))),
    ("LRCosineDecayFactory", LRCosineDecayConfig(lr=0.1)),
    ("LRExpDecayFactory", LRExpDecayConfig(lr=0.1, lr_decay_rate=0.9,
                                           lr_decay_frequency=1)),
]

OPTIMIZERS = ["sgd", "adam", "adamw", "rmsprop", "adamax", "adadelta",
              "adagrad"]


@pytest.mark.parametrize("optimizer", OPTIMIZERS)
@pytest.mark.parametrize("schedule_class,schedule_cfg", SCHEDULES[:1])
def test_optimizers_minimize(optimizer, schedule_class, schedule_cfg):
    _run_steps(optimizer, schedule_class, schedule_cfg)


@pytest.mark.parametrize("schedule_class,schedule_cfg", SCHEDULES)
@pytest.mark.parametrize("warmup", [-1, 1])
def test_schedules_minimize(schedule_class, schedule_cfg, warmup):
    _run_steps("sgd", schedule_class, schedule_cfg, warmup)


def _run_steps(optimizer, schedule_class, schedule_cfg, warmup=-1):
    # rmsprop interprets betas as (decay, momentum); 0.999 momentum diverges.
    betas = (0.9, 0.0) if optimizer == "rmsprop" else (0.9, 0.999)
    cfg = OptimizerConfig(
        lr_schedule=schedule_cfg, lr_schedule_class=schedule_class,
        lr_warmup=warmup, optimizer=optimizer, betas=betas,
    )
    tx, schedule = OptimizerFactory(cfg, TK)()
    params = {"w": jnp.asarray([2.0, -3.0])}
    opt_state = tx.init(params)

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"]))

    loss0 = float(loss_fn(params))
    for _ in range(10):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    assert float(loss_fn(params)) < loss0
    # schedule produces finite values
    assert np.isfinite(float(schedule(0))) and np.isfinite(float(schedule(15)))


def test_clipnorm_and_clipvalue_exclusive():
    cfg = OptimizerConfig(lr_schedule=LRConstConfig(0.1),
                          lr_schedule_class="LRConstFactory",
                          clipnorm=1.0, clipvalue=1.0)
    with pytest.raises(ValueError):
        OptimizerFactory(cfg, TK)()


def test_warmup_ramps_lr():
    cfg = OptimizerConfig(lr_schedule=LRConstConfig(lr=0.5),
                          lr_schedule_class="LRConstFactory", lr_warmup=1)
    _, schedule = OptimizerFactory(cfg, TK)()
    assert float(schedule(0)) < 0.5 / 4
    assert abs(float(schedule(100)) - 0.5) < 1e-6


def test_gradient_accumulation_matches_large_batch():
    """accum_steps=2 on half-batches == one step on the full batch (SGD)."""
    import jax

    cfg = OptimizerConfig(lr_schedule=LRConstConfig(lr=0.1),
                          lr_schedule_class="LRConstFactory",
                          optimizer="sgd", betas=(0.0, 0.0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)))

    def loss_fn(p, batch):
        return jnp.mean((batch @ p) ** 2)

    p0 = jnp.asarray(np.random.default_rng(1).normal(size=(3,)))

    # accumulated: two micro-steps of 2 samples
    tx, _ = OptimizerFactory(
        OptimizerConfig(**{**cfg.__dict__, "accum_steps": 2}), TK)()
    state = tx.init(p0)
    p = p0
    for mb in (x[:2], x[2:]):
        g = jax.grad(loss_fn)(p, mb)
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)

    # reference: one step on all 4 samples (grads averaged over micro-steps)
    tx2, _ = OptimizerFactory(cfg, TK)()
    state2 = tx2.init(p0)
    g = jax.grad(loss_fn)(p0, x)
    updates2, _ = tx2.update(g, state2, p0)
    p_ref = optax.apply_updates(p0, updates2)

    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref),
                               atol=1e-6, rtol=1e-6)
