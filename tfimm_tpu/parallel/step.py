"""Sharded train/eval steps.

One jit-compiled function per step: forward (+ softmax CE), backward, optax
update, batch-stat merge — all inside a single XLA graph over the mesh. Batch
is sharded over "data"; params follow the sharding tree from
``infer_param_sharding`` (replicated or Megatron-TP over "model"). XLA inserts
the gradient all-reduces implied by the shardings; nothing here calls a
collective explicitly. This is the TPU-native successor to the reference's
``SingleGPUTrainer`` inner step (tfimm/train/problems/classification.py:102-131).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from tfimm_tpu.parallel.sharding import batch_sharding, infer_param_sharding, replicated
from tfimm_tpu.utils.tree import flatten_params, unflatten_params

__all__ = ["make_train_step", "make_eval_step", "merge_state_updates",
           "opt_state_sharding"]


def opt_state_sharding(tx, params, param_sharding, mesh):
    """Shardings for ``tx.init(params)``: param-shaped leaves (Adam moments,
    momentum buffers) inherit the matching parameter's sharding; everything
    else (step counters) is replicated. With an FSDP param sharding this gives
    ZeRO partitioning of the optimizer state for free."""
    shapes = jax.eval_shape(tx.init, params)
    return optax.tree_map_params(
        tx,
        lambda _, s: s,
        shapes,
        param_sharding,
        transform_non_params=lambda _: replicated(mesh),
    )


def merge_state_updates(params, updates):
    """Overlay batch-stat updates (a sparse subtree) onto the param tree."""
    if not updates:
        return params
    flat = flatten_params(params)
    flat.update(flatten_params(updates))
    return unflatten_params(flat)


def cross_entropy_loss(logits, labels, label_smoothing: float = 0.0):
    if logits.ndim == 3:  # distilled models: (B, 2, C) -> mean over heads
        logits = logits.mean(axis=1)
    if labels.ndim == logits.ndim:  # soft targets (mixup/cutmix/smoothing)
        return optax.softmax_cross_entropy(logits, labels).mean()
    if label_smoothing:
        nb_classes = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, nb_classes)
        onehot = onehot * (1 - label_smoothing) + label_smoothing / nb_classes
        return optax.softmax_cross_entropy(logits, onehot).mean()
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh=None,
    *,
    loss_fn: Optional[Callable] = None,
    weight_decay: float = 0.0,
    param_sharding=None,
    remat: bool = False,
):
    """Build a jitted, mesh-sharded training step.

    Returns ``step(params, opt_state, batch, rng) ->
    (params, opt_state, metrics)`` where ``batch = (images, labels)``.
    ``remat=True`` rematerializes the forward pass during backprop
    (jax.checkpoint), trading ~1/3 more FLOPs for activation memory — the
    TPU-idiomatic way to fit larger batches in HBM.
    """
    loss_fn = loss_fn or cross_entropy_loss

    def forward(params, images, rng):
        return model.apply(params, images, training=True, rng=rng,
                           mutable=True)

    if remat:
        forward = jax.checkpoint(forward)

    def compute_loss(params, images, labels, rng):
        out = forward(params, images, rng)
        logits, updates = out if isinstance(out, tuple) else (out, {})
        loss = loss_fn(logits.astype(jnp.float32), labels)
        if weight_decay:
            l2 = sum(jnp.sum(jnp.square(w)) for k, w in
                     flatten_params(params).items() if k.endswith("kernel"))
            loss = loss + weight_decay * l2
        return loss, (logits, updates)

    def step(params, opt_state, batch, rng):
        images, labels = batch
        (loss, (logits, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(params, images, labels, rng)
        grad_updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, grad_updates)
        params = merge_state_updates(params, updates)
        preds = (logits.mean(axis=1) if logits.ndim == 3 else logits).argmax(-1)
        hard = labels.argmax(-1) if labels.ndim == preds.ndim + 1 else labels
        metrics = {"loss": loss, "accuracy": (preds == hard).mean()}
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step)

    p_shard = param_sharding if param_sharding is not None else (
        infer_param_sharding(model.params, mesh)
    )
    # Optimizer state follows the param shardings (Adam moments live wherever
    # their parameter lives); counters etc. are replicated.
    opt_sharding = opt_state_sharding(tx, model.params, p_shard, mesh)
    b_shard = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(p_shard, opt_sharding, (b_shard, b_shard), replicated(mesh)),
        out_shardings=(p_shard, opt_sharding, replicated(mesh)),
    )


def make_eval_step(model, mesh=None):
    def step(params, images):
        return model.apply(params, images, training=False)

    if mesh is None:
        return jax.jit(step)
    p_shard = infer_param_sharding(model.params, mesh)
    return jax.jit(
        step,
        in_shardings=(p_shard, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )
