"""LoRA factory (reference: tfimm/architectures/lora/factory.py:17-281).

Because models are parameter pytrees, LoRA becomes tree transformations:
merging folds ``scaling * A @ B`` into kernels; trainability is expressed as a
boolean mask pytree for ``optax.masked`` (the JAX-native replacement for the
reference's trainable_weights variable lists).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp

from tfimm_tpu.architectures.lora.layers import LORA_WEIGHT_NAMES
from tfimm_tpu.architectures.lora.registry import (
    lora_architecture,
    lora_base_architecture,
    lora_config,
)
from tfimm_tpu.models.factory import create_model as create_full_model
from tfimm_tpu.models.factory import transfer_weights
from tfimm_tpu.models.registry import model_class
from tfimm_tpu.utils.tree import flatten_params, unflatten_params

__all__ = ["create_model", "convert_to_lora_model", "convert_to_regular_model",
           "merge_lora_weights", "lora_trainable_weights",
           "lora_non_trainable_weights", "lora_trainable_mask"]


def create_model(model_name: str, pretrained=False, model_path: str = "",
                 **kwargs):
    """Create a LoRA model from a registered model name. ``lora_*`` kwargs go
    into the LoRA config; everything else configures the base model."""
    cls = model_class(model_name)
    lora_cls = lora_architecture(cls)
    lora_cfg_cls = lora_config(cls)

    full_kwargs = {k: v for k, v in kwargs.items() if not k.startswith("lora_")}
    lora_kwargs = {k: v for k, v in kwargs.items() if k.startswith("lora_")}
    full_model = create_full_model(model_name, pretrained=pretrained,
                                   model_path=model_path, **full_kwargs)
    lora_cfg = lora_cfg_cls(**dataclasses.asdict(full_model.cfg), **lora_kwargs)
    model = lora_cls(lora_cfg)
    model.init(0)
    # LoRA factors are absent from the source, so they keep their fresh init
    # (A random, B zero => identity update).
    transfer_weights(full_model, model)
    return model


def convert_to_lora_model(model, **kwargs):
    """Create the LoRA version of an existing model, transferring weights."""
    lora_cls = lora_architecture(type(model))
    lora_cfg_cls = lora_config(type(model))
    cfg_dict = dataclasses.asdict(model.cfg)
    cfg_dict.update(kwargs)
    lora_cfg = lora_cfg_cls(**cfg_dict)
    lora_model = lora_cls(lora_cfg)
    lora_model.init(0)
    transfer_weights(model, lora_model)
    return lora_model


def _lora_scaling(model) -> float:
    return model.cfg.lora_alpha / model.cfg.lora_rank


def merge_lora_weights(model):
    """Return a parameter tree with low-rank updates folded into kernels.

    Unlike the reference (which mutates Keras variables in place and tracks a
    ``merged`` flag), this is a pure function; ``model.params`` is unchanged.
    """
    scaling = _lora_scaling(model)
    flat = flatten_params(model.params)
    out = dict(flat)
    for path in flat:
        if path.endswith("kernel_lora_a"):
            prefix = path[: -len("kernel_lora_a")]
            a, b = flat[path], flat[prefix + "kernel_lora_b"]
            kernel = flat[prefix + "kernel"]
            out[prefix + "kernel"] = kernel + scaling * jnp.matmul(a, b).astype(
                kernel.dtype)
    return unflatten_params(out)


def convert_to_regular_model(model):
    """LoRA model -> base model with merged weights."""
    base_cls = lora_base_architecture(type(model))
    base_cfg_cls = base_cls.cfg_class
    base_fields = {f.name for f in dataclasses.fields(base_cfg_cls)}
    base_cfg_dict = {k: v for k, v in dataclasses.asdict(model.cfg).items()
                     if k in base_fields and not k.startswith("lora_")}
    base_cfg = base_cfg_cls(**base_cfg_dict)
    base_model = base_cls(base_cfg)
    base_model.init(0)

    merged_flat = flatten_params(merge_lora_weights(model))
    base_flat = flatten_params(base_model.params)
    base_model.params = unflatten_params(
        {k: merged_flat[k] for k in base_flat}
    )
    return base_model


def _classify_paths(model, train_bias: str = "none",
                    trainable_layers: Optional[List[str]] = None):
    if train_bias not in {"none", "all", "lora_only"}:
        raise ValueError(f"Unknown value for train_bias: {train_bias}.")
    trainable_layers = trainable_layers or []
    flat = flatten_params(model.params)
    lora_dirs = {p[: -len("kernel_lora_a")] for p in flat
                 if p.endswith("kernel_lora_a")}

    def is_trainable(path: str) -> bool:
        head, _, leaf = path.rpartition(".")
        if leaf in LORA_WEIGHT_NAMES:
            return True
        if leaf == "bias":
            if train_bias == "all":
                return True
            if train_bias == "lora_only" and (head + ".") in lora_dirs:
                return True
        for layer in trainable_layers:
            if path == layer or path.startswith(layer + "."):
                return True
        return False

    return {path: is_trainable(path) for path in flat}


def lora_trainable_weights(model, train_bias: str = "none",
                           trainable_layers: Optional[List[str]] = None):
    """List of trainable parameter paths for LoRA fine-tuning."""
    cls = _classify_paths(model, train_bias, trainable_layers)
    return sorted(p for p, t in cls.items() if t)


def lora_non_trainable_weights(model, train_bias: str = "none",
                               trainable_layers: Optional[List[str]] = None):
    cls = _classify_paths(model, train_bias, trainable_layers)
    return sorted(p for p, t in cls.items() if not t)


def lora_trainable_mask(model, train_bias: str = "none",
                        trainable_layers: Optional[List[str]] = None):
    """Boolean pytree matching ``model.params`` for ``optax.masked`` /
    ``optax.multi_transform``."""
    cls = _classify_paths(model, train_bias, trainable_layers)
    return unflatten_params(cls)


def lora_optimizer(tx, model, train_bias: str = "none",
                   trainable_layers: Optional[List[str]] = None):
    """Wrap an optax transform so only LoRA-trainable params update; all other
    gradients are zeroed (note: bare ``optax.masked`` would pass them through)."""
    import optax

    mask = lora_trainable_mask(model, train_bias, trainable_layers)
    labels = unflatten_params({
        k: ("train" if v else "freeze")
        for k, v in flatten_params(mask).items()
    })
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()},
                                 labels)
