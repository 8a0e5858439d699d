"""Model factory (reference: tfimm/models/factory.py:18-305).

``create_model`` resolves pretrained weights (explicit ``model_path`` → local
cache → URL-prefix conversion ``[timm]`` / ``[pytorch]`` / ``[hf-pytorch]``),
applies kwargs overrides to the config, and — if the config changed — rebuilds
the model and transfers weights with classifier / first-conv /
``transform_weights`` surgery on the parameter pytree.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, List, Optional, Union

import jax.numpy as jnp
import numpy as np

from tfimm_tpu.models.registry import is_model, model_class, model_config
from tfimm_tpu.utils.cache import cached_model_path
from tfimm_tpu.utils.tree import flatten_params, unflatten_params

__all__ = ["create_model", "create_preprocessing", "transfer_weights"]

logger = logging.getLogger(__name__)


def create_model(
    model_name: str,
    pretrained: Union[bool, str] = False,
    model_path: str = "",
    *,
    rng: int = 0,
    dtype=None,
    **kwargs,
):
    """Create a model, optionally with pretrained weights.

    Args:
        model_name: Registered model name.
        pretrained: ``True`` → resolve via cache then ``cfg.url``; ``"timm"`` →
            force conversion from timm (requires torch+timm installed).
        model_path: Load a model saved via ``tfimm_tpu.save_model`` from this
            path (takes precedence over ``pretrained``).
        rng: Integer seed for parameter initialization.
        dtype: Optional dtype to cast float params to (e.g. ``jnp.bfloat16``).
        **kwargs: Config-field overrides (e.g. ``nb_classes=10``).

    Returns:
        A ``Model`` instance carrying its parameter pytree in ``model.params``.
    """
    from tfimm_tpu.models.serialization import load_model

    if not is_model(model_name):
        raise ValueError(f"Unknown model: {model_name}")
    cls = model_class(model_name)
    cfg = model_config(model_name)

    loaded_model = None
    if model_path:
        loaded_model = load_model(model_path)
    elif pretrained:
        cache_path = None if pretrained == "timm" else cached_model_path(model_name)
        if cache_path:
            loaded_model = load_model(cache_path)
        else:
            loaded_model = _load_pretrained(cls, cfg)

    # Apply kwargs overrides to config.
    field_names = {f.name for f in dataclasses.fields(cfg)}
    for key in kwargs:
        if key not in field_names:
            raise ValueError(
                f"{type(cfg).__name__} has no field {key!r}; valid fields: "
                f"{sorted(field_names)}"
            )
    cfg = dataclasses.replace(cfg, **kwargs)

    if loaded_model is not None and loaded_model.cfg == cfg:
        model = loaded_model
    else:
        model = cls(cfg)
        model.init(rng)
        if loaded_model is not None:
            transfer_weights(loaded_model, model)

    if dtype is not None:
        model.cast(dtype)
    return model


def _load_pretrained(cls, cfg):
    """Build a model from ``cfg.url`` by converting a PyTorch checkpoint."""
    from tfimm_tpu.utils.pt_convert import (
        load_hf_pytorch_weights,
        load_pth_url_weights,
        load_timm_weights,
    )

    url = cfg.url
    if not url:
        raise ValueError(
            f"Model {cfg.name} has no pretrained weights URL; pass "
            f"pretrained=False or provide model_path."
        )
    model = cls(cfg)
    model.init(0)
    if url.startswith("[timm]"):
        timm_name = url[len("[timm]"):] or cfg.name
        load_timm_weights(model, timm_name)
    elif url.startswith("[pytorch]"):
        load_pth_url_weights(model, url[len("[pytorch]"):])
    elif url.startswith("[hf-pytorch]"):
        load_hf_pytorch_weights(model, url[len("[hf-pytorch]"):])
    else:
        raise ValueError(f"Cannot interpret url: {url}")
    return model


def create_preprocessing(
    model_name: str,
    *,
    in_channels: Optional[int] = None,
    dtype=None,
) -> Callable:
    """Return ``img -> (img/255 - mean)/std`` for the given model.

    Input values are assumed in range [0, 255]; mean/std vectors are adapted to
    ``in_channels`` by tiling (reference: factory.py:128-171).
    """
    if not is_model(model_name):
        raise ValueError(f"Unknown model: {model_name}")
    cfg = model_config(model_name)
    dtype = dtype or jnp.float32

    def _adapt_vector(v, n):
        v = np.asarray(v, dtype=np.float32)
        reps = n // len(v) + 1
        return jnp.asarray(np.tile(v, reps)[:n], dtype=dtype)

    n = in_channels or cfg.in_channels
    mean = _adapt_vector(getattr(cfg, "mean", (0.485, 0.456, 0.406)), n)
    std = _adapt_vector(getattr(cfg, "std", (0.229, 0.224, 0.225)), n)

    def _preprocess(img):
        img = jnp.asarray(img).astype(dtype) / 255.0
        return (img - mean) / std

    return _preprocess


def transfer_weights(src_model, dst_model,
                     weights_to_ignore: Optional[List[str]] = None) -> None:
    """Copy weights from ``src_model.params`` into ``dst_model.params``.

    Special cases (reference: factory.py:174-305):
    - classifier params (paths under ``cfg.classifier``) copied only when
      ``nb_classes`` match, otherwise dst keeps its fresh initialization;
    - ``cfg.first_conv`` kernels adapted when ``in_channels`` differ (sum to 1
      channel; tile + rescale above the source channel count);
    - ``cfg.transform_weights`` hooks ``fn(src_model, weight, dst_cfg)`` for
      shape-dependent params (e.g. position-embedding interpolation).
    """
    from tfimm_tpu.quant import is_quantized

    if is_quantized(src_model.params):
        # Quantized trees store kernel_q/kernel_scale, not kernel — the
        # name-matched copy below would silently keep every destination
        # kernel at its fresh initialization.
        raise ValueError(
            "transfer_weights does not support int8-quantized source "
            "params; transfer the float params, then quantize_int8 the "
            "destination.")
    src_flat = flatten_params(src_model.params)
    dst_flat = flatten_params(dst_model.params)
    ignore = set(weights_to_ignore or [])

    cfg = dst_model.cfg
    classifier = getattr(cfg, "classifier", None) or ()
    if isinstance(classifier, str):
        classifier = (classifier,)
    first_conv = getattr(cfg, "first_conv", None)
    transforms = dict(getattr(cfg, "transform_weights", {}) or {})
    same_classes = getattr(src_model.cfg, "nb_classes", None) == getattr(
        cfg, "nb_classes", None
    )

    def under(path, prefix):
        return path == prefix or path.startswith(prefix + ".")

    new_flat = {}
    for path, dst_val in dst_flat.items():
        if path in ignore or path not in src_flat:
            new_flat[path] = dst_val
            continue
        src_val = src_flat[path]
        if any(under(path, c) for c in classifier):
            new_flat[path] = src_val if same_classes else dst_val
        elif path in transforms:
            new_flat[path] = jnp.asarray(
                transforms[path](src_model, src_val, cfg), dtype=dst_val.dtype
            )
        elif first_conv and under(path, first_conv) and src_val.shape != dst_val.shape:
            new_flat[path] = _transform_first_conv(src_val, cfg.in_channels)
        else:
            if src_val.shape != dst_val.shape:
                raise ValueError(
                    f"Shape mismatch transferring {path}: src {src_val.shape} vs "
                    f"dst {dst_val.shape} and no transform hook registered."
                )
            new_flat[path] = src_val
        new_flat[path] = jnp.asarray(new_flat[path], dtype=dst_val.dtype)

    dst_model.params = unflatten_params(new_flat)


def _transform_first_conv(weight, in_channels: int):
    """Adapt an HWIO conv kernel to a new input-channel count."""
    if weight.ndim != 4:  # biases don't depend on input channels
        return weight
    src_channels = weight.shape[2]
    if in_channels == src_channels:
        return weight
    if in_channels == 1:
        # Sum (not average) to preserve activation statistics.
        return weight.sum(axis=2, keepdims=True)
    reps = in_channels // src_channels + 1
    weight = jnp.tile(weight, (1, 1, reps, 1))[:, :, :in_channels, :]
    return weight * (src_channels / in_channels)
