"""Model save/load (reference: tfimm/models/serialization.py:21-89).

The reference's ``keras_serializable`` round-trips the dataclass config through
Keras SavedModel machinery. Here a saved model is a directory with
``config.json`` (dataclass fields + class name) and ``params.npz`` (flattened
parameter pytree). ``load_model`` restores the exact architecture class via the
registry, so the round trip preserves class identity and outputs exactly.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from tfimm_tpu.utils.tree import flatten_params, unflatten_params

__all__ = ["save_model", "load_model"]

_CONFIG_FILE = "config.json"
_PARAMS_FILE = "params.npz"


def save_model(model, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    cfg = model.cfg
    payload = {
        "class_name": type(model).__name__,
        "config_class": type(cfg).__name__,
        "config": dataclasses.asdict(cfg),
        "format_version": 1,
    }
    with open(os.path.join(path, _CONFIG_FILE), "w") as f:
        json.dump(payload, f, indent=2, default=str)
    flat = {k: np.asarray(v) for k, v in flatten_params(model.params).items()}
    np.savez(os.path.join(path, _PARAMS_FILE), **flat)


def _tuplify(x):
    if isinstance(x, list):
        return tuple(_tuplify(v) for v in x)
    return x


def load_model(path: str):
    # Importing architectures fills the class registry.
    import tfimm_tpu.architectures  # noqa: F401
    from tfimm_tpu.models.registry import architecture_class

    with open(os.path.join(path, _CONFIG_FILE)) as f:
        payload = json.load(f)
    cls = architecture_class(payload["class_name"])
    if cls is None:
        raise ValueError(f"Unknown architecture class: {payload['class_name']}")
    cfg_cls = cls.cfg_class
    fields = {f.name for f in dataclasses.fields(cfg_cls)}
    cfg_kwargs = {k: _tuplify(v) for k, v in payload["config"].items() if k in fields}
    cfg = cfg_cls(**cfg_kwargs)

    with np.load(os.path.join(path, _PARAMS_FILE)) as data:
        flat = {k: jnp.asarray(data[k]) for k in data.files}
    model = cls(cfg)
    model.params = unflatten_params(flat)
    return model
