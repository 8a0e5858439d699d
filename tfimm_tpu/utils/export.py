"""Deployment export via jax.export (the SavedModel replacement).

The reference's problems export a float32 SavedModel inference graph with
embedded preprocessing and normalized logits
(tfimm/train/problems/classification.py:202-247). Here the analog is a
serialized StableHLO artifact: preprocessing + forward (+ optional softmax)
are closed over the trained parameters and exported as one portable function
that any JAX (or XLA-compatible) runtime can execute.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_model", "load_exported", "ExportedModel"]


def export_model(
    model,
    path: str,
    *,
    batch_size: Optional[int] = None,
    preprocessing=None,
    normalize_logits: bool = False,
    dtype=jnp.float32,
) -> None:
    """Export an inference function ``uint8/float image batch -> logits``.

    ``batch_size=None`` exports with a symbolic (polymorphic) batch dimension.
    """
    if preprocessing is None:
        from tfimm_tpu.models.factory import create_preprocessing

        preprocessing = create_preprocessing(model.cfg.name)
    params = jax.tree.map(lambda x: x, model.params)  # freeze current values

    def infer(images):
        x = preprocessing(images).astype(dtype)
        out = model.apply(params, x, training=False)
        out = out[0] if isinstance(out, tuple) else out
        out = out.astype(jnp.float32)
        if normalize_logits:
            out = jax.nn.log_softmax(out, axis=-1)
        return out

    h, w = model.cfg.input_size
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, h, w, model.cfg.in_channels),
                                    jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, h, w, model.cfg.in_channels),
                                    jnp.float32)
    exported = jax_export.export(jax.jit(infer))(spec)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())


class ExportedModel:
    """Thin callable around a deserialized export."""

    def __init__(self, exported):
        self._exported = exported

    def __call__(self, images):
        return self._exported.call(jnp.asarray(images, jnp.float32))


def load_exported(path: str) -> ExportedModel:
    with open(path, "rb") as f:
        return ExportedModel(jax_export.deserialize(f.read()))
