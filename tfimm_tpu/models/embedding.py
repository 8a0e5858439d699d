"""EmbeddingModel: backbone + no-scale-BN embedding head for metric learning
(reference: tfimm/models/embedding_model.py:5-47)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfimm_tpu.core import Context
from tfimm_tpu.ops.basic import Dense
from tfimm_tpu.ops.norm import BatchNorm

__all__ = ["EmbeddingModel"]


class EmbeddingModel:
    """Wraps any backbone with Dense(embed_dim) -> BatchNorm(scale=False)."""

    def __init__(self, backbone, embed_dim: int):
        self.backbone = backbone
        self.embed_dim = embed_dim
        in_features = getattr(backbone, "nb_features", None)
        if in_features is None:
            in_features = backbone.cfg.embed_dim
        self.fc = Dense(in_features, embed_dim)
        self.bn = BatchNorm(embed_dim, use_scale=False)
        self.params = None
        if backbone.params is not None:
            self.init(0)

    @property
    def dummy_inputs(self):
        return self.backbone.dummy_inputs

    def init(self, rng=0):
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        r1, r2 = jax.random.split(rng)
        backbone_params = (self.backbone.params
                           if self.backbone.params is not None
                           else self.backbone.init_params(rng))
        self.params = {
            "backbone": backbone_params,
            "fc": self.fc.init(r1),
            "bn": self.bn.init(r2),
        }
        return self.params

    def apply(self, params, x, *, training=False, rng=None,
              return_features=False, mutable=False):
        ctx = Context(training=training, rng=rng, capture_features=return_features)
        ctx.index_params(params)
        with ctx:
            x = self.backbone.forward_features(params["backbone"], x)
            if x.ndim == 4:  # CNN feature maps: global-pool before the head
                x = x.mean(axis=(1, 2))
            x = self.fc(params["fc"], x)
            x = self.bn(params["bn"], x)
            ctx.capture("embeddings", x)
        results = (x,)
        if return_features:
            results += (ctx.features,)
        if mutable:
            results += (ctx.collect_state_updates() if ctx.has_state_updates else {},)
        return results if len(results) > 1 else x

    def __call__(self, x, *, params=None, **kwargs):
        params = params if params is not None else self.params
        return self.apply(params, x, **kwargs)

    # -- serialization (custom: nests the backbone config) ----------------------
    def save(self, path: str) -> None:
        import dataclasses
        import json
        import os

        import numpy as np

        from tfimm_tpu.utils.tree import flatten_params

        os.makedirs(path, exist_ok=True)
        payload = {
            "class_name": "EmbeddingModel",
            "embed_dim": self.embed_dim,
            "backbone_class": type(self.backbone).__name__,
            "backbone_config": dataclasses.asdict(self.backbone.cfg),
        }
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(payload, f, indent=2, default=str)
        flat = {k: np.asarray(v) for k, v in flatten_params(self.params).items()}
        np.savez(os.path.join(path, "params.npz"), **flat)

    @classmethod
    def load(cls, path: str) -> "EmbeddingModel":
        import json
        import os

        import numpy as np

        import tfimm_tpu.architectures  # noqa: F401
        from tfimm_tpu.models.registry import architecture_class
        from tfimm_tpu.models.serialization import _tuplify
        from tfimm_tpu.utils.tree import unflatten_params

        with open(os.path.join(path, "config.json")) as f:
            payload = json.load(f)
        backbone_cls = architecture_class(payload["backbone_class"])
        cfg_kwargs = {k: _tuplify(v) for k, v in payload["backbone_config"].items()}
        backbone = backbone_cls(backbone_cls.cfg_class(**cfg_kwargs))
        model = cls(backbone, payload["embed_dim"])
        with np.load(os.path.join(path, "params.npz")) as data:
            model.params = unflatten_params(
                {k: jnp.asarray(data[k]) for k in data.files})
        model.backbone.params = model.params["backbone"]
        return model
