"""Model base class.

A tfimm_tpu model is a *stateless* description of an architecture: the class
holds a config and layer objects (plain Python, no arrays); parameters live in
an external pytree. For convenience the instance can carry a default parameter
tree (``model.params``) so it can be called like the reference's Keras models
(``model(img)``), but all computation flows through the pure ``apply``.

Reference counterpart: the ``@keras_serializable tf.keras.Model`` pattern with
``cfg_class`` / ``dummy_inputs`` / ``forward_features`` / ``call`` described in
SURVEY.md §2.3 (e.g. tfimm/architectures/vit.py:299-476).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tfimm_tpu.core import Context
from tfimm_tpu.utils.tree import count_params, tree_cast

__all__ = ["Model"]


class Model:
    cfg_class: type = None

    def __init__(self, cfg, params: Optional[Dict] = None):
        self.cfg = cfg
        self.params = params

    # -- subclass interface ---------------------------------------------------
    def init_params(self, rng: jax.Array) -> Dict:
        raise NotImplementedError

    def forward(self, params: Dict, x: jax.Array) -> jax.Array:
        """Full forward pass (features + head). Runs inside a Context."""
        raise NotImplementedError

    def forward_features(self, params: Dict, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    @property
    def feature_names(self) -> Tuple[str, ...]:
        return ()

    # -- generic machinery ------------------------------------------------------
    @property
    def dummy_inputs(self) -> jax.Array:
        h, w = self.cfg.input_size
        return jnp.zeros((1, h, w, self.cfg.in_channels), dtype=jnp.float32)

    def init(self, rng: Any = 0) -> Dict:
        """Initialize parameters (and store them on the instance)."""
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        self.params = self.init_params(rng)
        return self.params

    def apply(
        self,
        params: Dict,
        x: jax.Array,
        *,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        return_features: bool = False,
        mutable: bool = False,
        features_only: bool = False,
        **forward_kwargs,
    ):
        """Pure functional forward pass.

        Returns ``out`` by default. With ``return_features=True`` returns
        ``(out, features)``; with ``mutable=True`` additionally appends the
        batch-stat update tree: ``(out, updates)`` / ``(out, features, updates)``.
        Extra kwargs are passed to ``forward`` (e.g. SAM's multimask_output).
        """
        ctx = Context(training=training, rng=rng, capture_features=return_features)
        ctx.index_params(params)
        with ctx:
            if features_only:
                out = self.forward_features(params, x, **forward_kwargs)
            else:
                out = self.forward(params, x, **forward_kwargs)
        results = (out,)
        if return_features:
            results += (ctx.features,)
        if mutable:
            results += (ctx.collect_state_updates() if ctx.has_state_updates else {},)
        return results if len(results) > 1 else out

    def __call__(self, x, *, params: Optional[Dict] = None, **kwargs):
        params = params if params is not None else self.params
        if params is None:
            raise ValueError("Model has no parameters; call model.init() first "
                             "or pass params= explicitly.")
        return self.apply(params, x, **kwargs)

    @functools.cached_property
    def _jit_infer(self):
        return jax.jit(lambda p, x: self.apply(p, x, training=False))

    def predict(self, x, params: Optional[Dict] = None):
        """Jit-compiled inference forward (cached per model instance)."""
        params = params if params is not None else self.params
        return self._jit_infer(params, x)

    # -- utilities ---------------------------------------------------------------
    @property
    def nb_params(self) -> int:
        if self.params is None:
            raise ValueError("Model has no parameters")
        return count_params(self.params)

    def cast(self, dtype) -> "Model":
        """Cast stored float params to ``dtype`` (e.g. jnp.bfloat16) in place."""
        if self.params is None:
            raise ValueError("Model has no parameters")
        self.params = tree_cast(self.params, dtype)
        return self
