"""Trace-time execution context.

Models in tfimm_tpu are pure functions over parameter pytrees. Three pieces of
"module state" that object-oriented frameworks hide (reference: Keras layers in
tfimm/layers/*) are threaded through a trace-time context instead:

- RNG streams for stochastic layers (DropPath/Dropout) — deterministic
  ``fold_in`` on a per-trace counter, so no key plumbing through block stacks.
- Batch-norm running-statistic updates in training mode — recorded against the
  parameter sub-dict object identity and resolved to tree paths afterwards, so
  layer code needs no knowledge of its position in the model.
- Intermediate-feature capture (the reference's ``return_features`` OrderedDict,
  e.g. tfimm/architectures/vit.py:444-463).

All bookkeeping happens at trace time (plain Python dicts holding tracers), so
it is invisible to XLA: a jitted forward with a context compiles to a single
fused graph.
"""

from __future__ import annotations

import threading
from typing import Any, Dict, Optional

import jax

__all__ = [
    "Context",
    "current_context",
    "get_rng",
    "is_training",
    "capture_feature",
    "record_state_update",
]

_LOCAL = threading.local()


class Context:
    """Per-apply execution context. Created by ``Model.apply``; layers query it."""

    def __init__(self, *, training: bool = False, rng: Optional[jax.Array] = None,
                 capture_features: bool = False):
        self.training = training
        self._rng = rng
        self._rng_counter = 0
        self.capture_features = capture_features
        self.features: Dict[str, Any] = {}
        # id(param-subdict) -> {leaf name -> new value}
        self._updates_by_id: Dict[int, Dict[str, Any]] = {}
        # id(param-subdict) -> dotted tree path, filled by index_params
        self._id_to_path: Dict[int, str] = {}

    # -- rng ---------------------------------------------------------------
    def make_rng(self) -> jax.Array:
        if self._rng is None:
            raise ValueError(
                "A stochastic layer (dropout / drop_path) ran in training mode "
                "but no rng was supplied. Pass rng= to Model.apply()."
            )
        self._rng_counter += 1
        return jax.random.fold_in(self._rng, self._rng_counter)

    @property
    def has_rng(self) -> bool:
        return self._rng is not None

    # -- mutable state (batch norm) -----------------------------------------
    def index_params(self, params: Any) -> None:
        """Walk the parameter tree and remember each sub-dict's path."""

        def walk(node, path):
            if isinstance(node, dict):
                self._id_to_path[id(node)] = path
                for k, v in node.items():
                    walk(v, f"{path}.{k}" if path else str(k))

        walk(params, "")

    def record_update(self, subdict: dict, updates: Dict[str, Any]) -> None:
        self._updates_by_id.setdefault(id(subdict), {}).update(updates)

    @property
    def has_state_updates(self) -> bool:
        return bool(self._updates_by_id)

    def collect_state_updates(self) -> Dict[str, Any]:
        """Return recorded updates as a nested dict mirroring the param tree."""
        out: Dict[str, Any] = {}
        for node_id, updates in self._updates_by_id.items():
            path = self._id_to_path.get(node_id)
            if path is None:  # update recorded against an unindexed dict
                raise RuntimeError("state update recorded for unindexed subtree")
            cur = out
            parts = path.split(".") if path else []
            for p in parts:
                cur = cur.setdefault(p, {})
            cur.update(updates)
        return out

    # -- feature capture -----------------------------------------------------
    def capture(self, name: str, value: Any) -> None:
        if self.capture_features:
            self.features[name] = value

    # -- context manager -----------------------------------------------------
    def __enter__(self) -> "Context":
        stack = getattr(_LOCAL, "stack", None)
        if stack is None:
            stack = _LOCAL.stack = []
        stack.append(self)
        return self

    def __exit__(self, *exc) -> None:
        _LOCAL.stack.pop()


_DEFAULT = Context(training=False)


def current_context() -> Context:
    stack = getattr(_LOCAL, "stack", None)
    return stack[-1] if stack else _DEFAULT


def is_training() -> bool:
    return current_context().training


def get_rng() -> jax.Array:
    return current_context().make_rng()


def capture_feature(name: str, value: Any) -> None:
    current_context().capture(name, value)


def record_state_update(subdict: dict, updates: Dict[str, Any]) -> None:
    current_context().record_update(subdict, updates)
