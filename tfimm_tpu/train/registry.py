"""Class registry for the training framework
(reference: tfimm/train/registry.py:5-60).

``@cfg_serializable`` associates a class with its config dataclass so that
``<field>_class`` strings in experiment configs can be resolved to classes.
"""

from __future__ import annotations

__all__ = ["cfg_serializable", "get_class", "get_cfg_class"]

_classes = {}
_cfg_classes = {}


def cfg_serializable(cls):
    """Register ``cls`` (with a ``cfg_class`` attribute) or a bare config
    dataclass so it can be referenced by name from configs."""
    name = cls.__name__
    if hasattr(cls, "cfg_class"):
        _classes[name] = cls
        _cfg_classes[name] = cls.cfg_class
        _cfg_classes[cls.cfg_class.__name__] = cls.cfg_class
    else:
        _cfg_classes[name] = cls
    return cls


def get_class(name: str):
    return _classes[name]


def get_cfg_class(name: str):
    return _cfg_classes[name]
