"""Classifier head (reference: tfimm/layers/classifier.py:11-74)."""

from __future__ import annotations


from tfimm_tpu.ops.basic import Dense
from tfimm_tpu.ops.stochastic import dropout

__all__ = ["ClassifierHead", "global_pool_2d"]


def global_pool_2d(x, pool_type: str = "avg"):
    """Pool (B, H, W, C) -> (B, C) or pass through token input (B, C)."""
    if x.ndim == 2 or pool_type == "":
        return x
    if pool_type == "avg":
        return x.mean(axis=(1, 2))
    if pool_type == "max":
        return x.max(axis=(1, 2))
    raise ValueError(f"Unknown pool type: {pool_type}")


class ClassifierHead:
    """Global pool -> dropout -> Dense. nb_classes == 0 => identity head."""

    def __init__(self, nb_classes: int, in_features: int, pool_type: str = "avg",
                 drop_rate: float = 0.0, kernel_init=None, bias_init=None):
        self.nb_classes = nb_classes
        self.pool_type = pool_type
        self.drop_rate = drop_rate
        self.fc = (Dense(in_features, nb_classes, kernel_init=kernel_init,
                         bias_init=bias_init)
                   if nb_classes > 0 else None)

    def init(self, rng):
        return {"fc": self.fc.init(rng)} if self.fc else {}

    def __call__(self, p, x):
        x = global_pool_2d(x, self.pool_type)
        x = dropout(x, self.drop_rate)
        if self.fc:
            x = self.fc(p["fc"], x)
        return x
