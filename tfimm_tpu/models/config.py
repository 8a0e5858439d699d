"""Config base class (reference: tfimm/models/config.py:4-9).

Every architecture subclasses ``ModelConfig`` with a dataclass carrying all
hyper-parameters; registered model variants are frozen config instances.
"""

from dataclasses import dataclass
from typing import Tuple


@dataclass
class ModelConfig:
    name: str = ""
    url: str = ""

    # Fields below are conventions shared by (nearly) all architectures; they
    # drive the generic factory/transfer machinery exactly like the reference's
    # duck-typed config fields (tfimm/models/factory.py:174-305).
    nb_classes: int = 1000
    in_channels: int = 3
    input_size: Tuple[int, int] = (224, 224)

    @property
    def transform_weights(self):
        """dict: param path -> fn(model, arr) applied during transfer_weights."""
        return {}
