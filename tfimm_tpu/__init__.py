"""tfimm_tpu: a TPU-native JAX image-model framework.

Re-creation of the capability surface of tfimm (reference:
/root/reference/tfimm/__init__.py:1-13) as an idiomatic JAX/XLA/Pallas library:

- ``create_model`` / ``create_preprocessing`` / ``list_models`` — registry-driven
  model zoo with pretrained-weight conversion from timm/PyTorch checkpoints.
- Models are pure functions over parameter pytrees, compiled with ``jax.jit``.
- Hot kernels (attention et al.) are Pallas TPU kernels with pure-JAX fallbacks.
- Multi-chip execution via ``jax.sharding.Mesh`` in ``tfimm_tpu.parallel``.
"""

from tfimm_tpu.version import __version__  # noqa: F401

from tfimm_tpu.models.config import ModelConfig  # noqa: F401
from tfimm_tpu.models.registry import (  # noqa: F401
    register_model,
    list_models,
    list_modules,
    is_model,
    model_class,
    model_config,
)
from tfimm_tpu.models.factory import (  # noqa: F401
    create_model,
    create_preprocessing,
    transfer_weights,
)
from tfimm_tpu.models.serialization import load_model, save_model  # noqa: F401
from tfimm_tpu.quant import quantize_int8  # noqa: F401
from tfimm_tpu.models.embedding import EmbeddingModel  # noqa: F401
from tfimm_tpu.utils.cache import (  # noqa: F401
    cached_model_path,
    clear_model_cache,
    get_dir,
    list_cached_models,
    set_dir,
    set_model_cache,
)

# Architectures register themselves with the model registry at import time
# (reference: tfimm/architectures/__init__.py:1-16).
import tfimm_tpu.architectures  # noqa: F401, E402
