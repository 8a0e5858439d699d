from tfimm_tpu.models.base import Model  # noqa: F401
from tfimm_tpu.models.config import ModelConfig  # noqa: F401
from tfimm_tpu.models.embedding import EmbeddingModel  # noqa: F401
from tfimm_tpu.models.factory import (  # noqa: F401
    create_model,
    create_preprocessing,
    transfer_weights,
)
from tfimm_tpu.models.registry import (  # noqa: F401
    is_model,
    list_models,
    list_modules,
    model_class,
    model_config,
    register_model,
)
from tfimm_tpu.models.serialization import load_model, save_model  # noqa: F401
