"""Model factories for the training framework (reference: tfimm/train/model.py).

``SavedModel`` loads a model exported via tfimm_tpu.save_model (the SavedModel
analog in this framework)."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from tfimm_tpu.models import (
    EmbeddingModel,
    create_model,
    create_preprocessing,
)
from tfimm_tpu.models.serialization import load_model
from tfimm_tpu.train.registry import cfg_serializable

__all__ = ["ModelConfig", "ModelFactory", "SavedModelConfig", "SavedModel",
           "EmbeddingModelConfig", "EmbeddingModelFactory"]


@dataclass
class ModelConfig:
    model_name: str = ""
    pretrained: str = ""
    model_path: str = ""
    input_size: tuple = ()
    in_channels: int = -1
    nb_classes: int = -1
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    attn_drop_rate: float = 0.0


@cfg_serializable
class ModelFactory:
    cfg_class = ModelConfig

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg

    def __call__(self):
        kwargs = {}
        for arg, default in [("input_size", ()), ("in_channels", -1),
                             ("nb_classes", -1), ("drop_rate", 0.0),
                             ("drop_path_rate", 0.0), ("attn_drop_rate", 0.0)]:
            if getattr(self.cfg, arg) != default:
                kwargs[arg] = getattr(self.cfg, arg)
        model = create_model(
            self.cfg.model_name,
            pretrained=self.cfg.pretrained,
            model_path=self.cfg.model_path,
            **kwargs,
        )
        preprocessing = create_preprocessing(self.cfg.model_name)
        return model, preprocessing


@dataclass
class SavedModelConfig:
    path: str = ""
    dtype: str = ""
    mean: tuple = (0.0, 0.0, 0.0)
    std: tuple = (1.0, 1.0, 1.0)


@cfg_serializable
class SavedModel:
    cfg_class = SavedModelConfig

    def __init__(self, cfg: SavedModelConfig):
        self.cfg = cfg

    def __call__(self):
        model = load_model(self.cfg.path)
        dtype = jnp.dtype(self.cfg.dtype) if self.cfg.dtype else jnp.float32
        mean = jnp.asarray(self.cfg.mean, dtype)
        std = jnp.asarray(self.cfg.std, dtype)

        def _preprocess(img):
            return (jnp.asarray(img).astype(dtype) - mean) / std

        return model, _preprocess


@dataclass
class EmbeddingModelConfig:
    backbone_name: str = ""
    embed_dim: int = 512
    pretrained: str = ""
    model_path: str = ""
    input_size: tuple = ()
    in_channels: int = -1
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0


@cfg_serializable
class EmbeddingModelFactory:
    cfg_class = EmbeddingModelConfig

    def __init__(self, cfg: EmbeddingModelConfig):
        self.cfg = cfg

    def __call__(self):
        kwargs = {"nb_classes": 0}
        for arg, default in [("input_size", ()), ("in_channels", -1),
                             ("drop_rate", 0.0), ("drop_path_rate", 0.0)]:
            if getattr(self.cfg, arg) != default:
                kwargs[arg] = getattr(self.cfg, arg)
        backbone = create_model(
            self.cfg.backbone_name,
            pretrained=self.cfg.pretrained,
            model_path=self.cfg.model_path,
            **kwargs,
        )
        model = EmbeddingModel(backbone, embed_dim=self.cfg.embed_dim)
        preprocessing = create_preprocessing(self.cfg.backbone_name)
        return model, preprocessing
