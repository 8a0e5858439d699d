import pytest

import tfimm_tpu  # noqa: F401
from tfimm_tpu import is_model, list_models, list_modules, model_class, model_config
from tfimm_tpu.models.registry import model_entrypoint

from tests.models.architectures import TEST_ARCHITECTURES  # noqa: F401 (registers)


def test_list_models_wildcard():
    models = list_models("vit_*")
    assert "vit_tiny_patch16_224" in models
    assert all(m.startswith("vit_") for m in models)


def test_list_models_exclude():
    models = list_models("vit_*", exclude_filters="*_384")
    assert "vit_tiny_patch16_224" in models
    assert not any(m.endswith("_384") for m in models)


def test_list_models_module():
    models = list_models(module="vit")
    assert "vit_base_patch16_224" in models


def test_list_modules():
    assert "vit" in list_modules()


def test_pretrained_filter():
    models = list_models("vit_test*", pretrained=True)
    assert "vit_test_model" not in models  # test models have no URL
    assert "vit_base_patch16_224" in list_models("vit_base*", pretrained=True)


def test_is_model_and_lookup():
    assert is_model("vit_tiny_patch16_224")
    assert not is_model("not_a_model")
    cls, cfg = model_entrypoint("vit_tiny_patch16_224")
    assert cls is model_class("vit_tiny_patch16_224")
    assert cfg.embed_dim == 192
    # model_config returns a copy
    cfg.embed_dim = 1
    assert model_config("vit_tiny_patch16_224").embed_dim == 192


def test_unknown_model_raises():
    with pytest.raises(KeyError):
        model_class("nope")
