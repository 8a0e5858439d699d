"""Utils tests (reference: tests/utils/test_cache.py, test_etc.py) plus
FLOPs/profile coverage."""

import os

import numpy as np

import jax.numpy as jnp

from tfimm_tpu import create_model, save_model
from tfimm_tpu.utils import cache, make_divisible, to_2tuple
from tfimm_tpu.utils.flops import get_flops, get_parameters
from tfimm_tpu.utils.profile import time_model

from tests.models.architectures import TEST_ARCHITECTURES  # noqa: F401


def test_to_2tuple():
    assert to_2tuple(3) == (3, 3)
    assert to_2tuple((1, 2)) == (1, 2)
    assert to_2tuple([4, 5]) == (4, 5)


def test_make_divisible():
    assert make_divisible(32, 8) == 32
    assert make_divisible(33, 8) == 32
    assert make_divisible(16 * 0.25, 8) == 8
    # 10% round-down guard
    assert make_divisible(23, 8) == 24


def test_cache_env_and_overrides(tmp_path, monkeypatch):
    monkeypatch.setenv("TFIMM_TPU_HOME", str(tmp_path))
    assert cache.get_dir() == str(tmp_path)
    cache.set_dir(str(tmp_path / "other"))
    assert cache.get_dir() == str(tmp_path / "other")
    cache.set_dir(None)
    cache._cache_dir = None

    assert cache.cached_model_path("nope") is None
    cache.set_model_cache("mymodel", str(tmp_path / "m"))
    assert cache.cached_model_path("mymodel") == str(tmp_path / "m")
    assert "mymodel" in cache.list_cached_models()
    cache.clear_model_cache("mymodel")
    assert cache.cached_model_path("mymodel") is None


def test_create_model_from_cache(tmp_path, monkeypatch):
    """pretrained=True resolves through the local model cache."""
    monkeypatch.setenv("TFIMM_TPU_HOME", str(tmp_path))
    model = create_model("vit_test_model")
    save_model(model, os.path.join(str(tmp_path), "vit_test_model"))
    loaded = create_model("vit_test_model", pretrained=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 32, 32, 3)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(model(x)), np.asarray(loaded(x)),
                               atol=1e-6)


def test_flops_and_params():
    model = create_model("vit_test_model")
    flops = get_flops(model)
    assert flops > 0
    assert get_parameters(model) == model.nb_params


def test_time_model_inference_and_backprop():
    rate = time_model("vit_test_model", "inference", batch_size=2,
                      nb_batches=2, dtype=jnp.float32)
    assert rate > 0
    rate = time_model("vit_test_model", "backprop", batch_size=2,
                      nb_batches=2, dtype=jnp.float32)
    assert rate > 0


def test_time_model_median_samples_and_stats():
    rate, stats = time_model("vit_test_model", "inference", batch_size=2,
                             nb_batches=2, dtype=jnp.float32, samples=3,
                             return_stats=True)
    assert rate > 0
    assert len(stats["samples"]) == 3
    assert stats["spread_rel"] >= 0
    # median of the raw samples
    import numpy as np

    assert abs(rate - float(np.median(stats["samples"]))) / rate < 0.01


def test_time_model_training_mode():
    """training=True: dropout/drop-path live, BN batch stats with
    running-stat merges (the reference's backprop methodology,
    tfimm/utils/profile.py:97). Use a BN model so the merge path runs."""
    rate = time_model("resnet_test_model", "backprop", batch_size=2,
                      nb_batches=2, dtype=jnp.float32, training=True)
    assert rate > 0
    import pytest

    with pytest.raises(ValueError, match="training"):
        time_model("vit_test_model", "inference", batch_size=2,
                   nb_batches=2, training=True)


def test_collect_tfrecord_files(tmp_path):
    from tfimm_tpu.train.utils import collect_tfrecord_files

    (tmp_path / "sub").mkdir()
    (tmp_path / "a.tfrecord").touch()
    (tmp_path / "sub" / "b.tfrecord-00000").touch()
    (tmp_path / "c.txt").touch()
    files = collect_tfrecord_files(str(tmp_path))
    assert len(files) == 2


def test_embedding_model_save_load(tmp_path):
    from tfimm_tpu import EmbeddingModel

    backbone = create_model("vit_test_model", nb_classes=0)
    model = EmbeddingModel(backbone, embed_dim=6)
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 32, 32, 3)),
                    jnp.float32)
    emb = model(x)
    assert emb.shape == (2, 6)
    model.save(str(tmp_path / "emb"))
    loaded = EmbeddingModel.load(str(tmp_path / "emb"))
    np.testing.assert_allclose(np.asarray(loaded(x)), np.asarray(emb),
                               atol=1e-6)


def test_export_model_roundtrip(tmp_path):
    from tfimm_tpu.utils.export import export_model, load_exported

    model = create_model("vit_test_model", nb_classes=7)
    path = str(tmp_path / "model.stablehlo")
    export_model(model, path, batch_size=2, normalize_logits=True)
    exported = load_exported(path)
    img = np.random.default_rng(0).uniform(0, 255, size=(2, 32, 32, 3))
    out = np.asarray(exported(img))
    assert out.shape == (2, 7)
    # normalized logits: logsumexp == 0
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, rtol=1e-5)
