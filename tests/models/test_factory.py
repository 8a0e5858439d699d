"""Generic model-contract tests parametrized over all tiny test architectures
(reference: tests/models/test_factory.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tfimm_tpu import (
    create_model,
    create_preprocessing,
    load_model,
    save_model,
    transfer_weights,
)

from tests.models.architectures import (
    EXCLUDE_IN_CHANNELS_MODELS,
    FIXED_SIZE_MODELS,
    TEST_ARCHITECTURES,
)


@pytest.mark.parametrize("model_name", TEST_ARCHITECTURES)
def test_forward_shape(model_name):
    model = create_model(model_name)
    x = np.random.default_rng(0).uniform(size=model.dummy_inputs.shape).astype("float32")
    y = model(jnp.asarray(x))
    assert y.shape[0] == 1
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("model_name", TEST_ARCHITECTURES)
def test_transfer_weights_preserves_features(model_name):
    """Changing nb_classes keeps backbone features identical."""
    src = create_model(model_name)
    dst = create_model(model_name, nb_classes=7)
    transfer_weights(src, dst)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(size=src.dummy_inputs.shape), jnp.float32
    )
    f_src = src.apply(src.params, x, features_only=True)
    f_dst = dst.apply(dst.params, x, features_only=True)
    np.testing.assert_allclose(np.asarray(f_src), np.asarray(f_dst), atol=1e-6)
    y = dst(x)
    assert y.shape[-1] == 7


@pytest.mark.parametrize("model_name", TEST_ARCHITECTURES)
def test_save_load_roundtrip(model_name, tmp_path):
    model = create_model(model_name)
    save_model(model, str(tmp_path / "m"))
    loaded = load_model(str(tmp_path / "m"))
    assert type(loaded) is type(model)
    assert loaded.cfg == model.cfg
    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=model.dummy_inputs.shape), jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(model(x)), np.asarray(loaded(x)), atol=1e-6
    )


@pytest.mark.parametrize("model_name", TEST_ARCHITECTURES)
def test_create_from_model_path(model_name, tmp_path):
    model = create_model(model_name)
    save_model(model, str(tmp_path / "m"))
    loaded = create_model(model_name, model_path=str(tmp_path / "m"))
    x = jnp.asarray(
        np.random.default_rng(3).uniform(size=model.dummy_inputs.shape), jnp.float32
    )
    np.testing.assert_allclose(np.asarray(model(x)), np.asarray(loaded(x)), atol=1e-6)


@pytest.mark.parametrize("model_name", TEST_ARCHITECTURES[:1])
@pytest.mark.parametrize("in_channels", [1, 6])
def test_in_channels_adaptation(model_name, in_channels):
    """1-channel input on an adapted model equals replicated-channel input on
    the original (sum adaptation); 6 channels runs and is finite."""
    if model_name in EXCLUDE_IN_CHANNELS_MODELS:
        pytest.skip("architecture cannot adapt input channels losslessly")
    src = create_model(model_name)
    dst = create_model(model_name, in_channels=in_channels)
    transfer_weights(src, dst)
    rng = np.random.default_rng(4)
    h, w = src.cfg.input_size
    x = rng.uniform(size=(1, h, w, in_channels)).astype("float32")
    y = dst(jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(y)))
    if in_channels == 1:
        x3 = np.tile(x, (1, 1, 1, 3))
        y3 = src(jnp.asarray(x3))
        np.testing.assert_allclose(np.asarray(y), np.asarray(y3), atol=1e-4)


@pytest.mark.parametrize("model_name", TEST_ARCHITECTURES[:1])
def test_input_size_change_via_transfer(model_name):
    if model_name in FIXED_SIZE_MODELS:
        pytest.skip("fixed input size model")
    src = create_model(model_name)
    dst = create_model(model_name, input_size=(48, 48))
    transfer_weights(src, dst)
    x = jnp.asarray(
        np.random.default_rng(5).uniform(size=(1, 48, 48, 3)), jnp.float32
    )
    y = dst(x)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("size", [(32, 32), (64, 48)])
@pytest.mark.parametrize("in_channels", [1, 3])
def test_preprocessing(size, in_channels):
    preprocess = create_preprocessing("vit_test_model", in_channels=in_channels)
    img = np.random.default_rng(6).uniform(0, 255, size=(2, *size, in_channels))
    out = preprocess(img)
    assert out.shape == img.shape
    assert out.dtype == jnp.float32
    assert float(jnp.abs(out).max()) < 10.0


@pytest.mark.parametrize("model_name", TEST_ARCHITECTURES)
def test_return_features(model_name):
    model = create_model(model_name)
    x = jnp.asarray(
        np.random.default_rng(7).uniform(size=model.dummy_inputs.shape), jnp.float32
    )
    y_plain = model(x)
    y, features = model(x, return_features=True)
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y), atol=1e-6)
    assert isinstance(features, dict) and features
    if model.feature_names:
        assert set(model.feature_names) == set(features.keys())


def test_kwargs_validation():
    with pytest.raises(ValueError):
        create_model("vit_test_model", not_a_field=3)


def test_interpolate_input_matches_fixed_at_native_size():
    """Variable-resolution inference equals the fixed-size path at native
    resolution (reference: tests/models/test_factory.py:156-179)."""
    fixed = create_model("vit_test_model")
    flex = create_model("vit_test_model", interpolate_input=True)
    transfer_weights(fixed, flex)
    x = jnp.asarray(
        np.random.default_rng(8).uniform(size=(1, 32, 32, 3)), jnp.float32
    )
    np.testing.assert_allclose(np.asarray(fixed(x)), np.asarray(flex(x)),
                               atol=1e-5)
    # And it runs at a different resolution.
    x48 = jnp.asarray(
        np.random.default_rng(9).uniform(size=(1, 48, 48, 3)), jnp.float32
    )
    y = flex(x48)
    assert np.all(np.isfinite(np.asarray(y)))
