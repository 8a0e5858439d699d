"""bf16 forward tests across families — the reference's mixed-precision test
exists but is @skip'd (tests/models/test_factory.py:225-238); ours runs."""

import numpy as np
import pytest

import jax.numpy as jnp

from tfimm_tpu import create_model

from tests.models.architectures import TEST_ARCHITECTURES


@pytest.mark.parametrize("model_name", TEST_ARCHITECTURES)
def test_bf16_forward(model_name):
    model = create_model(model_name, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=model.dummy_inputs.shape),
        jnp.bfloat16,
    )
    y = model(x)
    assert y.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(y, dtype=np.float32)))


@pytest.mark.parametrize("model_name", TEST_ARCHITECTURES[:3])
def test_bf16_close_to_f32(model_name):
    """bf16 logits track f32 logits within bf16-accumulation noise."""
    f32 = create_model(model_name)
    bf16 = create_model(model_name, dtype=jnp.bfloat16)
    from tfimm_tpu import transfer_weights

    transfer_weights(f32, bf16)
    x = np.random.default_rng(1).uniform(-1, 1, size=f32.dummy_inputs.shape)
    y32 = np.asarray(f32(jnp.asarray(x, jnp.float32)), np.float32)
    y16 = np.asarray(bf16(jnp.asarray(x, jnp.bfloat16)), np.float32)
    scale = max(np.abs(y32).max(), 1.0)
    assert np.abs(y32 - y16).max() / scale < 0.1
