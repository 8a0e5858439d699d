"""Flash-attention kernel vs the pure-JAX oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfimm_tpu.ops.attention import _reference_attention
from tfimm_tpu.ops.pallas.flash_attention_kernel import flash_attention


@pytest.mark.parametrize("n", [128, 197, 256, 577])
@pytest.mark.parametrize("d", [32, 64])
def test_flash_matches_reference(n, d):
    rng = jax.random.PRNGKey(0)
    rq, rk, rv = jax.random.split(rng, 3)
    shape = (2, 3, n, d)  # (batch, heads, seq, head_dim)
    q = jax.random.normal(rq, shape, jnp.float32)
    k = jax.random.normal(rk, shape, jnp.float32)
    v = jax.random.normal(rv, shape, jnp.float32)

    ref, _ = _reference_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_custom_scale():
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (1, 2, 130, 32), jnp.float32)
    ref, _ = _reference_attention(q, q, q, scale=0.5)
    out = flash_attention(q, q, q, scale=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
