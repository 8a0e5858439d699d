"""Unit tests for core ops: norms vs torch, BN state updates, stochastic layers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfimm_tpu.core import Context
from tfimm_tpu.ops import BatchNorm, GroupNorm, LayerNorm
from tfimm_tpu.ops.stochastic import drop_path, dropout

torch = pytest.importorskip("torch")


def test_layer_norm_vs_torch():
    ln = LayerNorm(16, eps=1e-6)
    p = ln.init(jax.random.PRNGKey(0))
    p["scale"] = jnp.asarray(np.random.default_rng(0).normal(size=16), jnp.float32)
    p["bias"] = jnp.asarray(np.random.default_rng(1).normal(size=16), jnp.float32)
    x = np.random.default_rng(2).normal(size=(2, 5, 16)).astype("float32")

    t = torch.nn.LayerNorm(16, eps=1e-6)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        t.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        expected = t(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ln(p, jnp.asarray(x))), expected,
                               atol=1e-6)


def test_group_norm_vs_torch():
    gn = GroupNorm(8, nb_groups=4, eps=1e-5)
    p = gn.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(3).normal(size=(2, 4, 4, 8)).astype("float32")
    t = torch.nn.GroupNorm(4, 8, eps=1e-5)
    with torch.no_grad():
        expected = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(gn(p, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_batch_norm_inference_vs_torch():
    bn = BatchNorm(8, eps=1e-5)
    p = bn.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    p["mean"] = jnp.asarray(rng.normal(size=8), jnp.float32)
    p["var"] = jnp.asarray(rng.uniform(0.5, 2.0, size=8), jnp.float32)
    x = rng.normal(size=(2, 4, 4, 8)).astype("float32")
    t = torch.nn.BatchNorm2d(8, eps=1e-5).eval()
    with torch.no_grad():
        t.running_mean.copy_(torch.from_numpy(np.asarray(p["mean"])))
        t.running_var.copy_(torch.from_numpy(np.asarray(p["var"])))
        expected = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(bn(p, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_batch_norm_training_updates_match_torch():
    bn = BatchNorm(4, eps=1e-5, momentum=0.9)
    params = {"bn": bn.init(jax.random.PRNGKey(0))}
    x = np.random.default_rng(5).normal(size=(8, 3, 3, 4)).astype("float32")

    ctx = Context(training=True)
    ctx.index_params(params)
    with ctx:
        y = bn(params["bn"], jnp.asarray(x))
    updates = ctx.collect_state_updates()

    t = torch.nn.BatchNorm2d(4, eps=1e-5, momentum=0.1).train()
    with torch.no_grad():
        expected = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), expected,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(updates["bn"]["mean"]),
                               t.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["bn"]["var"]),
                               t.running_var.numpy(), atol=1e-5)


def test_dropout_and_droppath():
    x = jnp.ones((4, 3, 2))
    # Inference: identity, no rng needed.
    assert np.array_equal(np.asarray(dropout(x, 0.5)), np.asarray(x))
    assert np.array_equal(np.asarray(drop_path(x, 0.5)), np.asarray(x))
    # Training: needs rng; per-sample mask for drop_path.
    with Context(training=True, rng=jax.random.PRNGKey(0)):
        y = np.asarray(drop_path(x, 0.5))
    per_sample = y.reshape(4, -1)
    for row in per_sample:
        assert np.all(row == 0) or np.allclose(row, 2.0)
    # Training with rate 0: identity even without rng.
    with Context(training=True):
        assert np.array_equal(np.asarray(dropout(x, 0.0)), np.asarray(x))


def test_missing_rng_raises():
    with Context(training=True):
        with pytest.raises(ValueError):
            dropout(jnp.ones((2, 2)), 0.5)
