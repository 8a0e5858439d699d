"""Fused LN+Dense kernel (ops/pallas/ln_dense.py): forward parity vs the
pure-JAX twin and full-VJP parity vs XLA autodiff of the twin, in interpret
mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfimm_tpu.ops.pallas.ln_dense import (
    _reference_ln_dense,
    ln_dense,
    ln_dense_diff,
    ln_dense_or_none,
)

EPS = 1e-6


def _mk(m=40, c=128, o=256, bias=True, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, c)), dtype)
    gamma = jnp.asarray(1 + 0.1 * rng.normal(size=(c,)), jnp.float32)
    beta = jnp.asarray(0.1 * rng.normal(size=(c,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(c, o)) * 0.05, dtype)
    b = jnp.asarray(rng.normal(size=(o,)) * 0.1, jnp.float32) if bias else None
    return x, gamma, beta, w, b


@pytest.mark.parametrize("bias", [True, False])
def test_forward_matches_reference(bias):
    x, gamma, beta, w, b = _mk(bias=bias)
    ref = np.asarray(_reference_ln_dense(x, gamma, beta, w, b, EPS))
    got = np.asarray(ln_dense(x, gamma, beta, w, b, eps=EPS, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_forward_pads_non_divisible_rows():
    # M = 197 tokens x batch — not a multiple of any block size.
    x, gamma, beta, w, b = _mk(m=197)
    ref = np.asarray(_reference_ln_dense(x, gamma, beta, w, b, EPS))
    got = np.asarray(ln_dense(x, gamma, beta, w, b, eps=EPS, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bias", [True, False])
def test_vjp_matches_xla_autodiff(bias):
    x, gamma, beta, w, b = _mk(m=72, bias=bias)
    g = jnp.asarray(np.random.default_rng(7).normal(size=(72, 256)),
                    jnp.float32)

    if bias:
        def kfn(x, gamma, beta, w, b):
            return ln_dense_diff(x, gamma, beta, w, b, EPS, True)

        def rfn(x, gamma, beta, w, b):
            return _reference_ln_dense(x, gamma, beta, w, b, EPS)

        args = (x, gamma, beta, w, b)
    else:
        def kfn(x, gamma, beta, w):
            return ln_dense_diff(x, gamma, beta, w, None, EPS, True)

        def rfn(x, gamma, beta, w):
            return _reference_ln_dense(x, gamma, beta, w, None, EPS)

        args = (x, gamma, beta, w)

    out_k, vjp_k = jax.vjp(kfn, *args)
    out_r, vjp_r = jax.vjp(rfn, *args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-5, rtol=2e-5)
    for dk, dr, name in zip(vjp_k(g), vjp_r(g),
                            ["dx", "dgamma", "dbeta", "dw", "db"]):
        np.testing.assert_allclose(
            np.asarray(dk), np.asarray(dr), atol=5e-4, rtol=5e-4,
            err_msg=name)


def test_vjp_non_divisible_rows():
    x, gamma, beta, w, b = _mk(m=197)
    g = jnp.asarray(np.random.default_rng(8).normal(size=(197, 256)),
                    jnp.float32)
    out_k, vjp_k = jax.vjp(
        lambda *a: ln_dense_diff(*a, EPS, True), x, gamma, beta, w, b)
    out_r, vjp_r = jax.vjp(
        lambda *a: _reference_ln_dense(*a, EPS), x, gamma, beta, w, b)
    for dk, dr, name in zip(vjp_k(g), vjp_r(g),
                            ["dx", "dgamma", "dbeta", "dw", "db"]):
        np.testing.assert_allclose(
            np.asarray(dk), np.asarray(dr), atol=5e-4, rtol=5e-4,
            err_msg=name)


def test_dispatcher(monkeypatch):
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    x, gamma, beta, w, b = _mk()
    # 3-D input keeps leading dims.
    x3 = x.reshape(2, 20, 128)
    y = ln_dense_or_none(x3, gamma, beta, w, b, eps=EPS)
    assert y is not None and y.shape == (2, 20, 256)
    ref = _reference_ln_dense(x, gamma, beta, w, b, EPS).reshape(2, 20, 256)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # Non-lane-multiple C declines.
    assert ln_dense_or_none(x[:, :96], gamma[:96], beta[:96], w[:96], b,
                            eps=EPS) is None
    # Env opt-out declines.
    monkeypatch.setenv("TFIMM_TPU_LN_DENSE", "0")
    assert ln_dense_or_none(x3, gamma, beta, w, b, eps=EPS) is None
