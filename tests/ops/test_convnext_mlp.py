"""Parity tests for the fused ConvNeXt LN+MLP kernel (interpret mode on CPU)
against the XLA composition it replaces."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfimm_tpu.ops.pallas.convnext_mlp import (
    _reference_mlp,
    convnext_mlp,
    convnext_mlp_diff,
    convnext_mlp_or_none,
)


def _inputs(m=64, c=128, hidden=512, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, c)), dtype)
    short = jnp.asarray(rng.normal(size=(m, c)), dtype)
    ln_s = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    ln_b = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, hidden)) * 0.05, dtype)
    b1 = jnp.asarray(rng.normal(size=(hidden,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(hidden, c)) * 0.05, dtype)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.05, jnp.float32)
    gamma = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    return x, short, ln_s, ln_b, w1, b1, w2, b2, gamma


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("m,c,hidden", [(64, 128, 512), (32, 256, 1024)])
def test_convnext_mlp_matches_reference(dtype, m, c, hidden):
    args = _inputs(m, c, hidden, dtype)
    out = convnext_mlp(*args, eps=1e-6, interpret=True)
    ref = _reference_mlp(*args, 1e-6)
    assert out.dtype == dtype
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_convnext_mlp_hidden_chunking():
    """The chunked fallback (hc < hidden, f32 accumulator across the j grid
    dim) matches the reference; forced via block_plan since the planner
    prefers resident weights at these sizes."""
    args = _inputs(16, 128, 4096, jnp.float32, seed=1)
    out = convnext_mlp(*args, eps=1e-6, interpret=True,
                       block_plan=(16, 1024, 10 * 2 ** 20))
    ref = _reference_mlp(*args, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_convnext_mlp_grad_matches_xla():
    """The custom VJP (XLA-twin backward) matches autodiff through the
    reference composition exactly."""
    args = _inputs(32, 128, 512, jnp.float32)

    def loss_kernel(*a):
        return jnp.sum(convnext_mlp_diff(*a, 1e-6, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_reference_mlp(*a, 1e-6) ** 2)

    g_kernel = jax.grad(loss_kernel, argnums=(0, 2, 4, 6, 8))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 2, 4, 6, 8))(*args)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_dispatch_gates():
    x = jnp.zeros((2, 4, 4, 96), jnp.float32)  # C not a lane multiple
    args = _inputs(32, 128, 512)
    os.environ["TFIMM_TPU_PALLAS_INTERPRET"] = "1"
    try:
        assert convnext_mlp_or_none(
            x, x, jnp.ones((96,)), jnp.zeros((96,)),
            jnp.zeros((96, 384)), jnp.zeros((384,)),
            jnp.zeros((384, 96)), jnp.zeros((96,)), jnp.ones((96,))) is None
        # Valid shapes dispatch and match the reference.
        xs = args[0].reshape(2, 4, 4, 128)
        ss = args[1].reshape(2, 4, 4, 128)
        out = convnext_mlp_or_none(xs, ss, *args[2:])
        assert out is not None
        ref = _reference_mlp(*args, 1e-6).reshape(2, 4, 4, 128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        os.environ["TFIMM_TPU_CONVNEXT_MLP"] = "0"
        assert convnext_mlp_or_none(xs, ss, *args[2:]) is None
    finally:
        os.environ.pop("TFIMM_TPU_PALLAS_INTERPRET", None)
        os.environ.pop("TFIMM_TPU_CONVNEXT_MLP", None)


def test_convnext_block_takes_kernel_in_interpret():
    """ConvNeXtBlock routes through the fused LN+MLP kernel and matches the
    XLA path bit-for-bit... well, to fp32 tolerance."""
    from tfimm_tpu.architectures.convnext import ConvNeXtBlock

    block = ConvNeXtBlock(
        embed_dim=128, mlp_ratio=4.0, conv_mlp_block=False, drop_rate=0.0,
        drop_path_rate=0.0, norm_layer="layer_norm_eps_1e-6",
        act_layer="gelu", init_scale=1e-6)
    params = block.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)

    base = block(params, x)
    os.environ["TFIMM_TPU_PALLAS_INTERPRET"] = "1"
    try:
        fused = block(params, x)
    finally:
        os.environ.pop("TFIMM_TPU_PALLAS_INTERPRET", None)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=2e-5, atol=2e-5)
