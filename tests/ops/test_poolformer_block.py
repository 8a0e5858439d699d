"""Fused PoolFormer block kernel (interpret mode) vs the unfused module
path, plus dispatch integration through PoolFormerBlock."""

import numpy as np

import jax
import jax.numpy as jnp

from tfimm_tpu.architectures.poolformer import PoolFormerBlock
from tfimm_tpu.core import Context


def _block_and_inputs(c=16, hw=12, mlp_ratio=2.0, seed=0):
    blk = PoolFormerBlock(c, mlp_ratio, drop_rate=0.0, drop_path_rate=0.0,
                          norm_layer="group_norm_1grp", act_layer="gelu",
                          init_scale=1e-2)
    p = blk.init(jax.random.PRNGKey(seed))
    # Non-trivial norm params so the kernel's fold-in is exercised.
    p["norm1"]["scale"] = p["norm1"]["scale"] * 1.3 + 0.1
    p["norm2"]["bias"] = p["norm2"]["bias"] + 0.05
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(3, hw, hw, c)), jnp.float32)
    return blk, p, x


def test_fused_block_matches_module(monkeypatch):
    blk, p, x = _block_and_inputs()
    with Context(training=False):
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
        ref = blk(p, x)
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
        monkeypatch.setenv("TFIMM_TPU_FUSED_POOLFORMER", "1")
        monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
        out = blk(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_pool_edges(monkeypatch):
    """Exclude-pad averaging at corners/edges is where the roll+mask count
    arithmetic can silently diverge — compare on a tiny map where edge
    pixels dominate."""
    blk, p, x = _block_and_inputs(c=8, hw=4, seed=3)
    with Context(training=False):
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
        ref = blk(p, x)
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
        monkeypatch.setenv("TFIMM_TPU_FUSED_POOLFORMER", "1")
        monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
        out = blk(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dispatch_declines_off_tpu(monkeypatch):
    from tfimm_tpu.ops.pallas.poolformer_block import poolformer_block_or_none

    blk, p, x = _block_and_inputs()
    monkeypatch.delenv("TFIMM_TPU_PALLAS_INTERPRET", raising=False)
    assert poolformer_block_or_none(p, x, mlp_ratio=2.0) is None


def test_dispatch_declines_oversized_map(monkeypatch):
    from tfimm_tpu.ops.pallas.poolformer_block import poolformer_block_or_none

    blk, p, x = _block_and_inputs()
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    big = jnp.zeros((1, 224, 224, 64), jnp.float32)
    blk2, p2, _ = _block_and_inputs(c=64, hw=12)
    assert poolformer_block_or_none(p2, big, mlp_ratio=2.0) is None


def test_training_path_unchanged(monkeypatch):
    """Training must take the differentiable unfused path (kernel has no
    VJP); grads through the block must exist and be finite."""
    blk, p, x = _block_and_inputs()
    monkeypatch.setenv("TFIMM_TPU_FUSED_POOLFORMER", "1")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")

    def loss(p):
        with Context(training=True):
            return (blk(p, x) ** 2).mean()

    g = jax.grad(loss)(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
