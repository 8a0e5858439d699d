"""GPipe pipeline (parallel/pipeline.py) on the virtual 8-device CPU mesh:
forward and gradient equivalence against sequential block application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfimm_tpu.parallel.mesh import create_mesh
from tfimm_tpu.parallel.pipeline import pipeline_apply, stack_block_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _block_fn(p, x):
    # A residual MLP block: shape-preserving, nonlinear, uses every param.
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def _make_blocks(nb_blocks, dim, hidden, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "w1": jnp.asarray(rng.normal(size=(dim, hidden)) * 0.3,
                              jnp.float32),
            "b1": jnp.asarray(rng.normal(size=(hidden,)) * 0.1, jnp.float32),
            "w2": jnp.asarray(rng.normal(size=(hidden, dim)) * 0.3,
                              jnp.float32),
        }
        for _ in range(nb_blocks)
    ]


def _sequential(blocks, x):
    for p in blocks:
        x = _block_fn(p, x)
    return x


@pytest.mark.parametrize("stages,microbatches", [(4, 8), (2, 4), (8, 8)])
def test_pipeline_forward_matches_sequential(stages, microbatches):
    dim, hidden, batch = 16, 32, 16
    blocks = _make_blocks(8, dim, hidden)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(batch, dim)),
                    jnp.float32)
    mesh = create_mesh((stages,), ("pipe",),
                       devices=jax.devices()[:stages])
    stacked = stack_block_params(blocks)
    out = pipeline_apply(_block_fn, stacked, x, mesh=mesh,
                         nb_microbatches=microbatches)
    ref = _sequential(blocks, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_single_stage_identity_schedule():
    dim, hidden, batch = 8, 16, 8
    blocks = _make_blocks(4, dim, hidden)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(batch, dim)),
                    jnp.float32)
    mesh = create_mesh((1,), ("pipe",), devices=jax.devices()[:1])
    out = pipeline_apply(_block_fn, stack_block_params(blocks), x, mesh=mesh,
                         nb_microbatches=2)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_sequential(blocks, x)),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_gradients_match_sequential():
    dim, hidden, batch = 8, 12, 8
    blocks = _make_blocks(4, dim, hidden, seed=3)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(batch, dim)),
                    jnp.float32)
    mesh = create_mesh((4,), ("pipe",), devices=jax.devices()[:4])
    stacked = stack_block_params(blocks)

    def loss_pipe(stacked, x):
        y = pipeline_apply(_block_fn, stacked, x, mesh=mesh,
                           nb_microbatches=4)
        return (y ** 2).mean()

    def loss_seq(stacked, x):
        y = jax.lax.scan(lambda h, p: (_block_fn(p, h), None), x, stacked)[0]
        return (y ** 2).mean()

    gp = jax.grad(loss_pipe)(stacked, x)
    gs = jax.grad(loss_seq)(stacked, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_pipeline_dp_composition_shards_batch():
    """dp+pp: batch_axis shards the per-microbatch batch dim over "data"
    instead of replicating it, and results still match sequential."""
    dim, hidden, batch = 16, 24, 16
    blocks = _make_blocks(8, dim, hidden, seed=5)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(batch, dim)),
                    jnp.float32)
    mesh = create_mesh((2, 4), ("data", "pipe"))
    stacked = stack_block_params(blocks)
    out = pipeline_apply(_block_fn, stacked, x, mesh=mesh,
                         nb_microbatches=4, batch_axis="data")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_sequential(blocks, x)),
                               atol=1e-5, rtol=1e-5)
    # The output really is sharded over "data" on the batch dim (not an
    # all-gathered replica): each device holds 1/2 of the batch rows.
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(batch // 2, dim)}

    with pytest.raises(ValueError, match="batch axis size"):
        pipeline_apply(_block_fn, stacked, x[:4], mesh=mesh,
                       nb_microbatches=4, batch_axis="data")


def test_pipeline_validates_divisibility():
    blocks = _make_blocks(6, 4, 4)
    x = jnp.zeros((4, 4))
    mesh = create_mesh((4,), ("pipe",), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="blocks not divisible"):
        pipeline_apply(_block_fn, stack_block_params(blocks), x, mesh=mesh,
                       nb_microbatches=2)
    with pytest.raises(ValueError, match="not divisible by nb_microbatches"):
        pipeline_apply(_block_fn, stack_block_params(blocks[:4]), x,
                       mesh=mesh, nb_microbatches=3)
