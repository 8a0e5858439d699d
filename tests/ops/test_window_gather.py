"""Single-gather window repartitioning (ops/window_gather.py) and the
stage-level window-resident Swin path, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfimm_tpu.architectures.swin import (SwinTransformerConfig,
                                          SwinTransformerStage,
                                          window_partition)
from tfimm_tpu.core import Context
from tfimm_tpu.ops.window_gather import (pack_indices, padded_rows,
                                         repack_indices, unpack_indices)


def _chain(x, h, w, ws, shift):
    """The shipping roll + partition + pad chain, as ground truth."""
    b, _, c = x.shape
    n, n_pad = ws * ws, padded_rows(ws * ws)
    xg = x.reshape(b, h, w, c)
    if shift:
        xg = jnp.roll(xg, (-shift, -shift), axis=(1, 2))
    wins = window_partition(xg, ws).reshape(-1, n, c)
    return jnp.pad(wins, ((0, 0), (0, n_pad - n), (0, 0)))


@pytest.mark.parametrize("h,w,ws,shift", [(14, 14, 7, 0), (14, 14, 7, 3),
                                          (8, 8, 4, 2), (56, 56, 7, 3)])
def test_pack_indices_match_partition_chain(h, w, ws, shift):
    c, b = 5, 2
    x = jnp.asarray(np.random.default_rng(0).normal(size=(b, h * w, c)),
                    jnp.float32)
    ref = _chain(x, h, w, ws, shift)
    idx = jnp.asarray(pack_indices(h, w, ws, shift))
    got = jnp.take(x, idx, axis=1, mode="fill", fill_value=0)
    got = got.reshape(ref.shape)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("h,w,ws,shift", [(14, 14, 7, 3), (8, 8, 4, 0)])
def test_unpack_inverts_pack(h, w, ws, shift):
    c = 3
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, h * w, c)),
                    jnp.float32)
    packed = jnp.take(x, jnp.asarray(pack_indices(h, w, ws, shift)), axis=1,
                      mode="fill", fill_value=0)
    back = jnp.take(packed, jnp.asarray(unpack_indices(h, w, ws, shift)),
                    axis=1)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("s0,s1", [(0, 3), (3, 0), (3, 3), (0, 0)])
def test_repack_equals_unpack_then_pack(s0, s1):
    h = w = 14
    ws, c = 7, 3
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, h * w, c)),
                    jnp.float32)
    packed0 = jnp.take(x, jnp.asarray(pack_indices(h, w, ws, s0)), axis=1,
                       mode="fill", fill_value=0)
    # Pad rows of the source layout carry garbage after a kernel runs;
    # repack must not read them. Poison them to prove it.
    n, n_pad = ws * ws, padded_rows(ws * ws)
    poison = packed0.reshape(1, -1, n_pad, c).at[:, :, n:, :].set(jnp.nan)
    poison = poison.reshape(1, -1, c)
    direct = jnp.take(x, jnp.asarray(pack_indices(h, w, ws, s1)), axis=1,
                      mode="fill", fill_value=0)
    got = jnp.take(poison, jnp.asarray(repack_indices(h, w, ws, s0, s1)),
                   axis=1, mode="fill", fill_value=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(direct))


def _stage(nb_blocks=2, hw=14, c=96, heads=3):
    cfg = SwinTransformerConfig(name="t", window_size=7)
    stage = SwinTransformerStage(cfg, input_size=(hw, hw), embed_dim=c,
                                 nb_blocks=nb_blocks, nb_heads=heads,
                                 drop_path_rates=[0.0] * nb_blocks,
                                 downsample=False)
    p = stage.init(jax.random.PRNGKey(0))
    for i in range(nb_blocks):
        tbl = p["blocks"][str(i)]["attn"]["relative_position_bias_table"]
        p["blocks"][str(i)]["attn"]["relative_position_bias_table"] = (
            jnp.asarray(np.random.default_rng(10 + i).normal(size=tbl.shape)
                        * 0.3, jnp.float32))
    return stage, p


def test_window_resident_stage_matches_blockwise(monkeypatch):
    """The single-gather window-resident stage equals the per-block path."""
    stage, p = _stage()
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 196, 96)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    with Context(training=False):
        ref = stage(p, x, 0)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    with Context(training=False):
        out = stage._window_resident(p, x)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_window_resident_used_by_stage_call(monkeypatch):
    """stage.__call__ dispatches to the gather path (same numbers), and the
    TFIMM_TPU_SWIN_GATHER=0 escape hatch restores the per-block path."""
    stage, p = _stage()
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 196, 96)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    with Context(training=False):
        ref = stage(p, x, 0)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    with Context(training=False):
        out = stage(p, x, 0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)
    monkeypatch.setenv("TFIMM_TPU_SWIN_GATHER", "0")
    with Context(training=False):
        off = stage(p, x, 0)
    np.testing.assert_allclose(np.asarray(off), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize("kind", ["pack", "unpack", "repack"])
def test_permutation_take_vjp_is_inverse_gather(kind):
    """The custom VJP (inverse gather) must equal the scatter-based AD of a
    plain jnp.take for every permutation kind."""
    from tfimm_tpu.ops.window_gather import (pack_windows, repack_windows,
                                             unpack_windows)

    h = w = 14
    ws, c = 7, 3
    n_rows = (h // ws) * (w // ws) * padded_rows(ws * ws)
    rng = np.random.default_rng(5)
    if kind == "pack":
        fn = lambda x: pack_windows(x, h, w, ws, 3)
        idx = pack_indices(h, w, ws, 3)
        x = jnp.asarray(rng.normal(size=(2, h * w, c)), jnp.float32)
    elif kind == "unpack":
        fn = lambda x: unpack_windows(x, h, w, ws, 3)
        idx = unpack_indices(h, w, ws, 3)
        x = jnp.asarray(rng.normal(size=(2, n_rows, c)), jnp.float32)
    else:
        fn = lambda x: repack_windows(x, h, w, ws, 0, 3)
        idx = repack_indices(h, w, ws, 0, 3)
        x = jnp.asarray(rng.normal(size=(2, n_rows, c)), jnp.float32)
    ref_fn = lambda x: jnp.take(x, jnp.asarray(idx), axis=1, mode="fill",
                                fill_value=0)
    cot = jnp.asarray(rng.normal(size=fn(x).shape), jnp.float32)
    _, vjp = jax.vjp(fn, x)
    _, vjp_ref = jax.vjp(ref_fn, x)
    np.testing.assert_array_equal(np.asarray(vjp(cot)[0]),
                                  np.asarray(vjp_ref(cot)[0]))


def test_window_resident_gradients_match_blockwise(monkeypatch):
    """jax.grad through the stage's gather dispatch equals grad through the
    per-block path — by construction now (_window_resident_diff re-runs the
    per-block composition for gradient workloads), but this guards the
    custom_vjp plumbing end-to-end."""
    stage, p = _stage()
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 196, 96)),
                    jnp.float32)

    def loss(params, x):
        with Context(training=False):
            return (stage(params, x, 0) ** 2).mean()

    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    g_ref = jax.grad(loss)(p, x)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    g_ker = jax.grad(loss)(p, x)
    for a, b in zip(jax.tree.leaves(g_ker), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_window_resident_declines_on_odd_geometry():
    """A map that does not tile into windows must not qualify."""
    cfg = SwinTransformerConfig(name="t", window_size=7)
    stage = SwinTransformerStage(cfg, input_size=(12, 12), embed_dim=96,
                                 nb_blocks=1, nb_heads=3,
                                 drop_path_rates=[0.0], downsample=False)
    p = stage.init(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 144, 96), jnp.float32)
    with Context(training=False):
        assert not stage._resident_applies(p, x)
        assert stage._window_resident_diff(p, x) is None
