"""Fused Swin block kernel (ops/pallas/swin_block.py) vs the unfused path,
interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfimm_tpu.architectures.swin import (SwinTransformerBlock,
                                          SwinTransformerConfig,
                                          window_partition, window_reverse)
from tfimm_tpu.core import Context
from tfimm_tpu.ops.pallas.swin_block import swin_block_or_none


def _block(shift, hw=14, c=96, heads=3):
    cfg = SwinTransformerConfig(name="t", window_size=7)
    blk = SwinTransformerBlock(cfg, input_size=(hw, hw), embed_dim=c,
                               nb_heads=heads, drop_path_rate=0.0,
                               shift_size=shift)
    p = blk.init(jax.random.PRNGKey(0))
    p["attn"]["relative_position_bias_table"] = jnp.asarray(
        np.random.default_rng(1).normal(
            size=p["attn"]["relative_position_bias_table"].shape) * 0.3,
        jnp.float32)
    return blk, p


@pytest.mark.parametrize("shift,c,heads", [(0, 192, 6), (3, 96, 3)])
def test_fused_block_matches_unfused(monkeypatch, shift, c, heads):
    # C=96 unshifted is measurement-gated OFF (loses to XLA); cover the
    # unshifted kernel path at C=192 instead.
    blk, p = _block(shift, c=c, heads=heads)
    hw, ws, ss = 14, blk.window_size, blk.shift_size
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, hw * hw, c)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    with Context(training=False):
        ref = blk(p, x)

    xg = x.reshape(2, hw, hw, c)
    if ss:
        xg = jnp.roll(xg, (-ss, -ss), axis=(1, 2))
    wins = window_partition(xg, ws).reshape(-1, ws * ws, c)
    bias = p["attn"]["relative_position_bias_table"][
        blk.attn.rel_pos_index.reshape(-1)
    ].reshape(ws * ws, ws * ws, heads).transpose(2, 0, 1)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    out = swin_block_or_none(p, wins, bias, blk.attn_mask, nb_heads=heads,
                             scale=blk.attn.scale)
    assert out is not None
    o = window_reverse(out.reshape(-1, ws, ws, c), ws, hw, hw)
    if ss:
        o = jnp.roll(o, (ss, ss), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(o.reshape(2, hw * hw, c)),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("shift,c,heads", [(0, 192, 6), (3, 96, 3)])
def test_fused_block_stacked_matches_unfused(monkeypatch, shift, c, heads):
    """TFIMM_TPU_WINDOW_STACKED=1 swaps the sublane-stacked group body into
    the fused block kernel (pair rows 2*52=104 are 8-aligned)."""
    monkeypatch.setenv("TFIMM_TPU_WINDOW_STACKED", "1")
    blk, p = _block(shift, c=c, heads=heads)
    hw, ws, ss = 14, blk.window_size, blk.shift_size
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, hw * hw, c)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    with Context(training=False):
        ref = blk(p, x)

    xg = x.reshape(2, hw, hw, c)
    if ss:
        xg = jnp.roll(xg, (-ss, -ss), axis=(1, 2))
    wins = window_partition(xg, ws).reshape(-1, ws * ws, c)
    bias = p["attn"]["relative_position_bias_table"][
        blk.attn.rel_pos_index.reshape(-1)
    ].reshape(ws * ws, ws * ws, heads).transpose(2, 0, 1)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    out = swin_block_or_none(p, wins, bias, blk.attn_mask, nb_heads=heads,
                             scale=blk.attn.scale)
    assert out is not None
    o = window_reverse(out.reshape(-1, ws, ws, c), ws, hw, hw)
    if ss:
        o = jnp.roll(o, (ss, ss), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(o.reshape(2, hw * hw, c)),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_block_dispatch_in_model_call(monkeypatch):
    """SwinTransformerBlock.__call__ takes the fused path end to end."""
    blk, p = _block(shift=3)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 196, 96)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    with Context(training=False):
        ref = blk(p, x)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    with Context(training=False):
        out = blk(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_declines_in_training(monkeypatch):
    """Training must NOT take the (forward-only) fused kernel."""
    blk, p = _block(shift=0)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 196, 96)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    with Context(training=False):
        ref = blk(p, x)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    with Context(training=True, rng=jax.random.PRNGKey(0)):
        out = blk(p, x)  # unfused path; dropout rates are 0 so numerics match
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_whole_swin_model_fused_path(monkeypatch):
    """Full swin model forward: fused-block path equals the unfused path."""
    from tfimm_tpu import create_model

    model = create_model("swin_tiny_patch4_window7_224")
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 224, 224, 3)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    ref = np.asarray(model.predict(x))
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    model2 = create_model("swin_tiny_patch4_window7_224")
    model2.params = model.params
    out = np.asarray(model2.predict(x))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=5e-5)


def test_fused_block_c96_unshifted_padded_path(monkeypatch):
    """C=96 unshifted takes the fused kernel since window padding made it
    win (exp_swin_pad.py: 4.10 vs ~5.2 ms) — and the padded windows (49 ->
    52 rows, -1e9 bias on pad keys) must be numerically invisible."""
    blk, p = _block(shift=0)
    hw, c, ws = 14, 96, blk.window_size
    x = jnp.asarray(np.random.default_rng(9).normal(size=(2, hw * hw, c)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    with Context(training=False):
        ref = blk(p, x)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    wins = window_partition(x.reshape(2, hw, hw, c), ws).reshape(-1, ws * ws, c)
    bias = p["attn"]["relative_position_bias_table"][
        blk.attn.rel_pos_index.reshape(-1)
    ].reshape(ws * ws, ws * ws, 3).transpose(2, 0, 1)
    out = swin_block_or_none(p, wins, bias, None, nb_heads=3,
                             scale=blk.attn.scale)
    assert out is not None
    assert out.shape == wins.shape
    o = window_reverse(out.reshape(-1, ws, ws, c), ws, hw, hw)
    np.testing.assert_allclose(np.asarray(o.reshape(2, hw * hw, c)),
                               np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_gelu_policy_f32_matches_exact_erf():
    """The in-kernel exact-gelu branch uses a polynomial erf (Mosaic has no
    erf/erfc lowering) — must match jax.nn.gelu(approximate=False) to f32
    precision."""
    from tfimm_tpu.ops.pallas.swin_block import _gelu_policy

    x = jnp.asarray(np.linspace(-8, 8, 10001), jnp.float32)
    got = _gelu_policy(x, jnp.float32)
    ref = jax.nn.gelu(x, approximate=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_fused_block_gradients_match_reference(monkeypatch):
    """jax.grad through the (inference) fused path must work — the custom
    VJP differentiates the pure-JAX twin — and match the unfused path."""
    blk, p = _block(shift=3)
    hw, c, ws, ss = 14, 96, blk.window_size, blk.shift_size
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, hw * hw, c)),
                    jnp.float32)

    def loss(blk_params, x):
        with Context(training=False):
            return (blk(blk_params, x) ** 2).mean()

    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    g_ref = jax.grad(loss)(p, x)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    g_ker = jax.grad(loss)(p, x)
    for a, b in zip(jax.tree.leaves(g_ker), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)
