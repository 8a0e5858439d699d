"""AOT-lower every Pallas kernel variant for the TPU platform — on CPU.

``jax.export(..., platforms=["tpu"])`` runs the Pallas -> Mosaic lowering
(shape/layout plumbing, BlockSpec index maps, ref indexing) without needing
a device, so structural kernel bugs surface here instead of costing an
~8-minute remote-compile round trip per variant on real hardware. The
Mosaic -> machine-code stage (tiling legality, scoped-VMEM fit) still only
runs on device; these tests are necessary, not sufficient.

Shapes are the real model shapes each kernel ships at (ViT-B N=197,
Swin stage-1 pairs N=104, CaiT-S24, SAM 64x64 global / 14x14 windowed).
"""

import numpy as np  # noqa: F401
import pytest

import jax
import jax.numpy as jnp
from jax import export


def _lower(fn, *args):
    export.export(jax.jit(fn), platforms=["tpu"])(*args)


@pytest.mark.parametrize("stacked", ["0", "1"])
def test_fused_mha_lowers(monkeypatch, stacked):
    monkeypatch.setenv("TFIMM_TPU_MHA_STACKED", stacked)
    from tfimm_tpu.ops.pallas.fused_mha import fused_mha_diff

    qkv = jnp.zeros((2, 197, 3 * 768), jnp.bfloat16)

    def fwd(qkv):
        return fused_mha_diff(qkv, 12, 0.125, False)

    def bwd(qkv):
        return jax.grad(lambda a: fwd(a).astype(jnp.float32).sum())(qkv)

    _lower(fwd, qkv)
    _lower(bwd, qkv)


@pytest.mark.parametrize("stacked", ["0", "1"])
def test_cait_talking_head_lowers(monkeypatch, stacked):
    monkeypatch.setenv("TFIMM_TPU_CAIT_STACKED", stacked)
    from tfimm_tpu.ops.pallas.cait_attention import talking_head_diff

    h, d = 8, 48
    qkv = jnp.zeros((2, 197, 3 * h * d), jnp.bfloat16)
    wl = jnp.zeros((h, h), jnp.float32)
    ww = jnp.zeros((h, h), jnp.float32)
    bl = jnp.zeros((h,), jnp.float32)
    bw = jnp.zeros((h,), jnp.float32)

    def fwd(qkv, wl, bl, ww, bw):
        return talking_head_diff(qkv, wl, bl, ww, bw, h, d ** -0.5, False)

    def bwd(qkv, wl, bl, ww, bw):
        return jax.grad(
            lambda *a: fwd(*a).astype(jnp.float32).sum(),
            argnums=(0, 1, 2, 3, 4))(qkv, wl, bl, ww, bw)

    _lower(fwd, qkv, wl, bl, ww, bw)
    _lower(bwd, qkv, wl, bl, ww, bw)


@pytest.mark.parametrize("stacked", ["0", "1"])
def test_window_mha_lowers(monkeypatch, stacked):
    monkeypatch.setenv("TFIMM_TPU_WINDOW_STACKED", stacked)
    from tfimm_tpu.ops.pallas.window_mha import window_mha_diff

    n, c, h = 104, 96, 3
    q = jnp.zeros((64, n, c), jnp.bfloat16)
    bias = jnp.zeros((h, n, n), jnp.float32)
    mask = jnp.zeros((32, n, n), jnp.float32)

    def fwd(q, k, v, bias, mask):
        return window_mha_diff(q, k, v, bias, mask, h, 0.17, False)

    def bwd(q, k, v, bias, mask):
        return jax.grad(
            lambda *a: fwd(*a).astype(jnp.float32).sum(),
            argnums=(0, 1, 2, 3))(q, k, v, bias, mask)

    _lower(fwd, q, q, q, bias, mask)
    _lower(bwd, q, q, q, bias, mask)


@pytest.mark.parametrize("stacked", ["0", "1"])
def test_swin_block_lowers(monkeypatch, stacked):
    monkeypatch.setenv("TFIMM_TPU_WINDOW_STACKED", stacked)
    from tfimm_tpu.ops.pallas.swin_block import swin_block_fused

    c, h = 96, 3

    def mk(*s):
        return jnp.zeros(s, jnp.bfloat16)

    params = {
        "wq": mk(c, c), "wk": mk(c, c), "wv": mk(c, c), "wp": mk(c, c),
        "w1": mk(c, 4 * c), "w2": mk(4 * c, c),
        "bq": jnp.zeros((1, c), jnp.float32),
        "bk": jnp.zeros((1, c), jnp.float32),
        "bv": jnp.zeros((1, c), jnp.float32),
        "bp": jnp.zeros((1, c), jnp.float32),
        "b1": jnp.zeros((1, 4 * c), jnp.float32),
        "b2": jnp.zeros((1, c), jnp.float32),
        "g1": jnp.zeros((1, c), jnp.float32),
        "be1": jnp.zeros((1, c), jnp.float32),
        "g2": jnp.zeros((1, c), jnp.float32),
        "be2": jnp.zeros((1, c), jnp.float32),
    }
    x = jnp.zeros((8 * 32, 52, c), jnp.bfloat16)
    bias = jnp.zeros((h, 52, 52), jnp.float32)
    mask = jnp.zeros((32, 52, 52), jnp.float32)

    def fwd(x):
        return swin_block_fused(x, params, bias, mask, nb_heads=h,
                                scale=0.17)

    _lower(fwd, x)


@pytest.mark.parametrize("paired", ["0", "1"])
def test_relpos_global_lowers(monkeypatch, paired):
    """SAM global-attention shape (64x64 grid, streaming blocks)."""
    monkeypatch.setenv("TFIMM_TPU_RELPOS_PAIRED", paired)
    from tfimm_tpu.ops.pallas.flash_attention_relpos import (
        flash_attention_relpos,
    )

    b, gh, gw, d = 2, 64, 64, 64
    n = gh * gw
    q = jnp.zeros((b, n, d), jnp.bfloat16)
    rh = jnp.zeros((b, n, gh), jnp.bfloat16)
    rw = jnp.zeros((b, n, gw), jnp.bfloat16)

    def fwd(q, k, v, rh, rw):
        return flash_attention_relpos(q, k, v, rh, rw, grid_size=(gh, gw),
                                      scale=0.125, block_q=512, block_k=512)

    def bwd(q, k, v, rh, rw):
        return jax.grad(
            lambda *a: fwd(*a).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))(q, k, v, rh, rw)

    _lower(fwd, q, q, q, rh, rw)
    _lower(bwd, q, q, q, rh, rw)


@pytest.mark.parametrize("paired", ["0", "1"])
def test_relpos_window_lowers(monkeypatch, paired):
    """SAM windowed shape (14x14 = 196 tokens, single-pass fused backward)."""
    monkeypatch.setenv("TFIMM_TPU_RELPOS_PAIRED", paired)
    from tfimm_tpu.ops.pallas.flash_attention_relpos import (
        flash_attention_relpos,
    )

    b, gh, gw, d = 4, 14, 14, 64
    n = gh * gw
    q = jnp.zeros((b, n, d), jnp.bfloat16)
    rh = jnp.zeros((b, n, gh), jnp.bfloat16)
    rw = jnp.zeros((b, n, gw), jnp.bfloat16)

    def fwd(q, k, v, rh, rw):
        return flash_attention_relpos(q, k, v, rh, rw, grid_size=(gh, gw),
                                      scale=0.125, block_q=n, block_k=n)

    def bwd(q, k, v, rh, rw):
        return jax.grad(
            lambda *a: fwd(*a).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))(q, k, v, rh, rw)

    _lower(fwd, q, q, q, rh, rw)
    _lower(bwd, q, q, q, rh, rw)


def test_flash_attention_lowers():
    from tfimm_tpu.ops.pallas.flash_attention_kernel import flash_attention

    q = jnp.zeros((4, 1024, 64), jnp.bfloat16)

    def fwd(q, k, v):
        return flash_attention(q, k, v, scale=0.125)

    def bwd(q, k, v):
        return jax.grad(
            lambda *a: fwd(*a).astype(jnp.float32).sum(),
            argnums=(0, 1, 2))(q, q, q)

    _lower(fwd, q, q, q)
    _lower(bwd, q, q, q)
