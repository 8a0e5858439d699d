"""Fused windowed-MHA kernel (Swin) vs the XLA oracle, interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfimm_tpu.ops.pallas.window_mha import window_mha, window_mha_diff


def _reference(q, k, v, bias, mask, nb_heads, scale):
    """The WindowAttention math (architectures/swin.py) without projections."""
    bw, n, c = q.shape
    d = c // nb_heads
    qh, kh, vh = (t.reshape(bw, n, nb_heads, d).transpose(0, 2, 1, 3)
                  for t in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh) + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        s = s.reshape(-1, nw, nb_heads, n, n) + mask[None, :, None]
        s = s.reshape(bw, nb_heads, n, n)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return out.transpose(0, 2, 1, 3).reshape(bw, n, c)


def _make(bw, n, c, nb_heads, nb_win, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(size=(bw, n, c)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(rng.normal(size=(nb_heads, n, n)), jnp.float32)
    mask = (jnp.asarray(
        np.where(rng.uniform(size=(nb_win, n, n)) > 0.8, -100.0, 0.0),
        jnp.float32) if nb_win else None)
    return q, k, v, bias, mask


# (bw, n, c, heads, nb_win): Swin stage-1 (C=96 full-width path, shifted and
# not), a 128-multiple C (grouped path), and d=64 heads.
CASES = [
    (8, 49, 96, 3, 4),
    (8, 49, 96, 3, 0),
    (8, 49, 256, 8, 4),
    (4, 49, 128, 2, 0),
    (4, 25, 192, 6, 2),
    (4, 144, 128, 4, 2),  # window-12 models (N > 64: no pairing)
]


@pytest.mark.parametrize("bw,n,c,h,nw", CASES)
def test_window_mha_forward(bw, n, c, h, nw):
    q, k, v, bias, mask = _make(bw, n, c, h, nw)
    scale = (c // h) ** -0.5
    ref = _reference(q, k, v, bias, mask, h, scale)
    out = window_mha(q, k, v, bias, mask, nb_heads=h, scale=scale,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bw,n,c,h,nw", [(8, 49, 96, 3, 4), (4, 49, 256, 8, 0)])
def test_window_mha_grad(bw, n, c, h, nw):
    q, k, v, bias, mask = _make(bw, n, c, h, nw, seed=1)
    scale = (c // h) ** -0.5
    w = jnp.asarray(np.random.default_rng(2).normal(size=(bw, n, c)),
                    jnp.float32)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_reference(q, k, v, bias, mask, h, scale) * w)

    def loss_kernel(q, k, v, bias):
        return jnp.sum(window_mha_diff(q, k, v, bias, mask, h, scale, True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ker = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g_ref, g_ker, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


# Shapes whose PACKED window length is a sublane multiple (52 -> g2 -> 104,
# 32 -> g2 -> 64), so the stacked group bodies actually engage (the gate
# falls back to the looped bodies otherwise).
STACKED_CASES = [
    (8, 52, 96, 3, 4),
    (4, 32, 128, 4, 0),
    (4, 52, 192, 6, 2),
]


@pytest.mark.parametrize("bw,n,c,h,nw", STACKED_CASES)
def test_window_mha_stacked_forward(bw, n, c, h, nw, monkeypatch):
    """Sublane-stacked group bodies (2 matmuls per lane group) vs the XLA
    oracle."""
    from tfimm_tpu.ops.pallas.window_mha import _stacked_enabled

    monkeypatch.setenv("TFIMM_TPU_WINDOW_STACKED", "1")
    assert _stacked_enabled(2 * n)  # the gate engages at the packed length
    q, k, v, bias, mask = _make(bw, n, c, h, nw)
    scale = (c // h) ** -0.5
    ref = _reference(q, k, v, bias, mask, h, scale)
    out = window_mha(q, k, v, bias, mask, nb_heads=h, scale=scale,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("bw,n,c,h,nw", [(8, 52, 96, 3, 4), (4, 32, 128, 4, 0)])
def test_window_mha_stacked_grad(bw, n, c, h, nw, monkeypatch):
    """Stacked backward (5 matmuls per lane group) vs XLA autodiff, incl.
    the bias-table gradient assembled from the stacked ds row blocks."""
    monkeypatch.setenv("TFIMM_TPU_WINDOW_STACKED", "1")
    q, k, v, bias, mask = _make(bw, n, c, h, nw, seed=7)
    scale = (c // h) ** -0.5
    w = jnp.asarray(np.random.default_rng(8).normal(size=(bw, n, c)),
                    jnp.float32)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_reference(q, k, v, bias, mask, h, scale) * w)

    def loss_kernel(q, k, v, bias):
        return jnp.sum(window_mha_diff(q, k, v, bias, mask, h, scale, True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ker = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(g_ref, g_ker, ["dq", "dk", "dv", "dbias"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_swin_window_attention_integration(monkeypatch):
    """Full WindowAttention: kernel dispatch path (interpret mode) vs the XLA
    path — exercises the q/k/v weight slicing, bias gather/transpose and
    shift-mask plumbing in architectures/swin.py, not just the kernel math."""
    from tfimm_tpu.architectures.swin import (SwinTransformerConfig,
                                              WindowAttention,
                                              _attention_mask)
    from tfimm_tpu.core import Context

    cfg = SwinTransformerConfig(name="t", window_size=7)
    attn = WindowAttention(cfg, embed_dim=96, nb_heads=3, window_size=7)
    p = attn.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 49, 96)),
                    jnp.float32)
    mask = jnp.asarray(_attention_mask((14, 14), 7, 3))

    with Context(training=False):
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
        ref = attn(p, x, mask=mask)
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
        monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
        out = attn(p, x, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_swin_model_kernel_path(monkeypatch):
    """A small Swin end to end on the interpret-mode kernel path.

    The registered swin_test_model has head_dim 2 (dispatcher declines), so
    this uses a dedicated config with head_dim 16 and shifted 4x4 windows —
    both shifted and unshifted blocks run through the kernel.
    """
    from tfimm_tpu.architectures.swin import (SwinTransformer,
                                              SwinTransformerConfig)

    cfg = SwinTransformerConfig(
        name="swin_kernel_test", input_size=(32, 32), patch_size=4,
        embed_dim=32, nb_blocks=(2,), nb_heads=(2,), window_size=4,
        nb_classes=7, drop_path_rate=0.0,
    )
    model = SwinTransformer(cfg)
    model.init(0)
    x = np.random.default_rng(4).uniform(size=(2, 32, 32, 3)).astype("float32")
    ref = np.asarray(model.predict(x))
    # predict caches its jitted trace per instance — use a fresh instance
    # (same params) so the kernel dispatch is actually re-traced.
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    model2 = SwinTransformer(cfg, params=model.params)
    out = np.asarray(model2.predict(x))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=5e-5)


def test_vit_fused_mha_integration(monkeypatch):
    """MultiHeadAttention's fused-kernel dispatch branch (interpret mode) vs
    the XLA path — covers the packed-qkv layout assumptions and proj tail in
    ops/attention.py on CPU, like the Swin test above does for window_mha."""
    from tfimm_tpu.core import Context
    from tfimm_tpu.ops.attention import MultiHeadAttention

    attn = MultiHeadAttention(dim=128, nb_heads=2)  # d=64: head-pair layout
    p = attn.init(jax.random.PRNGKey(5))
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 37, 128)),
                    jnp.float32)
    with Context(training=False):
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
        ref = attn(p, x)
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
        monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
        out = attn(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_window_mha_grad_clamp_saturation():
    """Logits past the softmax clamp: the kernel VJP must be the exact
    Jacobian of the CLAMPED forward (zero cotangent on saturated entries),
    which autodiff of the clamp-then-softmax oracle computes through
    jnp.minimum. The oracle uses jax.nn.softmax (max-subtracted) on the
    clamped scores: same function as the kernel's nomax form, but with a
    numerically stable AD — naive autodiff of e/sum(e) overflows f32 at
    e ~ exp(80) (sum^2 ~ 1e70) and returns garbage cotangents, which
    finite differences confirm are wrong. Scores are driven past
    SOFTMAX_CLAMP=80 by scaling q."""
    bw, n, c, h = 4, 8, 64, 2
    q, k, v, bias, _ = _make(bw, n, c, h, 0, seed=3)
    q = q * 40.0  # raw scores now span well past the clamp
    scale = (c // h) ** -0.5

    def clamped_ref(q, k, v, bias):
        d = c // h
        qh, kh, vh = (t.reshape(bw, n, h, d).transpose(0, 2, 1, 3)
                      for t in (q, k, v))
        s = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh) + bias[None]
        p = jax.nn.softmax(jnp.minimum(s, 80.0), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
        return out.transpose(0, 2, 1, 3).reshape(bw, n, c)

    # Sanity: the test really exercises saturation.
    d = c // h
    qh, kh = (t.reshape(bw, n, h, d).transpose(0, 2, 1, 3) for t in (q, k))
    raw = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh) + bias[None]
    assert float(jnp.max(raw)) > 80.0

    gk = jax.grad(lambda *a: window_mha_diff(*a, None, h, scale, True)
                  .astype(jnp.float32).sum(), argnums=(0, 1, 2, 3))(
        q, k, v, bias)
    gr = jax.grad(lambda *a: clamped_ref(*a).astype(jnp.float32).sum(),
                  argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("stacked", [False, True])
def test_window_mha_stacked_override(stacked):
    """The explicit stacked override (the VMEM-degrade path in
    window_mha_or_none) matches the reference either way."""
    q, k, v, bias, mask = _make(8, 8, 128, 2, 4, seed=3)
    scale = 0.125
    ref = _reference(q, k, v, bias, mask, 2, scale)
    out = window_mha(q, k, v, bias, mask, nb_heads=2, scale=scale,
                     interpret=True, stacked=stacked)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # And through the custom-VJP wrapper with the override threaded.
    out2 = window_mha_diff(q, k, v, bias, mask, 2, scale, True, stacked)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_window_mha_or_none_degrades_not_drops(monkeypatch):
    """When the stacked VMEM budget busts but the per-head budget fits, the
    dispatcher must return the fused kernel (stacked=False), not None."""
    import tfimm_tpu.ops.pallas.window_mha as wm

    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("TFIMM_TPU_WINDOW_STACKED", "1")
    q, k, v, bias, mask = _make(8, 8, 128, 2, 4, seed=4)
    base = wm.window_mha_or_none(q, k, v, bias, mask, nb_heads=2,
                                 scale=0.125)
    assert base is not None
    # Shrink the budget to just above the per-head need so the stacked
    # extra cannot fit: dispatch must degrade, not return None.
    calls = {}
    orig = wm.window_mha_diff

    def spy(*args):
        calls["stacked"] = args[-1]
        return orig(*args)

    monkeypatch.setattr(wm, "window_mha_diff", spy)
    # Scan budgets downward: somewhere between "everything fits" and
    # "nothing fits" there must be a band where the kernel still dispatches
    # but with stacked=False (the degrade), instead of returning None.
    out = None
    for limit in range(400_000, 8_000, -8_000):
        calls.clear()
        monkeypatch.setattr(wm, "_VMEM_LIMIT_BYTES", limit)
        res = wm.window_mha_or_none(q, k, v, bias, mask, nb_heads=2,
                                    scale=0.125)
        if res is not None and calls.get("stacked") is False:
            out = res
            break
    assert out is not None, "no budget produced the stacked=False degrade"
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=2e-5, rtol=2e-5)
