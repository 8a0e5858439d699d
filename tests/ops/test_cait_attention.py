"""Fused talking-head attention kernel vs the XLA path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfimm_tpu.core import Context


def _inputs(seed=0, b=2, n=52, h=4, d=48):
    rng = np.random.default_rng(seed)
    dim = h * d
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * dim)), jnp.float32)
    wl = jnp.asarray(rng.normal(size=(h, h)) * 0.3, jnp.float32)
    ww = jnp.asarray(rng.normal(size=(h, h)) * 0.3, jnp.float32)
    bl = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
    bw = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
    return qkv, wl, bl, ww, bw, h, d ** -0.5


@pytest.mark.parametrize("with_bias", [True, False])
def test_kernel_matches_twin(with_bias):
    from tfimm_tpu.ops.pallas.cait_attention import (_reference,
                                                     talking_head_attention)

    qkv, wl, bl, ww, bw, h, scale = _inputs()
    if not with_bias:
        bl = bw = None
    out = talking_head_attention(qkv, wl, bl, ww, bw, nb_heads=h,
                                 scale=scale, interpret=True)
    ref = _reference(qkv, wl, bl, ww, bw, h, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_twin_matches_module_path(monkeypatch):
    """The pure-JAX twin must equal TalkingHeadAttention's unfused path."""
    from tfimm_tpu.architectures.cait import TalkingHeadAttention
    from tfimm_tpu.ops.pallas.cait_attention import _reference

    h, d = 4, 48
    dim = h * d
    attn = TalkingHeadAttention(dim, h, qkv_bias=True, attn_drop_rate=0.0,
                                proj_drop_rate=0.0)
    p = attn.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 52, dim)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    with Context(training=False):
        ref = attn(p, x)
    qkv = jnp.dot(x, p["qkv"]["kernel"]) + p["qkv"]["bias"]
    body = _reference(qkv, p["proj_l"]["kernel"], p["proj_l"]["bias"],
                      p["proj_w"]["kernel"], p["proj_w"]["bias"],
                      h, attn.scale)
    out = jnp.dot(body, p["proj"]["kernel"]) + p["proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dispatch_in_module_call(monkeypatch):
    """TalkingHeadAttention.__call__ takes the fused path end to end."""
    from tfimm_tpu.architectures.cait import TalkingHeadAttention

    h, d = 4, 48
    dim = h * d
    attn = TalkingHeadAttention(dim, h, qkv_bias=True, attn_drop_rate=0.0,
                                proj_drop_rate=0.0)
    p = attn.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 52, dim)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
    with Context(training=False):
        ref = attn(p, x)
    monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    with Context(training=False):
        out = attn(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_vjp_matches_twin_autodiff(monkeypatch):
    """Gradients through the dispatcher equal the unfused path's."""
    from tfimm_tpu.ops.pallas.cait_attention import (_reference,
                                                     talking_head_diff)

    qkv, wl, bl, ww, bw, h, scale = _inputs(seed=3)
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")

    def loss_kernel(qkv, wl, bl, ww, bw):
        return jnp.sum(
            talking_head_diff(qkv, wl, bl, ww, bw, h, scale, True) ** 2)

    def loss_ref(qkv, wl, bl, ww, bw):
        return jnp.sum(_reference(qkv, wl, bl, ww, bw, h, scale) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(qkv, wl, bl, ww, bw)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(qkv, wl, bl, ww, bw)
    for a, b in zip(g1, g2):
        # 1e-4: the Pallas backward recomputes the softmax (flash trade) and
        # contracts in a different order than XLA autodiff; pure f32
        # reassociation noise, observed max ~2e-5.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("chunk", ["1", "2", "4"])
def test_stacked_forward_matches_twin(monkeypatch, chunk):
    """Sublane-stacked body (all chunk sizes) equals the XLA twin; n=52
    exercises the zero-row padding to the 8-sublane tile (np_=56)."""
    from tfimm_tpu.ops.pallas.cait_attention import (_reference,
                                                     talking_head_attention)

    monkeypatch.setenv("TFIMM_TPU_CAIT_STACKED", "1")
    monkeypatch.setenv("TFIMM_TPU_CAIT_STACK_CHUNK", chunk)
    qkv, wl, bl, ww, bw, h, scale = _inputs(seed=7)
    out = talking_head_attention(qkv, wl, bl, ww, bw, nb_heads=h,
                                 scale=scale, interpret=True)
    ref = _reference(qkv, wl, bl, ww, bw, h, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("chunk", ["1", "4"])
def test_stacked_vjp_matches_twin_autodiff(monkeypatch, chunk):
    """Stacked backward (dqkv and both mix-matrix grads) equals autodiff of
    the unfused path, including the PV-recompute dww identity."""
    from tfimm_tpu.ops.pallas.cait_attention import (_reference,
                                                     talking_head_diff)

    monkeypatch.setenv("TFIMM_TPU_CAIT_STACKED", "1")
    monkeypatch.setenv("TFIMM_TPU_CAIT_STACK_CHUNK", chunk)
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    qkv, wl, bl, ww, bw, h, scale = _inputs(seed=11)

    def loss_kernel(qkv, wl, bl, ww, bw):
        return jnp.sum(
            talking_head_diff(qkv, wl, bl, ww, bw, h, scale, True) ** 2)

    def loss_ref(qkv, wl, bl, ww, bw):
        return jnp.sum(_reference(qkv, wl, bl, ww, bw, h, scale) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(qkv, wl, bl, ww, bw)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(qkv, wl, bl, ww, bw)
    # b_l's true gradient is zero by softmax shift invariance; the kernel
    # returns exact zeros while reference autodiff carries f32 noise (~3e-4
    # at this seed) — compare it against zero at the noise level instead.
    np.testing.assert_allclose(np.asarray(g1[2]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2[2]), 0.0, atol=1e-3)
    for a, b in zip(g1[:2] + g1[3:], g2[:2] + g2[3:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_stacked_aligned_rows_no_padding(monkeypatch):
    """n % 8 == 0 skips the padding concat entirely — parity must hold."""
    from tfimm_tpu.ops.pallas.cait_attention import (_reference,
                                                     talking_head_attention)

    monkeypatch.setenv("TFIMM_TPU_CAIT_STACKED", "1")
    qkv, wl, bl, ww, bw, h, scale = _inputs(seed=13, n=64)
    out = talking_head_attention(qkv, wl, bl, ww, bw, nb_heads=h,
                                 scale=scale, interpret=True)
    ref = _reference(qkv, wl, bl, ww, bw, h, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dispatch_declines_off_tpu(monkeypatch):
    from tfimm_tpu.ops.pallas.cait_attention import (
        talking_head_attention_or_none,
    )

    qkv, wl, bl, ww, bw, h, scale = _inputs()
    monkeypatch.delenv("TFIMM_TPU_PALLAS_INTERPRET", raising=False)
    assert talking_head_attention_or_none(
        qkv, wl, bl, ww, bw, nb_heads=h, scale=scale) is None


def test_dispatch_vmem_gate_boundary(monkeypatch):
    """The 10 MB VMEM gate's boundary is measured, not conservative:
    bf16 577-token (@384) m36-class shapes are ACCEPTED (they fit,
    ~10.2 MB), while the 784-token m48@448 shape is DECLINED — the
    round-3 TFIMM_TPU_CAIT_LARGE toggle that admitted it hit an XLA:TPU
    scoped-vmem compile OOM on hardware (20.54 MB > 16 MB,
    exp_stacked.py round 4), so the widened gate was removed."""
    from tfimm_tpu.ops.pallas.cait_attention import (
        talking_head_attention_or_none, _reference,
    )

    h, d = 16, 48  # m36/m48-class: dim=768
    dim = h * d
    rng = np.random.default_rng(0)
    wl = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.float32)
    ww = jnp.asarray(rng.normal(size=(h, h)) * 0.1, jnp.float32)
    bl = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
    bw = jnp.asarray(rng.normal(size=(h,)), jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.delenv("TFIMM_TPU_CAIT_STACKED", raising=False)

    # m48@448: 784 tokens — declined regardless of any env.
    qkv = jnp.asarray(rng.normal(size=(1, 784, 3 * dim)), jnp.bfloat16)
    monkeypatch.setenv("TFIMM_TPU_CAIT_LARGE", "1")  # removed toggle: inert
    assert talking_head_attention_or_none(
        qkv, wl, bl, ww, bw, nb_heads=h, scale=d ** -0.5) is None

    # m36@384: 577 tokens bf16 — accepted by the default gate.
    qkv = jnp.asarray(rng.normal(size=(1, 577, 3 * dim)), jnp.bfloat16)
    out = talking_head_attention_or_none(
        qkv, wl, bl, ww, bw, nb_heads=h, scale=d ** -0.5)
    assert out is not None
    ref = _reference(qkv, wl, bl, ww, bw, h, d ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2)  # bf16 resolution over 577-length reductions


def test_dispatch_declines_non_lane_aligned_dim(monkeypatch):
    """dim % 128 != 0 (e.g. cait_xxs24's 192) can't satisfy Mosaic's lane
    divisibility for the (1, N, dim) qkv blocks — the dispatcher must fall
    back to XLA instead of crashing at lowering (regression: the TPU zoo
    sweep hit the Mosaic ValueError on cait_xxs24_224)."""
    import numpy as np

    from tfimm_tpu.ops.pallas.cait_attention import (
        talking_head_attention_or_none,
    )

    h, d = 4, 48  # dim=192: divisible by heads, NOT by the 128-lane width
    dim = h * d
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(2, 16, 3 * dim)), jnp.float32)
    wl = jnp.asarray(rng.normal(size=(h, h)), jnp.float32)
    ww = jnp.asarray(rng.normal(size=(h, h)), jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    assert talking_head_attention_or_none(
        qkv, wl, None, ww, None, nb_heads=h, scale=d ** -0.5) is None
