"""Fused single-head SRA kernel (interpret mode) vs the unfused XLA path,
through the real SpatialReductionAttention modules (v1 + v2)."""

import numpy as np

import jax
import jax.numpy as jnp

from tfimm_tpu.core import Context


def _run_both(attn_cls, monkeypatch, **kw):
    attn = attn_cls(**kw)
    p = attn.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    gh = gw = 8
    x = jnp.asarray(rng.normal(size=(2, gh * gw, kw["embed_dim"])),
                    jnp.float32)
    with Context(training=False):
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
        ref = attn(p, x, (gh, gw))
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
        monkeypatch.setenv("TFIMM_TPU_FUSED_PVT_SRA", "1")
        monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
        out = attn(p, x, (gh, gw))
    return np.asarray(out), np.asarray(ref)


def test_sra_v1_fused_matches_xla(monkeypatch):
    from tfimm_tpu.architectures.pvt import SpatialReductionAttention

    out, ref = _run_both(
        SpatialReductionAttention, monkeypatch, embed_dim=32, nb_heads=1,
        sr_ratio=4, qkv_bias=True, attn_drop_rate=0.0, proj_drop_rate=0.0)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_sra_v2_linear_fused_matches_xla(monkeypatch):
    from tfimm_tpu.architectures.pvt_v2 import SpatialReductionAttentionV2

    out, ref = _run_both(
        SpatialReductionAttentionV2, monkeypatch, embed_dim=32, nb_heads=1,
        sr_ratio=4, linear_sr=True, qkv_bias=True, attn_drop_rate=0.0,
        proj_drop_rate=0.0, act_layer="gelu")
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_sra_multihead_takes_xla_path(monkeypatch):
    """h > 1 must not dispatch to the fused kernel (it is single-head)."""
    from tfimm_tpu.ops.pallas.pvt_sra import sra_attention_or_none
    from tfimm_tpu.architectures.pvt import SpatialReductionAttention

    # direct dispatch check: kernel itself has no head support — the
    # architecture gate (h == 1) is what protects it; verify the module
    # output with h=2 still matches the NO_FLASH path.
    out, ref = _run_both(
        SpatialReductionAttention, monkeypatch, embed_dim=32, nb_heads=2,
        sr_ratio=4, qkv_bias=True, attn_drop_rate=0.0, proj_drop_rate=0.0)
    np.testing.assert_allclose(out, ref, atol=0, rtol=0)  # identical path


def test_sra_dispatch_declines_off_tpu(monkeypatch):
    from tfimm_tpu.ops.pallas.pvt_sra import sra_attention_or_none

    monkeypatch.delenv("TFIMM_TPU_PALLAS_INTERPRET", raising=False)
    x = jnp.zeros((1, 64, 32))
    k = v = jnp.zeros((1, 4, 32))
    w = jnp.zeros((32, 32))
    assert sra_attention_or_none(x, k, v, w, None, w, None, scale=1.0) is None


def test_sra_training_grads_finite(monkeypatch):
    """Training takes the differentiable unfused path."""
    from tfimm_tpu.architectures.pvt import SpatialReductionAttention

    attn = SpatialReductionAttention(
        embed_dim=32, nb_heads=1, sr_ratio=4, qkv_bias=True,
        attn_drop_rate=0.0, proj_drop_rate=0.0)
    p = attn.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 64, 32)),
                    jnp.float32)
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")

    def loss(p):
        with Context(training=True):
            return (attn(p, x, (8, 8)) ** 2).mean()

    g = jax.grad(loss)(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
