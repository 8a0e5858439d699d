"""Flash-attention kernel vs the pure-JAX oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfimm_tpu.ops.attention import _reference_attention
from tfimm_tpu.ops.pallas.flash_attention_kernel import flash_attention


@pytest.mark.parametrize("n", [128, 197, 256, 577])
@pytest.mark.parametrize("d", [32, 64])
def test_flash_matches_reference(n, d):
    rng = jax.random.PRNGKey(0)
    rq, rk, rv = jax.random.split(rng, 3)
    shape = (2, 3, n, d)  # (batch, heads, seq, head_dim)
    q = jax.random.normal(rq, shape, jnp.float32)
    k = jax.random.normal(rk, shape, jnp.float32)
    v = jax.random.normal(rv, shape, jnp.float32)

    ref, _ = _reference_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_custom_scale():
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (1, 2, 130, 32), jnp.float32)
    ref, _ = _reference_attention(q, q, q, scale=0.5)
    out = flash_attention(q, q, q, scale=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_relpos_matches_reference():
    """Fused decomposed-rel-pos kernel vs the SAM XLA path (interpret mode)."""
    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        add_decomposed_rel_pos,
        get_rel_pos,
    )
    from tfimm_tpu.ops.pallas.flash_attention_relpos import flash_attention_relpos

    rng = np.random.default_rng(0)
    b, gh, gw, d = 3, 8, 16, 32
    n = gh * gw
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
               for _ in range(3))
    rel_pos_h = jnp.asarray(rng.normal(size=(2 * gh - 1, d)), jnp.float32)
    rel_pos_w = jnp.asarray(rng.normal(size=(2 * gw - 1, d)), jnp.float32)
    scale = d ** -0.5

    attn = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, (gh, gw),
                                  (gh, gw), False)
    ref = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(attn, -1), v)

    r_h = get_rel_pos(gh, gh, rel_pos_h, False)
    r_w = get_rel_pos(gw, gw, rel_pos_w, False)
    qg = q.reshape(b, gh, gw, d)
    rh_term = jnp.einsum("bhwc,hkc->bhwk", qg, r_h).reshape(b, n, gh)
    rw_term = jnp.einsum("bhwc,wkc->bhwk", qg, r_w).reshape(b, n, gw)
    out = flash_attention_relpos(q, k, v, rh_term, rw_term,
                                 grid_size=(gh, gw), scale=scale,
                                 block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def _relpos_ref_from_terms(q, k, v, rh_term, rw_term, gh, gw, scale):
    """Oracle over the kernel's own inputs: softmax(scale*qk + rh + rw) v,
    with the decomposed bias added over the key grid coordinates."""
    b, n, d = q.shape
    attn = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    attn = (attn.reshape(b, n, gh, gw)
            + rh_term[..., :, None] + rw_term[..., None, :]).reshape(b, n, n)
    return jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(attn, -1), v)


@pytest.mark.parametrize("paired", ["0", "1"])
def test_flash_relpos_paired_numerics_and_grads(paired, monkeypatch):
    """The head-pair-packed kernels (TFIMM_TPU_RELPOS_PAIRED=1) vs the
    oracle, forward AND gradients — at d=64 / even B, exactly the gate the
    paired path requires. The toggle is a static jit argument, so the two
    parametrizations really trace different kernels (an env read inside
    the jitted body would silently reuse the first trace)."""
    monkeypatch.setenv("TFIMM_TPU_RELPOS_PAIRED", paired)
    from tfimm_tpu.ops.pallas.flash_attention_relpos import (
        flash_attention_relpos,
    )

    rng = np.random.default_rng(1)
    b, gh, gw, d = 4, 8, 8, 64  # b even, 2*d == 128: paired gate holds
    n = gh * gw

    def mk(*s):
        return jnp.asarray(rng.normal(size=s), jnp.float32)

    q, k, v, rh, rw = mk(b, n, d), mk(b, n, d), mk(b, n, d), \
        mk(b, n, gh), mk(b, n, gw)
    scale = d ** -0.5

    def kernel_fn(q, k, v, rh, rw):
        return flash_attention_relpos(q, k, v, rh, rw, grid_size=(gh, gw),
                                      scale=scale, block_q=32, block_k=32,
                                      interpret=True)

    def ref_fn(q, k, v, rh, rw):
        return _relpos_ref_from_terms(q, k, v, rh, rw, gh, gw, scale)

    out = kernel_fn(q, k, v, rh, rw)
    ref = ref_fn(q, k, v, rh, rw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)

    gk = jax.grad(lambda *a: kernel_fn(*a).sum(), argnums=(0, 1, 2, 3, 4))(
        q, k, v, rh, rw)
    gr = jax.grad(lambda *a: ref_fn(*a).sum(), argnums=(0, 1, 2, 3, 4))(
        q, k, v, rh, rw)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4,
                                   rtol=2e-4)


def test_fused_convnext_block_matches_reference():
    from tfimm_tpu.architectures.convnext import ConvNeXtBlock
    from tfimm_tpu.ops.pallas.convnext_block import fused_convnext_block

    rng = np.random.default_rng(0)
    c, h, w = 16, 8, 10
    blk = ConvNeXtBlock(c, 4.0, False, 0.0, 0.0, "layer_norm_eps_1e-6",
                        "gelu_tanh", 1e-6)
    p = blk.init(jax.random.PRNGKey(0))
    p["gamma"] = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
    ref = blk(p, x)
    out = fused_convnext_block(
        x, p["conv_dw"]["kernel"], p["conv_dw"]["bias"], p["norm"]["scale"],
        p["norm"]["bias"], p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"], p["gamma"],
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("n", [128, 300])
def test_flash_gradients_match_reference(n):
    """Custom-VJP Pallas backward vs jax.grad through the XLA oracle,
    including the padded (n=300) case and a non-default scale."""
    d = 32
    rng = jax.random.PRNGKey(2)
    rq, rk, rv, rw = jax.random.split(rng, 4)
    shape = (2, 2, n, d)
    q = jax.random.normal(rq, shape, jnp.float32)
    k = jax.random.normal(rk, shape, jnp.float32)
    v = jax.random.normal(rv, shape, jnp.float32)
    w = jax.random.normal(rw, shape, jnp.float32)  # random cotangent

    def loss_ref(q, k, v):
        out, _ = _reference_attention(q, k, v, scale=0.3)
        return jnp.sum(out * w)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=0.3, interpret=True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ref, g_flash, "qkv"):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   rtol=1e-4, err_msg=f"d{name}")


def test_flash_value_and_grad_jit():
    """The custom VJP composes with jit + value_and_grad."""
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (1, 2, 256, 32), jnp.float32)

    @jax.jit
    def f(q):
        return jnp.mean(flash_attention(q, q, q, interpret=True) ** 2)

    val, grad = jax.value_and_grad(f)(x)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))

    def f_ref(q):
        out, _ = _reference_attention(q, q, q)
        return jnp.mean(out ** 2)

    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref), atol=1e-5,
                               rtol=1e-4)


def test_flash_relpos_gradients_match_reference():
    """Rel-pos kernel VJP (incl. d_rel_h_term / d_rel_w_term) vs autodiff
    through the XLA decomposed-rel-pos path."""
    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        add_decomposed_rel_pos,
        get_rel_pos,
    )
    from tfimm_tpu.ops.pallas.flash_attention_relpos import flash_attention_relpos

    rng = np.random.default_rng(5)
    b, gh, gw, d = 2, 8, 16, 32
    n = gh * gw
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
               for _ in range(3))
    rel_pos_h = jnp.asarray(rng.normal(size=(2 * gh - 1, d)), jnp.float32)
    rel_pos_w = jnp.asarray(rng.normal(size=(2 * gw - 1, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    scale = d ** -0.5
    r_h = get_rel_pos(gh, gh, rel_pos_h, False)
    r_w = get_rel_pos(gw, gw, rel_pos_w, False)

    def terms(q):
        qg = q.reshape(b, gh, gw, d)
        rh = jnp.einsum("bhwc,hkc->bhwk", qg, r_h).reshape(b, n, gh)
        rw = jnp.einsum("bhwc,wkc->bhwk", qg, r_w).reshape(b, n, gw)
        return rh, rw

    def loss_ref(q, k, v):
        attn = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                                      (gh, gw), (gh, gw), False)
        out = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(attn, -1), v)
        return jnp.sum(out * w)

    def loss_kernel(q, k, v):
        rh, rw = terms(q)
        out = flash_attention_relpos(q, k, v, rh, rw, grid_size=(gh, gw),
                                     scale=scale, block_q=32, block_k=32,
                                     interpret=True)
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(g_ref, g_kernel, "qkv"):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=2e-4,
                                   rtol=2e-4, err_msg=f"d{name}")


def test_flash_relpos_window_sized_backward():
    """block_q = block_k = N takes the single-pass fused backward kernel
    (_bwd_fused_kernel — the SAM windowed-block training path); gradients
    incl. the rel terms must match autodiff through the XLA path."""
    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        add_decomposed_rel_pos,
        get_rel_pos,
    )
    from tfimm_tpu.ops.pallas.flash_attention_relpos import flash_attention_relpos

    rng = np.random.default_rng(7)
    b, gh, gw, d = 2, 6, 6, 32  # N = 36: single-block, like SAM's 14x14=196
    n = gh * gw
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
               for _ in range(3))
    rel_pos_h = jnp.asarray(rng.normal(size=(2 * gh - 1, d)), jnp.float32)
    rel_pos_w = jnp.asarray(rng.normal(size=(2 * gw - 1, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    scale = d ** -0.5
    r_h = get_rel_pos(gh, gh, rel_pos_h, False)
    r_w = get_rel_pos(gw, gw, rel_pos_w, False)

    def loss_ref(q, k, v):
        attn = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                                      (gh, gw), (gh, gw), False)
        out = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(attn, -1), v)
        return jnp.sum(out * w)

    def loss_kernel(q, k, v):
        qg = q.reshape(b, gh, gw, d)
        rh = jnp.einsum("bhwc,hkc->bhwk", qg, r_h).reshape(b, n, gh)
        rw = jnp.einsum("bhwc,wkc->bhwk", qg, r_w).reshape(b, n, gw)
        out = flash_attention_relpos(q, k, v, rh, rw, grid_size=(gh, gw),
                                     scale=scale, block_q=n, block_k=n,
                                     interpret=True)
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(g_ref, g_kernel, "qkv"):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=2e-4,
                                   rtol=2e-4, err_msg=f"d{name}")


def _relpos_case(seed, gh, gw, d, b=2):
    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        get_rel_pos,
    )

    rng = np.random.default_rng(seed)
    n = gh * gw
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
               for _ in range(3))
    rel_pos_h = jnp.asarray(rng.normal(size=(2 * gh - 1, d)), jnp.float32)
    rel_pos_w = jnp.asarray(rng.normal(size=(2 * gw - 1, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    r_h = get_rel_pos(gh, gh, rel_pos_h, False)
    r_w = get_rel_pos(gw, gw, rel_pos_w, False)
    return q, k, v, rel_pos_h, rel_pos_w, r_h, r_w, w


def test_flash_relpos_paired_matches_reference(monkeypatch):
    """TFIMM_TPU_RELPOS_PAIRED=1 packs head pairs into the 128 lanes; the
    streaming forward must equal the XLA decomposed-rel-pos path at SAM's
    d=64 (the only width the pairing gate accepts)."""
    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        add_decomposed_rel_pos,
    )
    from tfimm_tpu.ops.pallas.flash_attention_relpos import (
        flash_attention_relpos,
    )

    monkeypatch.setenv("TFIMM_TPU_RELPOS_PAIRED", "1")
    b, gh, gw, d = 2, 8, 16, 64
    n = gh * gw
    q, k, v, rel_pos_h, rel_pos_w, r_h, r_w, _ = _relpos_case(11, gh, gw, d)
    scale = d ** -0.5

    attn = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, (gh, gw),
                                  (gh, gw), False)
    ref = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(attn, -1), v)

    qg = q.reshape(b, gh, gw, d)
    rh_term = jnp.einsum("bhwc,hkc->bhwk", qg, r_h).reshape(b, n, gh)
    rw_term = jnp.einsum("bhwc,wkc->bhwk", qg, r_w).reshape(b, n, gw)
    out = flash_attention_relpos(q, k, v, rh_term, rw_term,
                                 grid_size=(gh, gw), scale=scale,
                                 block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


@pytest.mark.parametrize("window_sized", [False, True])
def test_flash_relpos_paired_gradients(monkeypatch, window_sized):
    """Paired streaming (dq + dkv kernels) and window-fused backward vs
    autodiff through the XLA path — all of dq/dk/dv incl. the rel terms."""
    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        add_decomposed_rel_pos,
    )
    from tfimm_tpu.ops.pallas.flash_attention_relpos import (
        flash_attention_relpos,
    )

    monkeypatch.setenv("TFIMM_TPU_RELPOS_PAIRED", "1")
    b, gh, gw, d = 2, 4, 8, 64
    n = gh * gw
    block = n if window_sized else 16
    q, k, v, rel_pos_h, rel_pos_w, r_h, r_w, w = _relpos_case(13, gh, gw, d)
    scale = d ** -0.5

    def loss_ref(q, k, v):
        attn = jnp.einsum("bqd,bkd->bqk", q, k) * scale
        attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                                      (gh, gw), (gh, gw), False)
        out = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(attn, -1), v)
        return jnp.sum(out * w)

    def loss_kernel(q, k, v):
        qg = q.reshape(b, gh, gw, d)
        rh = jnp.einsum("bhwc,hkc->bhwk", qg, r_h).reshape(b, n, gh)
        rw = jnp.einsum("bhwc,wkc->bhwk", qg, r_w).reshape(b, n, gw)
        out = flash_attention_relpos(q, k, v, rh, rw, grid_size=(gh, gw),
                                     scale=scale, block_q=block,
                                     block_k=block, interpret=True)
        return jnp.sum(out * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    for a, bb, name in zip(g_ref, g_kernel, "qkv"):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a), atol=2e-4,
                                   rtol=2e-4, err_msg=f"d{name}")


def test_fused_mha_stacked_degrades_per_shape(monkeypatch):
    """With stacking enabled globally, shapes whose stacked working set
    busts VMEM must fall back to the UNSTACKED pair body (keeping the
    kernel) rather than losing the kernel entirely — regression for
    patch8-ViT (N=785, bf16), which fits unstacked but not stacked."""
    from tfimm_tpu.ops.pallas import fused_mha as fm

    # Gate arithmetic: the exact patch8 shape decision.
    assert fm._fwd_kernel_fits(785, 768, 2, stacked=False)
    assert not fm._fwd_kernel_fits(785, 768, 2, stacked=True)
    assert fm._bwd_kernel_fits(197, 768, 2, stacked=False)

    # End-to-end: the dispatcher accepts the shape with stacking on, and
    # the (downgraded) kernel matches the XLA twin.
    monkeypatch.setenv("TFIMM_TPU_MHA_STACKED", "1")
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(23)
    n, h, d = 48, 4, 64
    dim = h * d
    qkv = jnp.asarray(rng.normal(size=(2, n, 3 * dim)), jnp.bfloat16)
    out = fm.fused_mha(qkv, h, d ** -0.5, interpret=True, stacked=None)
    ref = fm._reference_mha(qkv, h, d ** -0.5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_flash_relpos_paired_declines_odd_rows(monkeypatch):
    """Odd B (or d != 64) keeps the per-head path — results must still be
    correct (the gate, not the kernel, handles it)."""
    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        add_decomposed_rel_pos,
    )
    from tfimm_tpu.ops.pallas.flash_attention_relpos import (
        flash_attention_relpos,
    )

    monkeypatch.setenv("TFIMM_TPU_RELPOS_PAIRED", "1")
    b, gh, gw, d = 3, 4, 8, 64
    n = gh * gw
    q, k, v, rel_pos_h, rel_pos_w, r_h, r_w, _ = _relpos_case(17, gh, gw, d,
                                                              b=b)
    scale = d ** -0.5
    attn = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    attn = add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, (gh, gw),
                                  (gh, gw), False)
    ref = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(attn, -1), v)
    qg = q.reshape(b, gh, gw, d)
    rh_term = jnp.einsum("bhwc,hkc->bhwk", qg, r_h).reshape(b, n, gh)
    rw_term = jnp.einsum("bhwc,wkc->bhwk", qg, r_w).reshape(b, n, gw)
    out = flash_attention_relpos(q, k, v, rh_term, rw_term,
                                 grid_size=(gh, gw), scale=scale,
                                 block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


def test_fused_mha_matches_reference():
    """Masked-pair fused MHA kernel vs the reference path (interpret mode)."""
    import numpy as np

    from tfimm_tpu.ops.attention import _reference_attention
    from tfimm_tpu.ops.pallas.fused_mha import fused_mha

    b, n, heads, d = 2, 197, 4, 64
    dim = heads * d
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * dim)), jnp.float32)

    out = fused_mha(qkv, heads, d ** -0.5, interpret=True)

    q, k, v = (qkv.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)[i]
               for i in range(3))
    ref, _ = _reference_attention(q, k, v, scale=d ** -0.5)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, n, dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_mha_dispatch_conditions():
    import numpy as np

    from tfimm_tpu.ops.pallas.fused_mha import fused_mha_or_none

    qkv = jnp.zeros((1, 8, 3 * 256), jnp.float32)
    # d=32 (8 heads) -> pairs are 64 lanes, must refuse
    assert fused_mha_or_none(qkv, 8, 1.0) is None
    # CPU backend -> refuse even for valid shapes
    qkv = jnp.zeros((1, 8, 3 * 128), jnp.float32)
    assert fused_mha_or_none(qkv, 2, 1.0) is None


def test_fused_mha_declines_odd_heads(monkeypatch):
    """Odd head counts stay on XLA — a zero-padded 4th head was measured
    NEGATIVE on vit_tiny (28349 -> 23004 img/s); see fused_mha_or_none."""
    from tfimm_tpu.ops.pallas.fused_mha import fused_mha_or_none

    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    qkv = jnp.zeros((1, 8, 3 * 192), jnp.float32)
    assert fused_mha_or_none(qkv, 3, 1.0) is None


def test_fused_mha_vjp_matches_autodiff():
    """Custom-VJP backward (Pallas) vs XLA autodiff of the reference path."""
    import numpy as np

    from tfimm_tpu.ops.pallas.fused_mha import fused_mha_diff

    b, n, heads, d = 2, 64, 2, 64
    dim = heads * d
    scale = d ** -0.5
    rng = np.random.default_rng(1)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * dim)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)

    def ref_fn(qkv):
        q, k, v = (qkv.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)[i]
                   for i in range(3))
        s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return o.transpose(0, 2, 1, 3).reshape(b, n, dim)

    out_ref, vjp_ref = jax.vjp(ref_fn, qkv)
    (dqkv_ref,) = vjp_ref(g)

    out, vjp = jax.vjp(lambda q: fused_mha_diff(q, heads, scale, True), qkv)
    (dqkv,) = vjp(g)

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n", [197, 64])  # ragged + sublane-aligned halves
def test_fused_mha_stacked_matches_reference(n):
    """Sublane-stacked pair body (half the matmuls) vs the reference path."""
    import numpy as np

    from tfimm_tpu.ops.attention import _reference_attention
    from tfimm_tpu.ops.pallas.fused_mha import fused_mha

    b, heads, d = 2, 4, 64
    dim = heads * d
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * dim)), jnp.float32)

    out = fused_mha(qkv, heads, d ** -0.5, interpret=True, stacked=True)

    q, k, v = (qkv.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)[i]
               for i in range(3))
    ref, _ = _reference_attention(q, k, v, scale=d ** -0.5)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, n, dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("n", [29, 64])  # ragged + sublane-aligned halves
def test_fused_mha_stacked_vjp_matches_autodiff(n, monkeypatch):
    """Stacked backward (5 matmuls vs 10) vs XLA autodiff of the reference."""
    import numpy as np

    from tfimm_tpu.ops.pallas.fused_mha import fused_mha_diff

    monkeypatch.setenv("TFIMM_TPU_MHA_STACKED", "1")
    b, heads, d = 2, 2, 64
    dim = heads * d
    scale = d ** -0.5
    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * dim)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)

    def ref_fn(qkv):
        q, k, v = (qkv.reshape(b, n, 3, heads, d).transpose(2, 0, 3, 1, 4)[i]
                   for i in range(3))
        s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return o.transpose(0, 2, 1, 3).reshape(b, n, dim)

    out_ref, vjp_ref = jax.vjp(ref_fn, qkv)
    (dqkv_ref,) = vjp_ref(g)

    out, vjp = jax.vjp(lambda q: fused_mha_diff(q, heads, scale, True), qkv)
    (dqkv,) = vjp(g)

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(dqkv_ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_mha_bwd_vmem_fallback(monkeypatch):
    """When the Pallas backward would not fit VMEM (e.g. vit_base_patch8,
    N=785 — found OOMing by the zoo sweep), the custom VJP must fall back
    to the XLA twin's gradient while keeping the fused forward. Gradients
    through both paths must agree."""
    import numpy as np

    from tfimm_tpu.ops.pallas import fused_mha as fm

    b, n, heads, d = 2, 64, 2, 64
    dim = heads * d
    scale = d ** -0.5
    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * dim)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(b, n, dim)), jnp.float32)

    out_k, vjp_k = jax.vjp(lambda q: fm.fused_mha_diff(q, heads, scale, True),
                           qkv)
    (dqkv_k,) = vjp_k(g)

    monkeypatch.setattr(fm, "_VMEM_LIMIT_BYTES", 0)  # force the fallback
    assert not fm._bwd_kernel_fits(n, dim, 4)
    out_f, vjp_f = jax.vjp(lambda q: fm.fused_mha_diff(q, heads, scale, True),
                           qkv)
    (dqkv_f,) = vjp_f(g)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_k),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dqkv_f), np.asarray(dqkv_k),
                               atol=1e-4, rtol=1e-4)


def test_sam_windowed_attention_kernel_dispatch(monkeypatch):
    """SAM RelPosAttention at window scale (14x14 grid, N=196): the fused
    rel-pos kernel branch (interpret mode) matches the XLA path — covers the
    new windowed dispatch in image_encoder.py end to end on CPU."""
    import numpy as np

    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        RelPosAttention,
    )
    from tfimm_tpu.core import Context

    attn = RelPosAttention(
        fixed_input_size=True, embed_dim=64, nb_heads=2, qkv_bias=True,
        use_rel_pos=True, drop_rate=0.0, attn_drop_rate=0.0,
        rel_pos_size=(14, 14))
    p = attn.init(jax.random.PRNGKey(0))
    p["rel_pos_h"] = jnp.asarray(
        np.random.default_rng(1).normal(size=p["rel_pos_h"].shape) * 0.05,
        jnp.float32)
    p["rel_pos_w"] = jnp.asarray(
        np.random.default_rng(2).normal(size=p["rel_pos_w"].shape) * 0.05,
        jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(3, 14, 14, 64)),
                    jnp.float32)
    with Context(training=False):
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "1")
        ref = attn(p, x)
        monkeypatch.setenv("TFIMM_TPU_NO_FLASH", "0")
        monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
        out = attn(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
