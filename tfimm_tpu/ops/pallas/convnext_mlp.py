"""Fused ConvNeXt LN+MLP kernel: LayerNorm + fc1 + GELU + fc2 + layer scale
+ residual in one VMEM-resident pass, leaving the 7x7 depthwise conv to XLA
(which measured faster than every Pallas dwconv variant; see
scripts/perf/exp_dwconv.py and results/README.md).

Motivation (ConvNeXt-B decomposition, results/README.md): the standalone
LayerNorm passes cost 3.4 ms/batch (36 calls, zero FLOPs, pure HBM traffic)
because XLA cannot fuse a two-pass channel reduction into either matmul
neighbor. This kernel makes the LN free: each program reads its token block
once, normalizes in f32 in VMEM, and feeds the MXU matmuls directly — the
LN's HBM round trip disappears into the fc1 read. The fc2 epilogue applies
layer scale and the residual add, removing those elementwise passes too.

Layout: tokens flattened to (M, C); grid (M/bm, H/hc) with the hidden
dimension chunked so C=1024 stages (8 MB of MLP weights) still fit the
10 MB VMEM budget. The f32 accumulator scratch carries partial fc2 sums
across hidden chunks; LN is recomputed per chunk (VPU work fully hidden
under the MXU matmuls). GELU follows the library policy: exact-erf for f32,
tanh approximation for bf16 (ops/basic.py).

Parity oracle: architectures/convnext.py ConvNeXtBlock.__call__ (the XLA
composition). Reference for the block semantics:
/root/reference/tfimm/architectures/convnext.py:146-229.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfimm_tpu.ops.pallas.dispatch import interpret_forced, on_tpu
from tfimm_tpu.ops.pallas.swin_block import _gelu_policy

__all__ = ["convnext_mlp", "convnext_mlp_diff", "convnext_mlp_or_none"]

_VMEM_LIMIT_BYTES = 10 * 2 ** 20


def _layer_norm_f32(xf, scale, bias, eps):
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum(jnp.square(xf).mean(axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _pick_blocks(m, c, hidden, itemsize):
    """(bm, hc, vmem_limit) or None.

    Prefers the whole hidden dim resident (hc == hidden): weight blocks with
    constant index maps are fetched once (not double-buffered), so large-C
    stages fit by *raising* the kernel's scoped-VMEM limit instead of
    chunking — measured: the chunked fallback (bm=64 at C=1024) ran 52%
    SLOWER than XLA because 64-row matmuls starve the MXU. Chunked plans are
    kept only as a fallback and only with bm >= 256; otherwise decline (the
    dispatcher then leaves the block on XLA)."""
    def per_row(hc):
        return (2 * 3 * c * itemsize       # x/shortcut/out, double-buffered
                + hc * 4 + hc * itemsize   # fc1 out f32 + gelu out
                + c * 4)                   # f32 accumulator scratch

    # Token-block candidates: sublane-aligned divisors of M, largest first
    # (M is B * H * W — powers of two times 49 for ConvNeXt grids).
    bms = [b for b in range(1024, 216, -8) if m % b == 0]
    if not bms and m % 8 == 0 and m <= 1024:
        bms = [m]  # tiny inputs (tests, small eval batches): one block

    # Measured win region (scripts/perf/exp_convnext_mlp.py, v5e bs128
    # bf16): the kernel beats XLA at C=128/256/512 (MLP weights <= 4 MB
    # resident) and LOSES at C=1024 (weights 16 MB; XLA already runs that
    # stage's MLP at ~93% of peak and the small grid can't amortize the
    # resident-weight load: 0.653 vs 0.572 ms un-chunked, 1.069 vs 0.572
    # chunked). Gate: weights must fit the standard budget; the row working
    # set may raise the scoped-VMEM limit on top.
    weights = 2 * c * hidden * itemsize
    if weights > _VMEM_LIMIT_BYTES:
        return None
    for bm in bms:
        need = weights + bm * per_row(hidden)
        if need <= 48 * 2 ** 20:
            limit = max(_VMEM_LIMIT_BYTES, int(need * 1.25))
            return bm, hidden, min(limit, 64 * 2 ** 20)
    return None


def convnext_mlp(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma, *,
                 eps: float = 1e-6, interpret: bool = False,
                 block_plan=None):
    """x, shortcut: (M, C) tokens (x = dwconv output, shortcut = block
    input). w1: (C, H); w2: (H, C); vectors are (C,)/(H,). Returns (M, C)
    ``shortcut + gamma * fc2(gelu(fc1(LN(x))))`` in x.dtype.
    ``block_plan``: optional (bm, hc, vmem_limit) override (tests/tuning)."""
    m, c = x.shape
    hidden = w1.shape[1]
    itemsize = jnp.dtype(x.dtype).itemsize
    blocks = block_plan or _pick_blocks(m, c, hidden, itemsize)
    if blocks is None:
        raise ValueError(f"convnext_mlp: no block plan for M={m} C={c} "
                         f"H={hidden}")
    bm, hc, vmem_limit = blocks
    nj = hidden // hc
    dtype = x.dtype

    def vec(a):
        return a.reshape(1, -1)

    def kernel(x_ref, sc_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               gm_ref, o_ref, acc_ref):
        j = pl.program_id(1)
        xf = x_ref[...].astype(jnp.float32)
        z = _layer_norm_f32(xf, g_ref[0].astype(jnp.float32),
                            be_ref[0].astype(jnp.float32), eps).astype(dtype)
        s = jax.lax.dot_general(
            z, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0].astype(jnp.float32)
        h = _gelu_policy(s, dtype).astype(dtype)
        contrib = jax.lax.dot_general(
            h, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == 0)
        def _():
            acc_ref[...] = contrib + b2_ref[0].astype(jnp.float32)

        @pl.when(j > 0)
        def _():
            acc_ref[...] = acc_ref[...] + contrib

        @pl.when(j == nj - 1)
        def _():
            out = (sc_ref[...].astype(jnp.float32)
                   + gm_ref[0].astype(jnp.float32) * acc_ref[...])
            o_ref[...] = out.astype(o_ref.dtype)

    io_spec = pl.BlockSpec((bm, c), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    cvec = pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(m // bm, nj),
        in_specs=[
            io_spec, io_spec, cvec, cvec,
            pl.BlockSpec((c, hc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            cvec, cvec,
        ],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(x, shortcut, vec(ln_scale), vec(ln_bias), w1, vec(b1), w2, vec(b2),
      vec(gamma))


def _reference_mlp(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                   eps):
    """Pure-JAX twin (same math, XLA ops) — derives the backward pass and
    serves as the under-AD primal, so gradient workloads run at XLA speed
    (the swin_block_diff pattern)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    z = _layer_norm_f32(xf, ln_scale.astype(jnp.float32),
                        ln_bias.astype(jnp.float32), eps).astype(dt)
    s = jnp.einsum("mc,ch->mh", z, w1.astype(dt),
                   preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = _gelu_policy(s, dt).astype(dt)
    o = jnp.einsum("mh,hc->mc", h, w2.astype(dt),
                   preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    return (shortcut.astype(jnp.float32)
            + gamma.astype(jnp.float32) * o).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def convnext_mlp_diff(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                      eps, interpret):
    return convnext_mlp(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2,
                        gamma, eps=eps, interpret=interpret)


def _fwd(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps,
         interpret):
    # Under differentiation the XLA twin runs for the primal too: fwd/bwd
    # then come from one composition and XLA fuses them (measured faster
    # for every fused block of this family; see swin_block.py).
    out = _reference_mlp(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2,
                         gamma, eps)
    return out, (x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _bwd(eps, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: _reference_mlp(*a, eps), *res)
    return vjp(g)


convnext_mlp_diff.defvjp(_fwd, _bwd)


def convnext_mlp_or_none(x, shortcut, ln_scale, ln_bias, w1, b1, w2, b2,
                         gamma, *, eps: float = 1e-6):
    """Dispatch: fused LN+MLP kernel when it applies, else None.

    ``x``/``shortcut``: (B, H, W, C) (flattened internally). Conditions:
    TPU backend (or forced interpret), C a lane multiple, a block plan that
    fits VMEM. Differentiable (XLA-twin VJP), though ConvNeXt gates training
    to the XLA path anyway."""
    import os

    if os.environ.get("TFIMM_TPU_CONVNEXT_MLP", "1") != "1":
        return None
    interpret = interpret_forced()
    if not (on_tpu() or interpret):
        return None
    b, hh, ww, c = x.shape
    if c % 128:
        return None
    m = b * hh * ww
    hidden = w1.shape[1]
    if hidden % 128:
        return None
    if _pick_blocks(m, c, hidden, jnp.dtype(x.dtype).itemsize) is None:
        return None
    from tfimm_tpu.ops.pallas.dispatch import log_dispatch

    log_dispatch("convnext_mlp")
    out = convnext_mlp_diff(x.reshape(m, c), shortcut.reshape(m, c),
                            ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                            eps, interpret)
    return out.reshape(b, hh, ww, c)
