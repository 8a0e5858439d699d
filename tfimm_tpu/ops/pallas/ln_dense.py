"""Fused LayerNorm + Dense kernel with a full Pallas backward (ViT training).

Motivation (results/README.md ViT-B/16 backprop decomposition): the 24
standalone LayerNorm f+b rows cost 1.98 ms of the 49.6 ms training step —
zero FLOPs, pure HBM traffic — because XLA cannot fuse a two-pass channel
reduction into either matmul neighbor ACROSS the AD boundary. Both ViT
block norms feed a Dense (LN1 -> qkv, LN2 -> fc1), so one fused
"normalize in VMEM, feed the MXU" primitive covers every standalone LN in
the model:

  forward : read x once -> f32 LN -> z = x_hat*gamma+beta -> y = z @ W + b
            (the LN's HBM round trip disappears into the matmul read)
  backward: two Pallas kernels sharing the forward's recompute trick
            (flash convention — save only x, recompute LN statistics):
    dx pass: dz = g @ W^T, LN backward to dx, with dgamma/dbeta
             accumulated across the row grid (they ride along for free —
             dz and x_hat are already in VMEM)
    dW pass: dW += z^T @ g, db += sum(g), accumulated in a resident f32
             output across the sequential row grid

FLOP count identical to XLA's composition (one matmul per pass); the win
is ~4 M x C HBM passes per LN+Dense pair (x_hat write+read in forward,
dz write+read in backward). Unlike convnext_mlp (whose VJP is the
XLA-twin — inference-only win), the backward here IS Pallas, so the
training path keeps the fusion.

Parity oracle: ``_reference_ln_dense`` (same math, XLA ops). Reference
for the role (not the design): the norm1/norm2 + qkv/fc1 compositions of
tfimm/architectures/vit.py:174-236.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfimm_tpu.ops.pallas.dispatch import interpret_forced, on_tpu

__all__ = ["ln_dense", "ln_dense_diff", "ln_dense_or_none"]

_VMEM_LIMIT_BYTES = 10 * 2 ** 20


def _stats(xf, eps):
    """f32 LN statistics: (mean, rstd) per row. Same formula as the twin
    (mean-of-squares with a zero guard) so AD parity is exact."""
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.maximum(jnp.square(xf).mean(axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    return mean, jax.lax.rsqrt(var + eps)


def _pick_bm(m, c, out, itemsize, *, backward):
    """Row-block size: largest multiple of 8 such that the working set
    fits the (raised) VMEM budget; None if even bm=8 busts it."""
    # Resident weights (+ f32 dW accumulator in the backward).
    fixed = c * out * itemsize + (c * out * 4 + out * 4 if backward else 0)
    if fixed > 24 * 2 ** 20:
        return None
    # Per-row bytes: x + out block (double-buffered) + f32 temps.
    per_row = (2 * (c + out) * itemsize          # x, g/y blocks
               + 2 * c * 4 + out * 4             # f32 x_hat/dz + matmul out
               + c * itemsize)                   # z / dx
    for bm in (512, 384, 256, 128, 64, 32, 16, 8):
        if fixed + bm * per_row <= 24 * 2 ** 20:
            return bm
    return None


def _vmem_limit(need_bytes):
    return min(max(_VMEM_LIMIT_BYTES, int(need_bytes * 1.5)), 64 * 2 ** 20)


def _pad_rows(a, bm):
    m = a.shape[0]
    pad = (-m) % bm
    return (jnp.pad(a, ((0, pad), (0, 0))), m) if pad else (a, m)


def ln_dense(x, gamma, beta, w, b, *, eps: float = 1e-6,
             interpret: bool = False):
    """x: (M, C); gamma/beta: (C,); w: (C, O); b: (O,) or None.
    Returns (M, O) = LN(x) @ w + b in x.dtype."""
    m0, c = x.shape
    out = w.shape[1]
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize
    bm = _pick_bm(m0, c, out, itemsize, backward=False)
    if bm is None:
        raise ValueError(f"ln_dense: no block plan for M={m0} C={c} O={out}")
    x, _ = _pad_rows(x, bm)
    m = x.shape[0]
    has_bias = b is not None
    if b is None:
        b = jnp.zeros((out,), jnp.float32)

    def kernel(x_ref, g_ref, be_ref, w_ref, b_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        mean, rstd = _stats(xf, eps)
        z = ((xf - mean) * rstd * g_ref[0].astype(jnp.float32)
             + be_ref[0].astype(jnp.float32)).astype(dtype)
        y = jax.lax.dot_general(
            z, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_bias:
            y = y + b_ref[0].astype(jnp.float32)
        o_ref[...] = y.astype(o_ref.dtype)

    cvec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ovec = pl.BlockSpec((1, out), lambda i: (0, 0), memory_space=pltpu.VMEM)
    need = (c * out * itemsize
            + bm * (2 * (c + out) * itemsize + 2 * c * 4 + out * 4))
    y = pl.pallas_call(
        kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            cvec, cvec,
            pl.BlockSpec((c, out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            ovec,
        ],
        out_specs=pl.BlockSpec((bm, out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, out), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_vmem_limit(need),
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1), w, b.reshape(1, -1))
    return y[:m0]


def _bwd_dx_call(x, gamma, w, g, eps, interpret):
    """dx + accumulated (dgamma, dbeta). x: (M, C); g: (M, O); w: (C, O)."""
    m0, c = x.shape
    out = w.shape[1]
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize
    bm = _pick_bm(m0, c, out, itemsize, backward=False)
    x, _ = _pad_rows(x, bm)
    g, _ = _pad_rows(g, bm)
    m = x.shape[0]
    nb = m // bm

    def kernel(x_ref, gm_ref, w_ref, g_ref, dx_ref, dg_ref, db_ref):
        i = pl.program_id(0)
        xf = x_ref[...].astype(jnp.float32)
        mean, rstd = _stats(xf, eps)
        xn = (xf - mean) * rstd
        # dz = g @ W^T  (contract the O axis)
        dz = jax.lax.dot_general(
            g_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dgamma = jnp.sum(dz * xn, axis=0, keepdims=True)
        dbeta = jnp.sum(dz, axis=0, keepdims=True)

        @pl.when(i == 0)
        def _():
            dg_ref[...] = dgamma
            db_ref[...] = dbeta

        @pl.when(i > 0)
        def _():
            dg_ref[...] = dg_ref[...] + dgamma
            db_ref[...] = db_ref[...] + dbeta

        dxn = dz * gm_ref[0].astype(jnp.float32)
        dx = rstd * (dxn
                     - dxn.mean(axis=-1, keepdims=True)
                     - xn * (dxn * xn).mean(axis=-1, keepdims=True))
        dx_ref[...] = dx.astype(dx_ref.dtype)

    cvec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    need = (c * out * itemsize
            + bm * (2 * (c + out) * itemsize + 3 * c * 4 + out * 4))
    dx, dgamma, dbeta = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            cvec,
            pl.BlockSpec((c, out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            cvec, cvec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, c), dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(need),
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, -1), w, g)
    return dx[:m0], dgamma[0], dbeta[0]


def _bwd_dw_call(x, gamma, beta, g, eps, interpret):
    """Accumulated (dW, db). Recomputes z from x per row block; the f32
    dW output block has a constant index map, so it stays VMEM-resident
    across the sequential row grid and accumulates in place."""
    m0, c = x.shape
    out = g.shape[1]
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize
    bm = _pick_bm(m0, c, out, itemsize, backward=True)
    x, _ = _pad_rows(x, bm)
    g, _ = _pad_rows(g, bm)
    m = x.shape[0]
    nb = m // bm

    def kernel(x_ref, gm_ref, be_ref, g_ref, dw_ref, db_ref):
        i = pl.program_id(0)
        xf = x_ref[...].astype(jnp.float32)
        mean, rstd = _stats(xf, eps)
        z = ((xf - mean) * rstd * gm_ref[0].astype(jnp.float32)
             + be_ref[0].astype(jnp.float32)).astype(dtype)
        # dW contribution: z^T @ g (contract rows).
        dw = jax.lax.dot_general(
            z, g_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db = jnp.sum(g_ref[...].astype(jnp.float32), axis=0, keepdims=True)

        @pl.when(i == 0)
        def _():
            dw_ref[...] = dw
            db_ref[...] = db

        @pl.when(i > 0)
        def _():
            dw_ref[...] = dw_ref[...] + dw
            db_ref[...] = db_ref[...] + db

    cvec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    need = (c * out * 4 + out * 4
            + bm * (2 * (c + out) * itemsize + 2 * c * 4))
    dw, db = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            cvec, cvec,
            pl.BlockSpec((bm, out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((c, out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, out), jnp.float32),
            jax.ShapeDtypeStruct((1, out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(need),
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, -1), beta.reshape(1, -1), g)
    return dw, db[0]


def _reference_ln_dense(x, gamma, beta, w, b, eps):
    """Pure-JAX twin (same math, XLA ops) — the parity oracle."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean, rstd = _stats(xf, eps)
    z = ((xf - mean) * rstd * gamma.astype(jnp.float32)
         + beta.astype(jnp.float32)).astype(dt)
    y = jnp.einsum("mc,co->mo", z, w.astype(dt),
                   preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ln_dense_diff(x, gamma, beta, w, b, eps, interpret):
    return ln_dense(x, gamma, beta, w, b, eps=eps, interpret=interpret)


def _fwd(x, gamma, beta, w, b, eps, interpret):
    y = ln_dense(x, gamma, beta, w, b, eps=eps, interpret=interpret)
    return y, (x, gamma, beta, w, b is not None)


def _bwd(eps, interpret, res, g):
    x, gamma, beta, w, has_bias = res
    g = g.astype(x.dtype)
    dx, dgamma, dbeta = _bwd_dx_call(x, gamma, w, g, eps, interpret)
    dw, db = _bwd_dw_call(x, gamma, beta, g, eps, interpret)
    return (dx,
            dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype),
            dw.astype(w.dtype),
            db.astype(w.dtype) if has_bias else None)


ln_dense_diff.defvjp(_fwd, _bwd)


def ln_dense_or_none(x, gamma, beta, w, b, *, eps: float = 1e-6):
    """Dispatch: fused LN+Dense when it applies, else None (caller runs the
    unfused composition). x may be (..., C); output keeps leading dims.

    Conditions: TPU backend (or forced interpret), lane-multiple C and O,
    a block plan that fits VMEM, and unquantized params (the kernel reads
    the kernel leaf raw). TFIMM_TPU_LN_DENSE=0 opts out.
    """
    import os

    if os.environ.get("TFIMM_TPU_LN_DENSE", "1") != "1":
        return None
    interpret = interpret_forced()
    if not (on_tpu() or interpret):
        return None
    c = x.shape[-1]
    out = w.shape[1]
    if c % 128 or out % 128:
        return None
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    if _pick_bm(m, c, out, jnp.dtype(x.dtype).itemsize, backward=True) is None:
        return None
    from tfimm_tpu.ops.pallas.dispatch import log_dispatch

    log_dispatch("ln_dense")
    y = ln_dense_diff(x.reshape(m, c), gamma, beta, w, b, eps, interpret)
    return y.reshape(*lead, out)
