"""Experiment: Pallas depthwise-conv 7x7 (stride 1, symmetric pad 3) for
ConvNeXt. XLA's lowering measured 2.4-4.5 TF/s (it dominates ConvNeXt-B
despite being ~3% of FLOPs); the op is HBM-bound in principle (read+write
only), so a VMEM-resident kernel doing 49 shifted multiply-accumulates
should approach bandwidth.

Variants:
  A) one batch row per program, taps via jnp.roll + edge masks, f32 acc
  B) same but accumulate in the io dtype (bf16) — halves VPU traffic
  C) fused dwconv + LayerNorm (saves one HBM round trip of the block input)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7
PAD = 3


def _taps_from_pad(pad_ref, h, wdt, w_ref, b_ref, acc_dtype):
    """49 static-slice MACs from a zero-padded VMEM scratch (one live
    temporary at a time — concat-based shifting blew the Mosaic stack)."""
    acc = None
    for dy in range(K):
        for dx in range(K):
            shifted = pad_ref[dy:dy + h, dx:dx + wdt, :]
            tap = w_ref[dy, dx].astype(acc_dtype)
            term = shifted.astype(acc_dtype) * tap
            acc = term if acc is None else acc + term
    return acc + b_ref[0].astype(acc_dtype)


def dwconv7(x, w, b, acc_dtype=jnp.float32, interpret=False):
    """x: (B, H, W, C); w: (7, 7, C); b: (C,)."""
    bsz, h, wdt, c = x.shape

    def kernel(x_ref, w_ref, b_ref, o_ref, pad_ref):
        pad_ref[...] = jnp.zeros_like(pad_ref)
        pad_ref[PAD:PAD + h, PAD:PAD + wdt, :] = x_ref[0]
        o_ref[0] = _taps_from_pad(pad_ref, h, wdt, w_ref, b_ref,
                                  acc_dtype).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2 * PAD, wdt + 2 * PAD, c), x.dtype)],
        interpret=interpret,
    )(x, w, b.reshape(1, -1))


def dwconv7_ln(x, w, b, ln_s, ln_b, eps=1e-6, interpret=False):
    """Fused dwconv7 + LayerNorm over channels."""
    bsz, h, wdt, c = x.shape

    def kernel(x_ref, w_ref, b_ref, s_ref, lb_ref, o_ref, pad_ref):
        pad_ref[...] = jnp.zeros_like(pad_ref)
        pad_ref[PAD:PAD + h, PAD:PAD + wdt, :] = x_ref[0]
        y = _taps_from_pad(pad_ref, h, wdt, w_ref, b_ref, jnp.float32)
        mean = y.mean(axis=-1, keepdims=True)
        var = jnp.maximum(jnp.square(y).mean(axis=-1, keepdims=True)
                          - jnp.square(mean), 0.0)
        yn = (y - mean) * jax.lax.rsqrt(var + eps)
        yn = yn * s_ref[0].astype(jnp.float32) + lb_ref[0].astype(jnp.float32)
        o_ref[0] = yn.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2 * PAD, wdt + 2 * PAD, c), x.dtype)],
        interpret=interpret,
    )(x, w, b.reshape(1, -1), ln_s.reshape(1, -1), ln_b.reshape(1, -1))


def timeit(fn, args, n1=5, n2=30):
    @jax.jit
    def run(args, n):
        def body(_, c):
            out = fn(*c[1:], c[0])
            return (c[0] + (out.mean() * 0).astype(c[0].dtype),) + c[1:]
        return jax.lax.fori_loop(0, n, body, args)[0].mean()

    def t(n):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(run(args, n)))
        return time.perf_counter() - t0

    np.asarray(jax.block_until_ready(run(args, 2)))
    t1, t2 = t(n1), t(n2)
    if t2 <= t1:
        t1, t2 = t(n1), t(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    from tfimm_tpu.ops.conv import DepthwiseConv2d
    from tfimm_tpu.ops.norm import LayerNorm

    B = 128
    rng = np.random.default_rng(0)
    for c, hw in [(128, 56), (256, 28), (512, 14), (1024, 7)]:
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, hw, hw, c)), jnp.bfloat16)
        dw = DepthwiseConv2d(c, 7, padding=3)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         dw.init(jax.random.PRNGKey(0)))
        w = p["kernel"].reshape(K, K, c)
        b = p["bias"]

        # numerics
        x32 = jnp.asarray(rng.uniform(-1, 1, size=(2, hw, hw, c)), jnp.float32)
        p32 = {"kernel": p["kernel"].astype(jnp.float32),
               "bias": b.astype(jnp.float32)}
        ref = np.asarray(dw(p32, x32))
        got = np.asarray(dwconv7(x32, w.astype(jnp.float32),
                                 b.astype(jnp.float32), interpret=True))
        err = np.abs(got - ref).max()

        hbm = 2 * B * hw * hw * c * 2  # read + write bytes
        s_xla = timeit(lambda pp, xx: dw(pp, xx), (x, p))
        s_a = timeit(lambda ww, bb, xx: dwconv7(xx, ww, bb), (x, w, b))
        s_b = timeit(lambda ww, bb, xx: dwconv7(xx, ww, bb,
                                                acc_dtype=jnp.bfloat16),
                     (x, w, b))
        ln = LayerNorm(c, eps=1e-6)
        pl_ = ln.init(jax.random.PRNGKey(1))
        s_c = timeit(lambda ww, bb, ss, lb, xx: dwconv7_ln(xx, ww, bb, ss, lb),
                     (x, w, b, pl_["scale"], pl_["bias"]))
        print(f"C={c:4d} {hw}x{hw}: err {err:.1e} | XLA {s_xla*1e3:6.3f} | "
              f"A f32 {s_a*1e3:6.3f} | B bf16 {s_b*1e3:6.3f} | "
              f"C +LN {s_c*1e3:6.3f} ms | HBM floor "
              f"{hbm/819e9*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
