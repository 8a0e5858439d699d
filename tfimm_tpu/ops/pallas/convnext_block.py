"""Fused ConvNeXt block kernel: dwconv7x7 + LayerNorm + MLP + layer scale +
residual in a single VMEM-resident pass.

The 7x7 depthwise conv holds ~1.5% of ConvNeXt's FLOPs but ~half its runtime
on TPU (VPU-bound, measured via ablation on v5e), and the XLA path makes
~8 HBM round trips per block (dw out, LN out, fc1 out, gelu out, fc2 out,
scale, residual). This kernel processes one batch element per program with
the whole feature map in VMEM (ConvNeXt-B worst case: 58x58x128 input +
56x56x512 MLP hidden ≈ 5 MB bf16): the depthwise conv is 49 statically
unrolled shifted FMAs on the VPU, the MLP matmuls run on the MXU, and only
the block input and output touch HBM.

STATUS (v5e, round 1): measured *slower* than XLA's fused path end to end
(2309 vs 2503 img/s, ConvNeXt-B bs128 bf16) — the unaligned sublane shifts
for the 49 taps cost more in VMEM relayouts than the saved HBM round trips.
Kept as verified groundwork (parity test in tests/ops); dispatch is opt-in
via TFIMM_TPU_FUSED_CONVNEXT=1 pending a shift-free tap layout (e.g. W-major
relayout or ring-buffered rows).
Parity oracle: architectures/convnext.py's ConvNeXtBlock.__call__.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_convnext_block"]


def _kernel(xpad_ref, dw_w_ref, dw_b_ref, ln_s_ref, ln_b_ref, fc1_w_ref,
            fc1_b_ref, fc2_w_ref, fc2_b_ref, gamma_ref, o_ref, *, h: int,
            w: int, eps: float):
    c = xpad_ref.shape[-1]
    x = xpad_ref[0]  # (h+6, w+6, c)

    # Depthwise 7x7 as 49 statically-unrolled shifted FMAs (VPU).
    acc = jnp.zeros((h, w, c), jnp.float32)
    for i in range(7):
        for j in range(7):
            tap = dw_w_ref[i * 7 + j, :].astype(jnp.float32)      # (c,)
            acc = acc + x[i:i + h, j:j + w, :].astype(jnp.float32) * tap
    acc = acc + dw_b_ref[0].astype(jnp.float32)

    # LayerNorm over channels (f32).
    mean = acc.mean(axis=-1, keepdims=True)
    var = jnp.maximum((acc * acc).mean(axis=-1, keepdims=True)
                      - mean * mean, 0.0)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_s_ref[0].astype(jnp.float32) + ln_b_ref[0].astype(jnp.float32)

    # MLP on the MXU: (h*w, c) @ (c, 4c) -> gelu -> @ (4c, c).
    y2 = y.reshape(h * w, c).astype(xpad_ref.dtype)
    hdn = jax.lax.dot_general(
        y2, fc1_w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + fc1_b_ref[0].astype(jnp.float32)
    hdn = jax.nn.gelu(hdn, approximate=True).astype(xpad_ref.dtype)
    out = jax.lax.dot_general(
        hdn, fc2_w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + fc2_b_ref[0].astype(jnp.float32)

    # Layer scale + residual (residual = unpadded input view).
    out = out * gamma_ref[0].astype(jnp.float32)
    res = x[3:3 + h, 3:3 + w, :].astype(jnp.float32).reshape(h * w, c)
    o_ref[0] = (out + res).reshape(h, w, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_convnext_block(x, dw_kernel, dw_bias, ln_scale, ln_bias, fc1_kernel,
                         fc1_bias, fc2_kernel, fc2_bias, gamma,
                         eps: float = 1e-6, interpret: bool = False):
    """x: (B, H, W, C) NHWC; dw_kernel: (7, 7, 1, C) HWIO; dense kernels
    (C, hidden), (hidden, C). Returns the full ConvNeXt block output."""
    b, h, w, c = x.shape
    hidden = fc1_kernel.shape[1]
    xpad = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    dw_w = dw_kernel.reshape(49, c)

    def vec(a):  # 1D params as (1, n) for VMEM
        return a.reshape(1, -1)

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 6, w + 6, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (49 + 2 * hidden),
            bytes_accessed=2 * b * h * w * c * x.dtype.itemsize,
            transcendentals=b * h * w * hidden,
        ),
    )(xpad, dw_w, vec(dw_bias), vec(ln_scale), vec(ln_bias), fc1_kernel,
      vec(fc1_bias), fc2_kernel, vec(fc2_bias), vec(gamma))
    return out
