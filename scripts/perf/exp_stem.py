"""Experiment: ConvNeXt-B patchify stem as an explicit reshape+matmul.

The decomposition (results/README.md ConvNeXt-B table) prices the 4x4/
stride-4 stem conv at 0.138 ms — 18% of peak — because the implicit-im2col
contraction is only 4*4*3 = 48 deep (vs the 128-lane MXU). The ViT patch
embed runs the same math at 87% of peak, but its contraction is 16*16*3 =
768. Since stride == kernel (non-overlapping patches), the conv is exactly
a reshape+matmul with NO data duplication:

    (B, 224, 224, 3) -> (B, 56, 4, 56, 4, 3) -> (B, 56, 56, 48) @ (48, 128)

This measures whether the explicit formulation beats XLA's conv lowering
(the analogous ResNet space-to-depth stem measured NEGATIVE — XLA already
runs 7x7/2 as implicit im2col and s2d only added a permutation pass; but
ResNet's stem OVERLAPS so s2d duplicates data, while patchify does not).

Context for scale: the stem is 0.138 ms of a ~40 ms ConvNeXt-B step
(0.35%) — even a full claim moves the model <0.5%. The measurement
settles the named lever either way.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def patchify_matmul(x, kernel, bias, patch=4):
    """x: (B, H, W, C); kernel: (p, p, C, D) HWIO; bias: (D,)."""
    b, h, w, c = x.shape
    d = kernel.shape[-1]
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh, gw, patch * patch * c)
    y = jnp.dot(x, kernel.reshape(patch * patch * c, d).astype(x.dtype))
    return y + bias.astype(y.dtype)


def timeit(fn, args, n1=10, n2=60):
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
    samples = []
    for _ in range(3):
        t1, t2 = t(n1), t(n2)
        if t2 > t1:
            samples.append((t2 - t1) / (n2 - n1))
    return float(np.median(samples))


def main():
    from tfimm_tpu.ops.conv import Conv2d
    from tfimm_tpu.ops.norm import LayerNorm

    B, P, C, D = 128, 4, 3, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(B, 224, 224, C)), jnp.bfloat16)

    conv = Conv2d(C, D, P, stride=P, padding="valid")
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                     conv.init(jax.random.PRNGKey(0)))
    ln = LayerNorm(D, eps=1e-6)
    pln = ln.init(jax.random.PRNGKey(1))

    # Numerics: identical math, fp32.
    x32 = jnp.asarray(rng.uniform(-1, 1, size=(2, 224, 224, C)), jnp.float32)
    p32 = jax.tree.map(lambda a: a.astype(jnp.float32), p)
    ref = np.asarray(conv(p32, x32))
    got = np.asarray(patchify_matmul(x32, p32["kernel"], p32["bias"], P))
    err = np.abs(got - ref).max()
    print(f"fp32 max err conv vs patchify-matmul: {err:.2e}", flush=True)

    flops = 2 * B * 56 * 56 * (P * P * C) * D
    s_conv = timeit(lambda pp, xx: conv(pp, xx), (x, p))
    s_mm = timeit(lambda k, bb, xx: patchify_matmul(xx, k, bb, P),
                  (x, p["kernel"], p["bias"]))
    s_conv_ln = timeit(lambda pp, pl_, xx: ln(pl_, conv(pp, xx)), (x, p, pln))
    s_mm_ln = timeit(
        lambda k, bb, pl_, xx: ln(pl_, patchify_matmul(xx, k, bb, P)),
        (x, p["kernel"], p["bias"], pln))
    for name, s in [("conv", s_conv), ("patchify-mm", s_mm),
                    ("conv+LN", s_conv_ln), ("patchify-mm+LN", s_mm_ln)]:
        print(f"{name:16s} {s*1e3:7.3f} ms  {flops/s/1e12:6.1f} TF/s  "
              f"{flops/s/197e12*100:5.1f}% peak", flush=True)

    # Model-level A/B only matters if the standalone wins; print the bound.
    frac = (s_conv_ln - s_mm_ln) / 0.040  # vs ~40 ms ConvNeXt-B step
    print(f"model-level bound if integrated: {frac*100:+.2f}% of a 40 ms "
          f"ConvNeXt-B bs128 step", flush=True)


if __name__ == "__main__":
    main()
