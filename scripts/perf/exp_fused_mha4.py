"""fused_mha softmax/structure ablations (round 3).

decompose_roofline.py shows the ViT-B attention kernel is the ONLY
sub-peak component left: 0.773 ms/layer vs a 0.37 ms padded-MXU floor
(= padded 2x FLOPs at 197 TF/s). This isolates where the other 0.4 ms
lives with one-change variants at B=128, N=197, D=768:

  base     : shipping _pair_attention (softmax = max/sub/exp/sum/div, f32)
  nosm     : softmax -> s * 0.005 (pure matmul skeleton; softmax cost)
  exp2     : exp -> exp2 with the log2(e) scale folded into q's scale
  nomax    : skip the row-max subtraction (exp(s)/sum; measurement only)
  rows2    : 2 batch rows per program (amortize per-program overhead)

Usage: python scripts/perf/exp_fused_mha4.py [variants...]
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

from tfimm_tpu.utils.constants import V5E_BF16_PEAK_FLOPS as PEAK  # noqa: E402
LOG2E = 1.4426950408889634


def timeit(fn, args, n1=10, n2=60, min_signal=0.4):
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

    def slope(a, b):
        t1, t2 = t(a), t(b)
        for _ in range(3):
            if t2 > t1:
                break
            t1, t2 = t(a), t(b)
        return (t2 - t1) / (b - a)

    np.asarray(jax.block_until_ready(run(args, 2)))
    est = slope(n1, n2)
    need = int(min_signal / max(est, 1e-7))
    if need > (n2 - n1):
        est = slope(n1, min(n1 + need, 20000))
    return est


def make_mha(variant: str, n: int, dim: int, nb_heads: int, scale: float):
    d = dim // nb_heads
    n_pairs = nb_heads // 2
    rows = 2 if variant == "rows2" else 1

    def pair_attention(qp, kp, vp):
        nn = qp.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (nn, 128), 1)
        qf = qp.astype(jnp.float32) * (scale * (LOG2E if variant == "exp2"
                                                else 1.0))
        out = None
        for sel in (lane < 64, lane >= 64):
            km = jnp.where(sel, kp, 0)
            vm = jnp.where(sel, vp, 0)
            s = jax.lax.dot_general(
                qf, km.astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if variant == "nosm":
                p = s * 0.005
            elif variant == "exp2":
                e = jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True))
                p = e / jnp.sum(e, axis=-1, keepdims=True)
            elif variant == "nomax":
                e = jnp.exp(s)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
            else:
                p = jax.nn.softmax(s, axis=-1)
            o = jax.lax.dot_general(
                p.astype(vm.dtype), vm,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out = o if out is None else out + o
        return out

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for r in range(rows):
            for pp in range(n_pairs):
                sl = slice(pp * 128, (pp + 1) * 128)
                o_ref[r, :, sl] = pair_attention(
                    q_ref[r, :, sl], k_ref[r, :, sl], v_ref[r, :, sl]
                ).astype(o_ref.dtype)

    def call(qkv):
        b = qkv.shape[0]

        def spec(part):
            return pl.BlockSpec((rows, n, dim),
                                lambda i, part=part: (i, 0, part),
                                memory_space=pltpu.VMEM)

        return pl.pallas_call(
            kernel,
            grid=(b // rows,),
            in_specs=[spec(0), spec(1), spec(2)],
            out_specs=pl.BlockSpec((rows, n, dim), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n, dim), qkv.dtype),
        )(qkv, qkv, qkv)

    return call


def main():
    B, N, D, H = 128, 197, 768, 12
    scale = (D // H) ** -0.5
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.uniform(-1, 1, size=(B, N, 3 * D)), jnp.bfloat16)
    useful = 2 * 2 * B * H * N * N * (D // H)

    variants = sys.argv[1:] or ["base", "nosm", "exp2", "nomax", "rows2"]
    for v in variants:
        try:
            call = make_mha(v, N, D, H, scale)
            s = timeit(lambda q: call(q), (qkv,))
            print(f"{v:8s}: {s*1e3:7.3f} ms  {useful/s/1e12:5.1f} TF/s "
                  f"useful ({100*useful/s/PEAK:4.1f}%; x2 physical w/ d=64 "
                  f"padding)", flush=True)
        except Exception as e:
            print(f"{v:8s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
