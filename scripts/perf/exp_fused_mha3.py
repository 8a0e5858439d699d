"""Fused-MHA kernel round 3: masked-pair matmuls — no sub-128 lane slices.

Trick: for a head pair packed as 128 lanes [h0 | h1], compute
    s0 = q_pair @ (k_pair * mask_lo)^T        (contraction 128, full MXU)
    s1 = q_pair @ (k_pair * mask_hi)^T
    o_pair = softmax(s0) @ (v_pair * mask_lo) + softmax(s1) @ (v_pair * mask_hi)
The zero lanes make the cross-head terms vanish, every matmul is full
128-contraction, and the output block is written whole. FLOP count equals
what the MXU would spend padding d=64 to 128 anyway.

Variants: grid (B,) with 6 pairs per program; grid (B, 6); grid (B, 2).
Baseline from round 2: V2 sliced all-heads 0.866 ms; XLA 1.17 ms.
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


def _pair_attention(qp, kp, vp, scale):
    """qp/kp/vp: (N, 128) two heads side by side. Returns (N, 128) output."""
    n = qp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
    out = None
    qf = qp.astype(jnp.float32) * scale
    for h, sel in ((0, lane < 64), (1, lane >= 64)):
        km = jnp.where(sel, kp, 0)
        vm = jnp.where(sel, vp, 0)
        s = jax.lax.dot_general(
            qf, km.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(vm.dtype), vm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = o if out is None else out + o
    return out


def fused_mha_masked(qkv, nb_heads, scale, pairs_per_program=6):
    b, n, three_d = qkv.shape
    dim = three_d // 3
    d = dim // nb_heads
    assert 2 * d == 128
    n_pairs = nb_heads // 2
    ppp = pairs_per_program
    grid = (b, n_pairs // ppp)

    def spec(part):
        return pl.BlockSpec(
            (1, n, ppp * 128),
            lambda i, j, part=part: (i, 0, part * (n_pairs // ppp) + j),
            memory_space=pltpu.VMEM,
        )

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for pp in range(ppp):
            sl = slice(pp * 128, (pp + 1) * 128)
            o_ref[0, :, sl] = _pair_attention(
                q_ref[0, :, sl], k_ref[0, :, sl], v_ref[0, :, sl], scale
            ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec(
            (1, n, ppp * 128), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), qkv.dtype),
    )(qkv, qkv, qkv)


def reference_mha_from_packed(qkv, nb_heads, scale):
    b, n, three_d = qkv.shape
    dim = three_d // 3
    d = dim // nb_heads
    qkv = qkv.reshape(b, n, 3, nb_heads, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return o.transpose(0, 2, 1, 3).reshape(b, n, dim)


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

    np.asarray(jax.block_until_ready(run(args, 3)))
    t1, t2 = t(n1), t(n2)
    if t2 <= t1:
        t1, t2 = t(n1), t(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    B, N, D, H = 128, 197, 768, 12
    d = D // H
    scale = d ** -0.5
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(0, 1, size=(B, N, 3 * D)), jnp.bfloat16)
    flops = 2 * 2 * B * H * N * N * d

    qkv32 = jnp.asarray(rng.normal(0, 1, size=(4, N, 3 * D)), jnp.float32)
    ref32 = np.asarray(reference_mha_from_packed(qkv32, H, scale))
    for ppp in (6, 1, 3):
        fn = lambda q, ppp=ppp: fused_mha_masked(q, H, scale,
                                                 pairs_per_program=ppp)
        err = np.abs(np.asarray(fn(qkv32)) - ref32).max()
        secs = timeit(fn, (qkv,))
        print(f"masked pairs ppp={ppp}: err {err:.1e}  {secs*1e3:7.3f} ms "
              f"{flops/secs/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
