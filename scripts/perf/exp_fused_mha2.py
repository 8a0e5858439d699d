"""Fused-MHA kernel variants, round 2: shrink grid overhead.

V1 (round 1): grid (B, H/2) = 768 programs -> 1.43 ms (XLA: 1.23 ms).
V2: grid (B,) — all 12 heads inside one program (python loop, static slices).
V3: V2 + softmax without the max pass (scores are bounded for trained ViTs;
    still f32 exp) — measures the cost of the max pass.
V4: V2 but two batch rows per program, grid (B/2,).
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


def _mha_allheads_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, d, nb_heads,
                         use_max):
    outs = []
    for h in range(nb_heads):
        q = q_ref[0, :, h * d:(h + 1) * d].astype(jnp.float32) * scale
        k = k_ref[0, :, h * d:(h + 1) * d]
        v = v_ref[0, :, h * d:(h + 1) * d]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if use_max:
            p = jax.nn.softmax(s, axis=-1)
        else:
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def fused_mha_allheads(qkv, nb_heads, scale, rows=1, use_max=True):
    b, n, three_d = qkv.shape
    dim = three_d // 3
    d = dim // nb_heads
    grid = (b // rows,)

    def spec(part):
        return pl.BlockSpec(
            (rows, n, dim),
            lambda i, part=part: (i, 0, part),
            memory_space=pltpu.VMEM,
        )

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for r in range(rows):
            outs = []
            for h in range(nb_heads):
                q = q_ref[r, :, h * d:(h + 1) * d].astype(jnp.float32) * scale
                k = k_ref[r, :, h * d:(h + 1) * d]
                v = v_ref[r, :, h * d:(h + 1) * d]
                s = jax.lax.dot_general(
                    q, k.astype(jnp.float32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if use_max:
                    p = jax.nn.softmax(s, axis=-1)
                else:
                    e = jnp.exp(s)
                    p = e / jnp.sum(e, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append(o)
            o_ref[r] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(0), spec(1), spec(2)],
        out_specs=pl.BlockSpec(
            (rows, n, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
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
    for name, fn in [
        ("V2 allheads rows=1", lambda q: fused_mha_allheads(q, H, scale)),
        ("V3 no-max  rows=1", lambda q: fused_mha_allheads(q, H, scale,
                                                           use_max=False)),
        ("V4 allheads rows=2", lambda q: fused_mha_allheads(q, H, scale,
                                                            rows=2)),
    ]:
        err = np.abs(np.asarray(fn(qkv32)) - ref32).max()
        secs = timeit(fn, (qkv,))
        print(f"{name}: err {err:.1e}  {secs*1e3:7.3f} ms "
              f"{flops/secs/1e12:6.1f} TF/s", flush=True)

    s_ref = timeit(lambda q: reference_mha_from_packed(q, H, scale), (qkv,))
    print(f"XLA from packed :          {s_ref*1e3:7.3f} ms "
          f"{flops/s_ref/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
