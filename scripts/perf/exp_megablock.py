"""Experiment: ViT block megakernels.

A) attention megakernel: LN1 + qkv projection + masked-pair attention +
   output projection + residual — one pallas_call, grid (B,). Weights are
   broadcast blocks (same index every program -> stay resident in VMEM).
B) MLP megakernel: LN2 + fc1 + GELU(tanh) + fc2 + residual.

Baseline: the current composite path (XLA LN/projections + fused_mha kernel).
Numerics oracle: ViTBlock in f32.
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


def _ln(x32, scale, bias, eps=1e-6):
    mean = x32.mean(axis=-1, keepdims=True)
    var = jnp.maximum(jnp.square(x32).mean(axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _pair_attention(qp, kp, vp, scale):
    n = qp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
    out = None
    qf = qp.astype(jnp.float32) * scale
    for sel in (lane < 64, lane >= 64):
        km = jnp.where(sel, kp, 0)
        vm = jnp.where(sel, vp, 0)
        s = jax.lax.dot_general(qf, km.astype(jnp.float32),
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(p.astype(vm.dtype), vm,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out = o if out is None else out + o
    return out


def attn_megakernel(x, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj, nb_heads,
                    scale, interpret=False):
    b, n, dim = x.shape
    n_pairs = nb_heads // 2

    def kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref,
               bproj_ref, o_ref):
        x32 = x_ref[0].astype(jnp.float32)
        y = _ln(x32, lns_ref[0].astype(jnp.float32),
                lnb_ref[0].astype(jnp.float32))
        qkv = jax.lax.dot_general(
            y.astype(x_ref.dtype), wqkv_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bqkv_ref[0].astype(jnp.float32)
        qkv = qkv.astype(x_ref.dtype)
        attn = []
        for pp in range(n_pairs):
            qp = qkv[:, pp * 128:(pp + 1) * 128]
            kp = qkv[:, dim + pp * 128:dim + (pp + 1) * 128]
            vp = qkv[:, 2 * dim + pp * 128:2 * dim + (pp + 1) * 128]
            attn.append(_pair_attention(qp, kp, vp, scale).astype(x_ref.dtype))
        a = jnp.concatenate(attn, axis=-1)
        proj = jax.lax.dot_general(
            a, wproj_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bproj_ref[0].astype(jnp.float32)
        o_ref[0] = (x32 + proj).astype(o_ref.dtype)

    def bc(shape):  # broadcast block: same for every program
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bc((1, dim)), bc((1, dim)),
            bc((dim, 3 * dim)), bc((1, 3 * dim)),
            bc((dim, dim)), bc((1, dim)),
        ],
        out_specs=pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        interpret=interpret,
    )(x, ln_s.reshape(1, -1), ln_b.reshape(1, -1), w_qkv,
      b_qkv.reshape(1, -1), w_proj, b_proj.reshape(1, -1))


def mlp_megakernel(x, ln_s, ln_b, w1, b1, w2, b2, interpret=False):
    b, n, dim = x.shape
    hidden = w1.shape[1]

    def kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        x32 = x_ref[0].astype(jnp.float32)
        y = _ln(x32, lns_ref[0].astype(jnp.float32),
                lnb_ref[0].astype(jnp.float32))
        h = jax.lax.dot_general(
            y.astype(x_ref.dtype), w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0].astype(jnp.float32)
        h = jax.nn.gelu(h, approximate=True).astype(x_ref.dtype)
        o = jax.lax.dot_general(
            h, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0].astype(jnp.float32)
        o_ref[0] = (x32 + o).astype(o_ref.dtype)

    def bc(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            bc((1, dim)), bc((1, dim)),
            bc((dim, hidden)), bc((1, hidden)),
            bc((hidden, dim)), bc((1, dim)),
        ],
        out_specs=pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        interpret=interpret,
    )(x, ln_s.reshape(1, -1), ln_b.reshape(1, -1), w1, b1.reshape(1, -1),
      w2, b2.reshape(1, -1))


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
    from tfimm_tpu.architectures.vit import ViTBlock
    from tfimm_tpu.core import Context

    B, N, D, H = 128, 197, 768, 12
    scale = (D // H) ** -0.5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, size=(B, N, D)), jnp.bfloat16)

    blk = ViTBlock(D, H)
    p32 = blk.init(jax.random.PRNGKey(0))
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)

    def mega_block(p, x, interpret=False):
        y = attn_megakernel(
            x, p["norm1"]["scale"], p["norm1"]["bias"],
            p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
            p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"],
            H, scale, interpret=interpret)
        return mlp_megakernel(
            y, p["norm2"]["scale"], p["norm2"]["bias"],
            p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
            p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
            interpret=interpret)

    # numerics vs f32 reference block
    x32 = jnp.asarray(rng.normal(0, 1, size=(4, N, D)), jnp.float32)
    with Context(training=False):
        os.environ["TFIMM_TPU_NO_FLASH"] = "1"
        ref = np.asarray(blk(p32, x32))
        os.environ["TFIMM_TPU_NO_FLASH"] = "0"
    # interpret mode: f32 weights would exceed the scoped VMEM limit on chip
    got = np.asarray(mega_block(p32, x32, interpret=True))
    print(f"numerics f32 (tanh-gelu vs erf): max abs "
          f"{np.abs(got-ref).max():.2e}", flush=True)

    def xla_block(p, x):
        with Context(training=False):
            return blk(p, x)

    flops = (2 * B * N * D * 3 * D + 2 * 2 * B * H * N * N * (D // H)
             + 2 * B * N * D * D + 2 * 2 * B * N * D * 4 * D)
    s0 = timeit(xla_block, (x, p))
    print(f"current block (fused_mha + XLA): {s0*1e3:7.3f} ms "
          f"{flops/s0/1e12:5.1f} TF/s", flush=True)
    s1 = timeit(mega_block, (x, p))
    print(f"megakernel block               : {s1*1e3:7.3f} ms "
          f"{flops/s1/1e12:5.1f} TF/s", flush=True)
    print(f"speedup {s0/s1:.2f}x; 12 blocks -> "
          f"{B/(12*s1):.0f} img/s upper bound", flush=True)


if __name__ == "__main__":
    main()
