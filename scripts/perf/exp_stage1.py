"""PVT / PoolFormer stage-1 fused-kernel experiment (VERDICT r2 item 4).

Measures with slope timing at bs128 bf16:
  1. PoolFormer s12 stage-1/2 block: XLA vs fused poolformer_block kernel,
  2. PVT(-v2) stage-1 SRA body: XLA vs fused pvt_sra kernel,
  3. whole-model img/s for poolformer_s12, pvt_tiny, pvt_v2_b0 with kernels
     on vs TFIMM_TPU_NO_FLASH=1.

Usage: python scripts/perf/exp_stage1.py [blocks|models]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


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
    for _ in range(3):
        t1, t2 = t(n1), t(n2)
        if t2 > t1:
            return (t2 - t1) / (n2 - n1)
    raise RuntimeError("non-monotonic timing")


def blocks():
    from tfimm_tpu.architectures.poolformer import PoolFormerBlock
    from tfimm_tpu.architectures.pvt import SpatialReductionAttention
    from tfimm_tpu.core import Context

    B = 128
    rng = np.random.default_rng(0)

    # PoolFormer s12 stages: (C, hw, depth)
    for c, hw, depth in [(64, 56, 2), (128, 28, 2), (320, 14, 6), (512, 7, 2)]:
        blk = PoolFormerBlock(c, 4.0, 0.0, 0.0, "group_norm_1grp", "gelu",
                              1e-5)
        p = blk.init(jax.random.PRNGKey(0))
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, hw, hw, c)), jnp.bfloat16)

        def xla(p, x):
            os.environ["TFIMM_TPU_NO_FLASH"] = "1"
            with Context(training=False):
                return blk(p, x)

        def fused(p, x):
            os.environ["TFIMM_TPU_NO_FLASH"] = "0"
            os.environ["TFIMM_TPU_FUSED_POOLFORMER"] = "1"
            with Context(training=False):
                return blk(p, x)

        s1 = timeit(xla, (x, p))
        try:
            s2 = timeit(fused, (x, p))
        except Exception as e:
            print(f"poolformer C={c}: fused FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        print(f"poolformer block C={c:3d} {hw}x{hw} x{depth}: "
              f"XLA {s1*1e3:7.3f} ms  fused {s2*1e3:7.3f} ms "
              f"({s1/s2:.2f}x)", flush=True)

    # PVT stage-1 SRA: (C, hw, sr, name)
    for c, hw, sr, name in [(64, 56, 8, "pvt_tiny s1"),
                            (32, 56, 8, "pvt_v2_b0 s1"),
                            (128, 28, 4, "pvt_tiny s2 (h2: XLA only)")]:
        h = 1 if hw == 56 else 2
        attn = SpatialReductionAttention(c, h, sr, True, 0.0, 0.0)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                         attn.init(jax.random.PRNGKey(1)))
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, hw * hw, c)),
                        jnp.bfloat16)

        def xla(p, x):
            os.environ["TFIMM_TPU_NO_FLASH"] = "1"
            with Context(training=False):
                return attn(p, x, (hw, hw))

        def fused(p, x):
            os.environ["TFIMM_TPU_NO_FLASH"] = "0"
            os.environ["TFIMM_TPU_FUSED_PVT_SRA"] = "1"
            with Context(training=False):
                return attn(p, x, (hw, hw))

        s1 = timeit(xla, (x, p))
        try:
            s2 = timeit(fused, (x, p))
        except Exception as e:
            print(f"{name}: fused FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"SRA {name:24s}: XLA {s1*1e3:7.3f} ms  fused {s2*1e3:7.3f} ms "
              f"({s1/s2:.2f}x)", flush=True)


def models():
    from tfimm_tpu.utils.profile import time_model

    for name, bs in [("poolformer_s12", 256), ("pvt_tiny", 256),
                     ("pvt_v2_b0", 256)]:
        os.environ["TFIMM_TPU_NO_FLASH"] = "1"
        off = time_model(name, target="inference", batch_size=bs, nb_batches=5)
        os.environ["TFIMM_TPU_NO_FLASH"] = "0"
        os.environ["TFIMM_TPU_FUSED_POOLFORMER"] = "1"
        os.environ["TFIMM_TPU_FUSED_PVT_SRA"] = "1"
        on = time_model(name, target="inference", batch_size=bs, nb_batches=5)
        print(f"{name}: XLA {off:.1f} img/s  kernels {on:.1f} img/s "
              f"({on/off:.2f}x)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "blocks"
    if which in ("blocks", "both"):
        blocks()
    if which in ("models", "both"):
        models()
