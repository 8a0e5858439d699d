"""Compiler-verified max batch sizes — no TPU required.

The round-2 measured sweep (results/v5e_maxbatch.csv) was capped at
2048/512 by remote-compile infra errors, so its batch bounds are lower
bounds, not maxima. XLA:TPU allocates statically, so the deviceless
compile's memory analysis (args + outputs + temps - aliased) against the
v5e HBM budget IS the OOM boundary up to the runtime's reserved slice —
and it needs no hardware or tunnel.

The compiler itself is the OOM oracle: XLA:TPU fails compilation with
"Ran out of memory in memory space hbm. Used <x>G of 15.75G hbm" when the
program cannot fit — the deviceless compile enforces a 15.75 GiB budget
on its own accounting, i.e. it already derates 0.25 GiB from the 16 GiB
physical HBM — and auto-remats near the boundary to make it fit when it
can (which is why a linear memory extrapolation UNDERestimates the true
max). Method per
(model, target): fit a linear memory model from two cheap probes to seed
the search, then gallop/bisect on compile success at multiple-of-8
granularity, stopping at a ~3% relative gap (each compile costs minutes;
a tighter bound has no operational value). The reported max_batch_size is
compile-verified to fit and fail_batch_size (at most ~3% above it) is
compile-verified to be rejected.

Accounting caveats, so the CSV reads honestly:
- memory_analysis_bytes is jax's arg+out+temp-alias sum at the max batch.
  It approximates but does NOT equal the quantity the compiler's internal
  HBM check bounds (donation/aliasing edge cases differ — backprop rows
  can exceed 16 GiB on this metric yet compile), and one observed
  rejection class (convnext_base inference) trips a compiler limit well
  below total-HBM. The compile verdict, not this column, is the boundary.
- The deviceless compile bounds against the chip's full HBM; it knows
  nothing of the runtime's reserved slice (~0.75 GiB on a real v5e), so
  rows are compiler bounds, not runtime guarantees, until the oracle is
  calibrated against one real on-chip OOM (TODO playbook).

Writes results/v5e_maxbatch_compile.csv (resumable; rows are skipped on
rerun). ~1-3 min per compile on one core.
"""

import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
# Dispatch the Pallas kernels exactly as on the chip: the memory analysis
# must describe the shipping path (the XLA fallback stores score tensors
# for backward that the kernels' custom VJPs never materialize).
os.environ["TFIMM_TPU_ASSUME_TPU"] = "1"

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "..", "results",
                   "v5e_maxbatch_compile.csv")
BUDGET = int((16 - 0.75) * 2 ** 30)

MODELS = [
    "vit_tiny_patch16_224", "vit_base_patch16_224", "deit_base_patch16_224",
    "swin_tiny_patch4_window7_224", "convnext_tiny", "convnext_base",
    "resnet18", "resnet50", "efficientnet_b0", "mixer_b16_224",
    "poolformer_s12", "pvt_v2_b0", "cait_s24_224", "resnetv2_50x1_bitm",
    "vgg16",
]

_TOPO = topologies.get_topology_desc("v5e:1x1", "tpu",
                                     chips_per_host_bounds=(1, 1, 1))
SHARD = NamedSharding(Mesh(np.array(_TOPO.devices), ("x",)), P())


def _aval(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype, sharding=SHARD)


def _tree_avals(tree):
    return jax.tree.map(lambda a: _aval(a.shape, a.dtype), tree)


def compiled_bytes(model, target, bs):
    h, w = model.cfg.input_size
    x = _aval((bs, h, w, model.cfg.in_channels), jnp.bfloat16)
    pav = _tree_avals(model.params)

    if target == "inference":

        def step(params, x):
            y = model.apply(params, x, training=False)
            return y[0] if isinstance(y, tuple) else y

        c = jax.jit(step).trace(pav, x).lower().compile()
    else:
        tx = optax.sgd(0.01)
        oav = _tree_avals(jax.eval_shape(tx.init, model.params))

        def step(params, opt_state, x):
            def loss_fn(p):
                y = model.apply(p, x, training=False)
                out = y[0] if isinstance(y, tuple) else y
                return out.astype(jnp.float32).mean()

            grads = jax.grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        c = jax.jit(step, donate_argnums=(0, 1)).trace(
            pav, oav, x).lower().compile()
    ma = c.memory_analysis()
    return (ma.argument_size_in_bytes + ma.output_size_in_bytes
            + ma.temp_size_in_bytes - ma.alias_size_in_bytes)


def fits(model, target, bs):
    """Compile oracle: returns the HBM bytes on success, None on the
    compiler's out-of-HBM rejection (any other error propagates)."""
    try:
        return compiled_bytes(model, target, bs)
    except Exception as e:  # jaxlib raises backend-specific error types
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg or "hbm usage" in msg.lower():
            # Log the first line so an audit can distinguish the compiler's
            # genuine "Total hbm usage >= 16.0G" rejection from any other
            # RESOURCE_EXHAUSTED (the boundary claim rests on the former).
            print(f"  oom@{bs}: {msg.splitlines()[0][:160]}", flush=True)
            return None
        raise


def find_max_batch(model, target, lo=32, hi=256):
    """Returns (good, good_bytes, bad): good compiled, bad was rejected."""
    m_lo = fits(model, target, lo)
    if m_lo is None:
        return 0, 0, lo
    m_hi = fits(model, target, hi)
    if m_hi is None:
        good, good_m, bad = lo, m_lo, hi
    else:
        # Seed the gallop from a linear extrapolation of the two probes
        # (an underestimate when the compiler remats near the boundary);
        # step past hi so the first fits() call is a new batch size.
        slope = max((m_hi - m_lo) / (hi - lo), 1.0)
        bs = max(int((BUDGET - m_lo + slope * lo) / slope) // 8 * 8,
                 hi + 8)
        good, good_m = hi, m_hi
        while True:
            m = fits(model, target, bs)
            if m is None:
                bad = bs
                break
            good, good_m = bs, m
            bs = max(bs + 8, int(bs * 1.25) // 8 * 8)
    # ~3% relative granularity: each compile costs 1-3 minutes, and a
    # batch bound tighter than a few percent has no operational value.
    while bad - good > max(8, good // 32):
        mid = (good + bad) // 2 // 8 * 8
        if mid in (good, bad):
            break
        m = fits(model, target, mid)
        if m is None:
            bad = mid
        else:
            good, good_m = mid, m
    return good, good_m, bad


def done_rows():
    if not os.path.exists(OUT):
        return set()
    with open(OUT) as f:
        return {(r["model"], r["target"]) for r in csv.DictReader(f)}


def main():
    from tfimm_tpu import create_model

    only = sys.argv[1:] or MODELS
    done = done_rows()
    new = not os.path.exists(OUT)
    with open(OUT, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["model", "dtype", "target", "max_batch_size",
                        "memory_analysis_bytes", "fail_batch_size"])
        for name in only:
            model = None
            for target in ("inference", "backprop"):
                if (name, target) in done:
                    print(f"skip {name} {target}", flush=True)
                    continue
                if model is None:
                    model = create_model(name, dtype=jnp.bfloat16)
                print(f"probe {name} {target} ...", flush=True)
                try:
                    bs, m, bad = find_max_batch(model, target)
                except Exception as e:  # noqa: BLE001 — record and move on
                    print(f"  FAILED {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)
                    continue
                w.writerow([name, "bfloat16", target, bs, m, bad])
                f.flush()
                print(f"  max_bs={bs} ({m / 2 ** 30:.2f} GiB), "
                      f"fail@{bad}", flush=True)


if __name__ == "__main__":
    main()
