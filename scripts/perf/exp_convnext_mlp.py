"""Experiment: fused LN+MLP kernel (ops/pallas/convnext_mlp.py) vs the XLA
composition it replaces — per ConvNeXt-B stage shape and whole-model.

Targets the VERDICT r3 item: the standalone LN passes (3.4 ms/batch, zero
FLOPs) + elementwise layer-scale/residual passes. Rows append to
results/convnext_mlp.csv.

Usage:
  python scripts/perf/exp_convnext_mlp.py micro    # per-stage kernel vs XLA
  python scripts/perf/exp_convnext_mlp.py model    # convnext_base on/off
  python scripts/perf/exp_convnext_mlp.py          # both
"""

import csv
import os
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "results", "convnext_mlp.csv")


def _append(row):
    new = not os.path.exists(OUT)
    with open(OUT, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(["case", "variant", "ms_per_call", "img_per_sec"])
        w.writerow(row)


def micro():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfimm_tpu.ops.pallas.convnext_mlp import (_reference_mlp,
                                                   convnext_mlp)

    B = 128
    # ConvNeXt-B stage shapes + C=768 (convnext_large stage 3, borderline
    # for the weights<=10MB dispatch gate).
    for c, hw in [(128, 56), (256, 28), (512, 14), (768, 14), (1024, 7)]:
        m = B * hw * hw
        hidden = 4 * c
        rng = np.random.default_rng(0)
        dt = jnp.bfloat16
        x = jnp.asarray(rng.normal(size=(m, c)), dt)
        sc = jnp.asarray(rng.normal(size=(m, c)), dt)
        ln_s = jnp.ones((c,), jnp.float32)
        ln_b = jnp.zeros((c,), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(c, hidden)) * 0.02, dt)
        b1 = jnp.zeros((hidden,), jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(hidden, c)) * 0.02, dt)
        b2 = jnp.zeros((c,), jnp.float32)
        gm = jnp.full((c,), 1e-6, jnp.float32)

        def run_case(name, f):
            @jax.jit
            def loop(x, n):
                def body(_, carry):
                    return f(carry, sc, ln_s, ln_b, w1, b1, w2, b2, gm)
                return jax.lax.fori_loop(0, n, body, x).mean()

            np.asarray(loop(x, 2))

            def timed(n):
                t0 = time.perf_counter()
                np.asarray(loop(x, n))
                return time.perf_counter() - t0

            # Long loops: the ~60 ms tunnel dispatch jitter needs >=100 ms
            # of signal between the two points (first micro run produced
            # negative slopes at n2=30).
            n1, n2 = 50, 350
            t1, t2 = timed(n1), timed(n2)
            if t2 <= t1:
                t1, t2 = timed(n1), timed(n2)
            ms = (t2 - t1) / (n2 - n1) * 1e3
            print(f"C={c} {name}: {ms:.3f} ms/call", flush=True)
            _append([f"lnmlp_C{c}_M{m}", name, f"{ms:.4f}", ""])

        run_case("xla", lambda *a: _reference_mlp(*a, 1e-6))
        run_case("kernel", lambda *a: convnext_mlp(*a, eps=1e-6))


def model():
    worker = r"""
import sys
sys.path.insert(0, {root!r})
from tfimm_tpu.utils.profile import time_model
rate = time_model("convnext_base", target="inference", batch_size=128,
                  nb_batches=5)
print("RESULT", rate)
"""
    for on in ("1", "0"):
        env = dict(os.environ)
        env["TFIMM_TPU_CONVNEXT_MLP"] = on
        code = worker.format(root=ROOT)
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=2400)
        rate = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT"):
                rate = float(line.split()[1])
        if rate is None:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
            print(f"convnext_base CONVNEXT_MLP={on}: FAILED", flush=True)
            continue
        print(f"convnext_base CONVNEXT_MLP={on}: {rate:.1f} img/s",
              flush=True)
        _append(["convnext_base_bs128", f"CONVNEXT_MLP={on}", "",
                 f"{rate:.1f}"])


if __name__ == "__main__":
    which = sys.argv[1:] or ["micro", "model"]
    if "micro" in which:
        micro()
    if "model" in which:
        model()
