"""Differential-timed inference throughput for a list of models on the
current backend. Methodology identical to bench.py (fori_loop with data
dependency, scalar readback, slope between two iteration counts — see
bench.py docstring for why both matter through the axon tunnel).

Usage: python scripts/perf/bench_models.py vit_base_patch16_224 convnext_base ...
Flags: --batch-size N (default 128), --dtype bf16|f32, --train (backprop step)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench_inference(model_name, batch_size, dtype, n1=5, n2=25):
    from tfimm_tpu import create_model

    model = create_model(model_name, dtype=dtype)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(-1, 1, size=(batch_size, *model.cfg.input_size, 3)), dtype
    )

    @jax.jit
    def forward_n(params, x, n):
        def body(_, carry):
            y = model.apply(params, carry, training=False)
            return carry + (y.mean() * 0).astype(carry.dtype)
        return jax.lax.fori_loop(0, n, body, x).mean()

    params = jax.device_put(model.params)

    def timed(n):
        t0 = time.perf_counter()
        np.asarray(forward_n(params, images, n))
        return time.perf_counter() - t0

    np.asarray(forward_n(params, images, 2))
    t1, t2 = timed(n1), timed(n2)
    if t2 <= t1:
        t1, t2 = timed(n1), timed(n2)
    return batch_size * (n2 - n1) / (t2 - t1)


def bench_backprop(model_name, batch_size, dtype, n1=3, n2=13):
    import optax

    from tfimm_tpu import create_model

    model = create_model(model_name, dtype=dtype)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(-1, 1, size=(batch_size, *model.cfg.input_size, 3)), dtype
    )
    tx = optax.sgd(1e-4)
    opt_state = tx.init(model.params)

    def loss_fn(params, x):
        # training=False: grad-of-inference, matching utils/profile.py's
        # published methodology (BN on running stats, no dropout rng).
        return model.apply(params, x, training=False).astype(jnp.float32).mean()

    @jax.jit
    def steps(params, opt_state, x, n):
        def body(_, carry):
            params, opt_state = carry
            grads = jax.grad(loss_fn)(params, x)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state
        params, opt_state = jax.lax.fori_loop(0, n, body, (params, opt_state))
        # Depend on EVERY updated leaf — a single leaf lets XLA DCE part of
        # the backward pass (see utils/profile.py time_model).
        return sum(jnp.sum(leaf.astype(jnp.float32))
                   for leaf in jax.tree.leaves(params))

    params = jax.device_put(model.params)

    def timed(n):
        t0 = time.perf_counter()
        np.asarray(steps(params, opt_state, images, n))
        return time.perf_counter() - t0

    np.asarray(steps(params, opt_state, images, 1))
    t1, t2 = timed(n1), timed(n2)
    if t2 <= t1:
        t1, t2 = timed(n1), timed(n2)
    return batch_size * (n2 - n1) / (t2 - t1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("models", nargs="+")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    for name in args.models:
        try:
            if args.train:
                rate = bench_backprop(name, args.batch_size, dtype)
                kind = "backprop"
            else:
                rate = bench_inference(name, args.batch_size, dtype)
                kind = "inference"
            print(f"{name:36s} {kind} bs{args.batch_size} {args.dtype}: "
                  f"{rate:9.1f} img/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
