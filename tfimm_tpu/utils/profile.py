"""Profiling utilities (reference: tfimm/utils/profile.py:45-205).

``time_model`` measures inference or backprop throughput. TPU adaptation:
naive host-side timing through an async dispatch tunnel measures nothing, so
the timed loop runs on-device inside one jitted ``lax.scan`` with a data
dependency between iterations, and completion is forced by a host readback.
``find_max_batch_size`` binary-searches the largest batch that fits in HBM,
catching XLA allocation errors.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)


def _input_for(model, batch_size: int, dtype):
    h, w = model.cfg.input_size
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.uniform(-1, 1, size=(batch_size, h, w, model.cfg.in_channels)),
        dtype,
    )


def time_model(
    model_name: str,
    target: str = "inference",
    batch_size: int = 8,
    nb_batches: int = 10,
    dtype=jnp.bfloat16,
    model=None,
) -> float:
    """Returns images/sec for inference or backprop at the given batch size."""
    from tfimm_tpu import create_model

    model = model or create_model(model_name, dtype=dtype)
    params = jax.device_put(model.params)
    x = _input_for(model, batch_size, dtype)

    if target == "inference":

        @functools.partial(jax.jit, static_argnums=2)
        def run_n(params, x, n):
            def body(carry, _):
                y = model.apply(params, carry, training=False)
                out = y[0] if isinstance(y, tuple) else y
                carry = carry + (out.sum() * 0).astype(carry.dtype)
                return carry, out.reshape(-1)[0]
            return jax.lax.scan(body, x, None, length=n)[1]

    elif target == "backprop":
        tx = optax.sgd(0.01)
        opt_state = tx.init(params)

        def loss_fn(p, x):
            y = model.apply(p, x, training=False)
            out = y[0] if isinstance(y, tuple) else y
            return out.astype(jnp.float32).mean()

        @functools.partial(jax.jit, static_argnums=3)
        def run_n(params, opt_state, x, n):
            def body(carry, _):
                p, s = carry
                grads = jax.grad(loss_fn)(p, x)
                updates, s = tx.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), jnp.float32(0)
            (p, s), _ = jax.lax.scan(body, (params, opt_state), None, length=n)
            # Depend on EVERY updated leaf — fetching a single leaf lets XLA
            # dead-code-eliminate most of the backward pass (a head-bias
            # gradient needs no backprop at all).
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(p))

        run_n = functools.partial(run_n, opt_state=opt_state)
        run_n = lambda params, x, n, _f=run_n: _f(params, x=x, n=n)  # noqa: E731
    else:
        raise ValueError(f"Unknown target: {target}")

    # Warm up with the SAME static n — a different length would compile a
    # different specialization inside the timed region.
    np.asarray(run_n(params, x, nb_batches))
    start = time.perf_counter()
    np.asarray(run_n(params, x, nb_batches))
    elapsed = time.perf_counter() - start
    return batch_size * nb_batches / elapsed


def find_max_batch_size(
    model_name: str,
    target: str = "inference",
    start_batch_size: int = 256,
    dtype=jnp.bfloat16,
) -> Tuple[int, float]:
    """Binary-search the largest power-of-two-ish batch size that fits in
    device memory; returns (batch_size, img_per_sec)."""
    from tfimm_tpu import create_model

    model = create_model(model_name, dtype=dtype)

    def try_batch(bs: int):
        try:
            return time_model(model_name, target=target, batch_size=bs,
                              nb_batches=3, dtype=dtype, model=model)
        except Exception as e:  # XLA OOM surfaces as RuntimeError/XlaRuntimeError
            if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e) \
                    or "exceeds the amount" in str(e):
                logger.info(f"batch_size={bs} OOM")
                return None
            raise

    # Grow until OOM, then binary search between last good and first bad.
    good, good_rate = 0, 0.0
    bs = start_batch_size
    while True:
        rate = try_batch(bs)
        if rate is None:
            break
        good, good_rate = bs, rate
        bs *= 2
    lo, hi = good, bs
    while hi - lo > max(lo // 8, 1):
        mid = (lo + hi) // 2
        rate = try_batch(mid)
        if rate is None:
            hi = mid
        else:
            lo, good_rate = mid, rate
    return lo, good_rate
