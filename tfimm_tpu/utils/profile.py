"""Profiling utilities (reference: tfimm/utils/profile.py:45-205).

``time_model`` measures inference or backprop throughput. TPU adaptations
(docs/profiling.md lists the traps in full):

* the timed loop runs on-device inside one jitted ``fori_loop`` with a data
  dependency between iterations (async dispatch would otherwise measure
  nothing), with the loop count a TRACED argument so one executable serves
  every count;
* throughput is DIFFERENTIAL — the slope between two iteration counts —
  which exactly cancels the fixed per-call dispatch/readback overhead
  (~60 ms through remote-TPU tunnels; round-1 single-call numbers here
  understated ViT-B by ~35%);
* the backprop readback depends on every updated leaf, or XLA dead-code
  eliminates most of the backward pass.

``find_max_batch_size`` binary-searches the largest batch that fits in HBM,
catching XLA allocation errors.
"""

from __future__ import annotations

import logging
import time
from typing import Optional, Tuple

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


def _slope_time(run_n, n1: int, n2: int) -> float:
    """Seconds per iteration from the slope between two counts of the same
    compiled callable (cancels fixed dispatch/readback overhead)."""

    def timed(n):
        t0 = time.perf_counter()
        np.asarray(run_n(n))
        return time.perf_counter() - t0

    np.asarray(run_n(min(2, n1)))  # compile + warm up the one executable
    t1, t2 = timed(n1), timed(n2)
    for _ in range(3):  # tunnel hiccups; retake until the slope is positive
        if t2 > t1:
            return (t2 - t1) / (n2 - n1)
        t1, t2 = timed(n1), timed(n2)
    if t2 <= t1:
        raise RuntimeError(
            f"differential timing failed: {n1} iterations took {t1:.4f}s but "
            f"{n2} took {t2:.4f}s after retries — dispatch overhead dominates "
            f"(increase nb_batches) or the transport is unstable")
    return (t2 - t1) / (n2 - n1)


def time_model(
    model_name: str,
    target: str = "inference",
    batch_size: int = 8,
    nb_batches: int = 10,
    dtype=jnp.bfloat16,
    model=None,
    training: bool = False,
    samples: int = 1,
    return_stats: bool = False,
):
    """Returns images/sec for inference or backprop at the given batch size.

    ``nb_batches`` sets the short leg of the differential timing; the long
    leg is 5x that.

    ``samples`` takes that many independent slope samples of the SAME
    compiled executable and returns the MEDIAN. A single slope sample is
    one-sided fragile: any transient stall during the long timing leg (a
    tunnel hiccup, host jitter) inflates the slope, and the positive-slope
    retry cannot see it — a ~300 ms stall in a 1.7 s leg reads as an 18%
    throughput loss (exactly the BENCH_r04 ViT-B spread). The median of >=3
    samples is robust to a minority of contaminated legs in either
    direction. ``return_stats=True`` additionally returns a dict with the
    raw per-sample rates and their relative spread.

    ``training=True`` (backprop only) times the reference's methodology
    (tfimm/utils/profile.py:97): the forward runs in training mode —
    drop-path/dropout active, batch norm normalizing by batch statistics —
    and the running-stat updates are merged into the params each iteration
    like a real train step. The default (False) keeps BN on running stats,
    which is how every published CSV row before round 5 was timed; the two
    modes are published side by side (docs/profiling.md).
    """
    from tfimm_tpu import create_model

    model = model or create_model(model_name, dtype=dtype)
    params = jax.device_put(model.params)
    x = _input_for(model, batch_size, dtype)

    if target == "inference":
        if training:
            raise ValueError("training=True only applies to target='backprop'")

        @jax.jit
        def run(params, x, n):
            def body(_, carry):
                y = model.apply(params, carry, training=False)
                out = y[0] if isinstance(y, tuple) else y
                return carry + (out.sum() * 0).astype(carry.dtype)
            return jax.lax.fori_loop(0, n, body, x).mean()

        run_n = lambda n: run(params, x, n)  # noqa: E731

    elif target == "backprop" and training:
        from tfimm_tpu.parallel.step import merge_state_updates

        tx = optax.sgd(0.01)
        opt_state = tx.init(params)
        base_rng = jax.random.PRNGKey(0)

        def loss_fn(p, x, rng):
            out, updates = model.apply(p, x, training=True, rng=rng,
                                       mutable=True)
            out = out[0] if isinstance(out, tuple) else out
            return out.astype(jnp.float32).mean(), updates

        @jax.jit
        def run(params, opt_state, x, n):
            def body(i, carry):
                p, s = carry
                rng = jax.random.fold_in(base_rng, i)
                (_, state_updates), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, x, rng)
                updates, s = tx.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                # BN running-stat merge: part of the real per-step work in
                # training mode, and it makes the fetched result depend on
                # the batch-stat computation (no DCE).
                return merge_state_updates(p, state_updates), s
            p, s = jax.lax.fori_loop(0, n, body, (params, opt_state))
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(p))

        run_n = lambda n: run(params, opt_state, x, n)  # noqa: E731

    elif target == "backprop":
        tx = optax.sgd(0.01)
        opt_state = tx.init(params)

        def loss_fn(p, x):
            # training=False everywhere: keeps BN on running stats so CNN
            # numbers are comparable across the published CSVs; kernels
            # reached only from inference dispatch must therefore provide a
            # VJP (see ops/pallas/swin_block.py's reference-twin backward).
            y = model.apply(p, x, training=False)
            out = y[0] if isinstance(y, tuple) else y
            return out.astype(jnp.float32).mean()

        @jax.jit
        def run(params, opt_state, x, n):
            def body(_, carry):
                p, s = carry
                grads = jax.grad(loss_fn)(p, x)
                updates, s = tx.update(grads, s, p)
                return optax.apply_updates(p, updates), s
            p, s = jax.lax.fori_loop(0, n, body, (params, opt_state))
            # Depend on EVERY updated leaf — fetching a single leaf lets XLA
            # dead-code-eliminate most of the backward pass (a head-bias
            # gradient needs no backprop at all).
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(p))

        run_n = lambda n: run(params, opt_state, x, n)  # noqa: E731
    else:
        raise ValueError(f"Unknown target: {target}")

    rates = []
    for _ in range(max(1, samples)):
        secs = _slope_time(run_n, nb_batches, 5 * nb_batches)
        rates.append(batch_size / secs)
    median = float(np.median(rates))
    if return_stats:
        stats = {
            "samples": [round(r, 2) for r in rates],
            "spread_rel": round((max(rates) - min(rates)) / median, 4)
            if len(rates) > 1 else 0.0,
        }
        return median, stats
    return median


def find_max_batch_size(
    model_name: str,
    target: str = "inference",
    start_batch_size: int = 256,
    dtype=jnp.bfloat16,
    max_batch_size: Optional[int] = None,
) -> Tuple[int, float]:
    """Binary-search the largest power-of-two-ish batch size that fits in
    device memory; returns (batch_size, img_per_sec).

    ``max_batch_size`` caps the search (the result is then a lower bound on
    the true maximum). Through remote-compile tunnels, huge-batch compiles
    can fail with INTERNAL/HTTP errors instead of a clean RESOURCE_EXHAUSTED;
    those are retried once (to rule out a transient) and then treated as
    does-not-fit, so the sweep degrades to a conservative bound instead of
    crashing.
    """
    from tfimm_tpu import create_model

    model = create_model(model_name, dtype=dtype)

    _OOM_MARKERS = ("RESOURCE_EXHAUSTED", "Out of memory",
                    "exceeds the amount")
    # "differential timing failed" is _slope_time's unstable-transport
    # RuntimeError: a tunnel hiccup, not a model property — classify it as
    # infra so one bad timing episode degrades instead of aborting a
    # multi-hour search.
    _INFRA_MARKERS = ("INTERNAL", "remote_compile", "HTTP", "DEADLINE",
                      "differential timing failed")

    def try_batch(bs: int, _retried=False):
        try:
            return time_model(model_name, target=target, batch_size=bs,
                              nb_batches=3, dtype=dtype, model=model)
        except Exception as e:  # XLA OOM surfaces as RuntimeError/XlaRuntimeError
            msg = str(e)
            if any(m in msg for m in _OOM_MARKERS):
                logger.info(f"batch_size={bs} OOM")
                return None
            if any(m in msg for m in _INFRA_MARKERS):
                if not _retried:
                    logger.warning(f"batch_size={bs} infra error; retrying")
                    return try_batch(bs, _retried=True)
                logger.warning(
                    f"batch_size={bs} repeated infra error; treating as "
                    f"does-not-fit (result is a lower bound)")
                return None
            raise

    # Grow until OOM (or cap), then binary search between good and bad.
    good, good_rate = 0, 0.0
    bs = start_batch_size
    if max_batch_size is not None:
        bs = min(bs, max_batch_size)  # a cap below the start is the start
    while max_batch_size is None or bs <= max_batch_size:
        rate = try_batch(bs)
        if rate is None:
            break
        good, good_rate = bs, rate
        bs *= 2
        if max_batch_size is not None and good < max_batch_size < bs:
            bs = max_batch_size  # doubling overshot the cap: test the cap
    else:
        # Stopped at the cap without an OOM: the cap is the answer (a
        # lower bound on the true maximum) — don't bisect past it.
        return good, good_rate
    lo, hi = good, bs
    while hi - lo > max(lo // 8, 1):
        mid = (lo + hi) // 2
        rate = try_batch(mid)
        if rate is None:
            hi = mid
        else:
            lo, good_rate = mid, rate
    return lo, good_rate
