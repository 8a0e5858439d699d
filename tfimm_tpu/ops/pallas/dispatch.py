"""Shared dispatch predicates for the Pallas kernels.

Every kernel module gates on the same two questions: are we on a TPU
backend, and has a test forced interpret mode (TFIMM_TPU_PALLAS_INTERPRET=1,
which lets CPU CI exercise the full kernel-dispatch integration paths in
the architectures, not just the kernel math).
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Set

import jax

__all__ = ["on_tpu", "interpret_forced", "softmax_nomax",
           "softmax_clamp_grad_mask", "SOFTMAX_CLAMP",
           "log_dispatch", "capture_dispatches"]

SOFTMAX_CLAMP = 80.0

# -- dispatch fingerprinting -------------------------------------------------
# Which Pallas kernel bodies a trace actually selected. A benchmark number
# without this is ambiguous: an environment-sensitive dispatch difference
# (env toggle, backend detection, VMEM gate) is indistinguishable from a slow
# transport after the fact (BENCH_r04's 18% ViT-B spread). Capture is
# trace-time only and off by default, so it costs nothing in production.

_dispatch_log: Optional[Set[str]] = None


def log_dispatch(name: str) -> None:
    """Record that a dispatcher committed to a kernel path (no-op unless a
    ``capture_dispatches`` block is active). Called at trace time."""
    if _dispatch_log is not None:
        _dispatch_log.add(name)


@contextlib.contextmanager
def capture_dispatches(out: Optional[Set[str]] = None):
    """Collect ``log_dispatch`` names into ``out`` (a set) for the duration.

    Only traces executed inside the block are observed; jit cache hits
    re-trace nothing and log nothing — capture around the *first* call of a
    fresh jit wrapper."""
    global _dispatch_log
    out = set() if out is None else out
    prev = _dispatch_log
    _dispatch_log = out
    try:
        yield out
    finally:
        _dispatch_log = prev


def on_tpu() -> bool:
    # TFIMM_TPU_ASSUME_TPU=1: deviceless AOT tooling (compile probes,
    # max-batch analysis on a topology without hardware — see
    # scripts/perf/compile_probe.py) runs on the cpu backend but compiles
    # FOR tpu; the kernels must dispatch as they will on the chip or the
    # compiled program (and its memory analysis) describes the wrong path.
    if os.environ.get("TFIMM_TPU_ASSUME_TPU", "0") == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def interpret_forced() -> bool:
    return os.environ.get("TFIMM_TPU_PALLAS_INTERPRET", "0") == "1"


def softmax_nomax(s):
    """Kernel-side softmax without the row-max subtraction, guarded by a
    clamp. The max-reduce + broadcast-subtract pass costs ~0.1 ms/layer at
    ViT-B shapes (measured, scripts/perf/exp_fused_mha4.py); f32 exp only
    overflows past 88, and trained-model attention logits sit orders of
    magnitude below the clamp, so exp(min(s, C)) equals softmax whenever
    max(s) <= C and saturates gracefully (no NaN/Inf) otherwise. Additive
    mask values (-1e9 / -100) pass through: exp(-1e9) = 0 exactly.
    Backward kernels recompute p through the same path AND zero the score
    cotangent on clamped entries (softmax_clamp_grad_mask), so the VJP is
    the exact Jacobian of this function, saturation included.

    Domain note (no-max underflow): a row whose EVERY logit is below ~-87
    would flush all exps to zero and 0/0-NaN. Unreachable for the
    self-attention rows these kernels serve — the unmasked diagonal entry
    is q.q*scale >= 0 (ViT/Swin/SAM windows), and CaiT's head-mixed
    diagonal sum sits orders of magnitude inside the exp range for any
    trained mix — but a caller feeding arbitrary cross-scores must
    guarantee max(s) > -87 per row. The pure-JAX twins keep
    jax.nn.softmax so the XLA paths match the reference bit-for-bit.
    """
    import jax.numpy as jnp

    e = jnp.exp(jnp.minimum(s, SOFTMAX_CLAMP))
    return e / jnp.sum(e, axis=-1, keepdims=True)


def softmax_clamp_grad_mask(s, ds):
    """Exact-VJP companion to :func:`softmax_nomax`: where the forward
    clamp saturated (s > SOFTMAX_CLAMP) the true derivative wrt s is zero,
    so the backward kernels must zero the score cotangent there — applying
    the unclamped softmax Jacobian to clamped entries silently mismatches
    the computed function the moment a logit crosses the clamp."""
    import jax.numpy as jnp

    return jnp.where(s < SOFTMAX_CLAMP, ds, 0.0)
