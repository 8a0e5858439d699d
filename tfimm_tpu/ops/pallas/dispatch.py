"""Shared dispatch predicates for the Pallas kernels.

Every kernel module gates on the same two questions: are we on a TPU
backend, and has a test forced interpret mode (TFIMM_TPU_PALLAS_INTERPRET=1,
which lets CPU CI exercise the full kernel-dispatch integration paths in
the architectures, not just the kernel math).
"""

from __future__ import annotations

import os

import jax

__all__ = ["on_tpu", "interpret_forced"]


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def interpret_forced() -> bool:
    return os.environ.get("TFIMM_TPU_PALLAS_INTERPRET", "0") == "1"
