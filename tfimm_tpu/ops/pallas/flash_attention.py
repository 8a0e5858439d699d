"""Flash attention (blockwise-softmax) Pallas TPU kernel.

Covers the LONG-sequence regime: SAM's 4096-token image encoder (plain and,
via flash_attention_relpos, decomposed rel-pos). It does NOT implement the
``bias`` argument: biased attention through THIS dispatcher falls back to
XLA. Swin's windowed rel-pos attention (N≈49–144) is served by its own
fused kernel (tfimm_tpu/ops/pallas/window_mha.py, dispatched from the Swin
architecture directly); short unbiased sequences (ViT at N≈197) by the
fused_mha kernel (tfimm_tpu/ops/pallas/fused_mha.py).

The dispatcher returns None when the kernel does not apply (non-TPU backend,
tiny shapes where the fallback is faster, or dtype/shape constraints), in which
case callers use the pure-JAX reference implementation.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ["flash_attention_or_none"]


from tfimm_tpu.ops.pallas.dispatch import interpret_forced as _interpret_forced
from tfimm_tpu.ops.pallas.dispatch import on_tpu as _on_tpu

_VMEM_LIMIT_BYTES = 10 * 2 ** 20


def _kernel_fits(n: int, d: int, itemsize: int) -> bool:
    """VMEM budget for the LARGEST program (the dkv backward): full q and
    do rows (2*n*d), the two lane-replicated (n, 128) f32 lse/delta
    streams, and ~4 block-sized (512, d) operands. The dispatcher serves
    training too (SAM fine-tune), so the backward footprint is the gate —
    the same failure class fused_mha hit when its forward gate alone let
    an over-VMEM backward through."""
    return (2 * n * d * itemsize + 2 * n * 128 * 4
            + 4 * 512 * d * itemsize) <= _VMEM_LIMIT_BYTES


def flash_attention_or_none(q, k, v, bias=None, scale: Optional[float] = None):
    """Run the Pallas flash-attention kernel if applicable, else return None.

    q, k, v: (..., N, D). The kernel currently requires a TPU backend (or
    forced interpret mode), head_dim <= 256, self-attention shapes, a
    working set that fits VMEM, and sequence length >= 1024: below that
    the (N, N) score matrix fits comfortably in VMEM and XLA's fused
    attention is faster (measured on v5e: ViT-B/224, N=197 — XLA 2117
    img/s vs kernel 1350). The kernel's win is the long-sequence regime
    (SAM's 4096-token encoder).
    """
    if bias is not None:
        return None  # bias fusion not implemented; fall back to XLA
    interpret = _interpret_forced()
    if not (_on_tpu() or interpret):
        return None
    n, d = q.shape[-2], q.shape[-1]
    if n < 1024 or d > 256:
        return None
    if k.shape != q.shape or v.shape != q.shape:
        # Cross-attention (e.g. SAM's two-way decoder: long queries against
        # short keys) is outside this kernel's self-attention blocking;
        # decline so callers take the pure-JAX path instead of crashing on
        # the kernel's same-shape reshape.
        return None
    if not _kernel_fits(n, d, jnp.dtype(q.dtype).itemsize):
        return None
    from tfimm_tpu.ops.pallas.dispatch import log_dispatch
    from tfimm_tpu.ops.pallas.flash_attention_kernel import flash_attention

    log_dispatch("flash_attention")
    return flash_attention(q, k, v, scale=scale, interpret=interpret)
