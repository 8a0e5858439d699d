"""Single-gather window (re)partitioning for Swin-style blocks.

The shipping fused Swin block (ops/pallas/swin_block.py) consumes windows in
a padded, pair-packed layout: windows are padded from N = ws^2 tokens to
n_pad = ceil(N/4)*4 rows (sublane alignment) and packed two-per-program.
Getting there from the (B, H, W, C) feature map on the XLA path costs a
chain of ops — cyclic roll, the 6D partition transpose, jnp.pad, and the
pair reshape — and the way back costs the mirror chain. Measured at Swin-T
stage-1 (scripts/perf/exp_swin_budget.py) the chains are ~0.55 ms/block of
pure HBM permutation traffic, several full-map passes each way.

Everything outside the attention matmuls is per-token, so the whole block
commutes with any token permutation: the chain in each direction IS one
static permutation (plus zero-fill for pad rows). This module precomputes
those permutations with numpy at trace time so each direction becomes ONE
`jnp.take` along the token axis (pad rows via out-of-bounds indices with
mode="fill"), and consecutive blocks can additionally fuse "un-window for
shift s0, re-window for shift s1" into a single composed gather, keeping a
whole stage window-resident.

No reference counterpart: the reference (tfimm/architectures/swin.py:72-110)
materializes the partition/reverse transposes around every block.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "padded_rows",
    "pack_indices",
    "unpack_indices",
    "repack_indices",
]


def padded_rows(n: int) -> int:
    """Tokens per window after sublane-alignment padding (multiple of 4)."""
    return -(-n // 4) * 4


@functools.lru_cache(maxsize=None)
def pack_indices(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Token indices building the padded window layout from the flat map.

    Returns int32 (nb_windows * n_pad,), indexing the token axis of the
    flattened (B, H*W, C) feature map. Entry r of the result is the source
    token for padded-layout row r; pad rows carry the out-of-bounds index
    H*W (use ``jnp.take(..., mode="fill", fill_value=0)``). Windows are
    row-major over (H//ws, W//ws), matching ``window_partition``; ``shift``
    is the cyclic pre-roll (roll by -shift on both spatial axes).
    """
    n = ws * ws
    n_pad = padded_rows(n)
    nwh, nww = h // ws, w // ws
    wi, wj, t = np.meshgrid(np.arange(nwh), np.arange(nww), np.arange(n_pad),
                            indexing="ij")
    r, c = t // ws, t % ws
    sh = (wi * ws + r + shift) % h
    sw = (wj * ws + c + shift) % w
    idx = np.where(t < n, sh * w + sw, h * w)
    return np.ascontiguousarray(idx.reshape(-1).astype(np.int32))


@functools.lru_cache(maxsize=None)
def unpack_indices(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Inverse of :func:`pack_indices`: padded-layout row holding each token.

    Returns int32 (H*W,): entry j is the row of the padded window layout
    whose value belongs at flat map position j (window reverse + roll by
    +shift, as one gather along the packed-row axis).
    """
    fwd = pack_indices(h, w, ws, shift)
    inv = np.empty(h * w, np.int32)
    real = fwd < h * w
    inv[fwd[real]] = np.arange(len(fwd), dtype=np.int32)[real]
    return inv


@functools.lru_cache(maxsize=None)
def repack_indices(h: int, w: int, ws: int, shift_from: int,
                   shift_to: int) -> np.ndarray:
    """One gather taking a padded window layout at ``shift_from`` directly
    to the padded layout at ``shift_to`` (un-window + re-window fused).

    Returns int32 (nb_windows * n_pad,) indexing the packed-row axis of the
    source layout; pad rows are out of bounds (mode="fill").
    """
    fwd_to = pack_indices(h, w, ws, shift_to)
    inv_from = unpack_indices(h, w, ws, shift_from)
    oob = len(fwd_to)  # source layout has the same row count
    return np.ascontiguousarray(
        np.where(fwd_to < h * w, inv_from[np.minimum(fwd_to, h * w - 1)],
                 oob).astype(np.int32))
