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
    "pack_windows",
    "unpack_windows",
    "repack_windows",
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
    if h % ws or w % ws:
        # Truncated windows would leave unpack_indices' inverse partially
        # uninitialized (silent garbage); every entry point shares this
        # check through the lru_cache.
        raise ValueError(
            f"window_gather requires ws to tile the map: got {h}x{w} with "
            f"ws={ws}")
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


def _pack_structured(x, h, w, ws, shift):
    """Structured (roll + 6D transpose + pad) equivalent of the pack gather.

    Exactly the permutation of :func:`pack_indices` expressed as XLA
    reshape/transpose/roll/pad ops instead of one gather. Kept alongside the
    gather form because the two compile differently: transposes can fuse
    into neighbouring ops where a gather always materializes its result.
    """
    import jax.numpy as jnp

    b, _, c = x.shape
    n = ws * ws
    n_pad = padded_rows(n)
    nh, nw = h // ws, w // ws
    xm = x.reshape(b, h, w, c)
    if shift:
        xm = jnp.roll(xm, (-shift, -shift), axis=(1, 2))
    xm = xm.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
    xm = xm.reshape(b, nh * nw, n, c)
    if n_pad != n:
        xm = jnp.pad(xm, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    return xm.reshape(b, nh * nw * n_pad, c)


def _unpack_structured(y, h, w, ws, shift):
    """Structured inverse of :func:`_pack_structured` (slice pads + window
    reverse + roll)."""
    import jax.numpy as jnp

    b, _, c = y.shape
    n = ws * ws
    n_pad = padded_rows(n)
    nh, nw = h // ws, w // ws
    ym = y.reshape(b, nh * nw, n_pad, c)[:, :, :n, :]
    ym = ym.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    ym = ym.reshape(b, h, w, c)
    if shift:
        ym = jnp.roll(ym, (shift, shift), axis=(1, 2))
    return ym.reshape(b, h * w, c)


def _structured(kind, h, w, ws, s0, s1, x):
    """Apply the (kind, ...) permutation via structured ops.

    For ``repack`` the direction is s0 -> s1 (unpack at s0, pack at s1)."""
    if kind == "pack":
        return _pack_structured(x, h, w, ws, s0)
    if kind == "unpack":
        return _unpack_structured(x, h, w, ws, s0)
    return _pack_structured(_unpack_structured(x, h, w, ws, s0), h, w, ws, s1)


# "gather" | "structured": implementation of the backward (cotangent)
# permutation. The forward stays a single gather either way (measured +18%
# end-to-end on Swin-T inference vs the per-block transpose chains); the
# backward choice is a separate measured trade — see _permutation_take.
_BWD_IMPL = "structured"


@functools.lru_cache(maxsize=None)
def _permutation_take(key):
    """Build a differentiable single-gather permutation for a cached
    geometry key. The permutations here are bijections on the real tokens
    (pad rows only ever read out-of-bounds / get dropped), so the VJP of
    the gather is the INVERSE permutation — XLA's generic take-VJP would
    emit a scatter instead, which measured a 6% END-TO-END backprop
    regression on swin_tiny (1226 -> 1146 img/s) before this custom VJP.
    The inverse can run as one gather or as the structured transpose chain
    (_BWD_IMPL): the inverse-gather form recovered only part of the scatter
    regression (1146 -> 1165), so both are kept measurable."""
    import jax
    import jax.numpy as jnp

    kind, h, w, ws, s0, s1 = key
    if kind == "pack":
        fwd, inv = pack_indices(h, w, ws, s0), unpack_indices(h, w, ws, s0)
    elif kind == "unpack":
        fwd, inv = unpack_indices(h, w, ws, s0), pack_indices(h, w, ws, s0)
    else:  # rows -> rows; inverse is the opposite-direction repack
        fwd = repack_indices(h, w, ws, s0, s1)
        inv = repack_indices(h, w, ws, s1, s0)

    # Inverse direction for the structured backward: pack <-> unpack swap,
    # repack reverses its shift pair.
    if kind == "pack":
        inv_kind, i0, i1 = "unpack", s0, 0
    elif kind == "unpack":
        inv_kind, i0, i1 = "pack", s0, 0
    else:
        inv_kind, i0, i1 = "repack", s1, s0

    @jax.custom_vjp
    def take(x):
        return jnp.take(x, jnp.asarray(fwd), axis=1, mode="fill",
                        fill_value=0)

    def fwd_fn(x):
        return take(x), None

    def bwd_fn(_, g):
        if _BWD_IMPL == "structured":
            return (_structured(inv_kind, h, w, ws, i0, i1, g),)
        return (jnp.take(g, jnp.asarray(inv), axis=1, mode="fill",
                         fill_value=0),)

    take.defvjp(fwd_fn, bwd_fn)
    return take


def pack_windows(x, h, w, ws, shift):
    """(B, H*W, C) -> (B, nb_windows * n_pad, C) padded window layout, as
    one differentiable gather (backward = one gather, not a scatter)."""
    return _permutation_take(("pack", h, w, ws, shift, 0))(x)


def unpack_windows(x, h, w, ws, shift):
    """Inverse of :func:`pack_windows` on the flattened packed layout."""
    return _permutation_take(("unpack", h, w, ws, shift, 0))(x)


def repack_windows(x, h, w, ws, shift_from, shift_to):
    """Padded layout at ``shift_from`` -> padded layout at ``shift_to``."""
    return _permutation_take(("repack", h, w, ws, shift_from, shift_to))(x)
