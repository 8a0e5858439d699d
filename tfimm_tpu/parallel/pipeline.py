"""Pipeline parallelism: GPipe-style microbatching over a block trunk.

The reference is single-GPU (SURVEY.md §2.7); this is the TPU-native pipeline
axis to complement dp/tp/fsdp in this package. Image-model trunks are stacks
of identical blocks (ViT/Mixer/CaiT/...), which is exactly the SPMD-friendly
pipeline shape: shard the *layer* axis of a scanned block stack over a "pipe"
mesh axis, stream microbatches through with ``lax.ppermute`` over ICI, and
let each device run ``lax.scan`` over its local contiguous blocks.

Schedule: plain GPipe. ``T = M + S - 1`` ticks for M microbatches over S
stages — bubble fraction (S-1)/T, so pick M >= 4*S for <20% bubble. Each
tick every device applies its stage to its current activation and passes the
result to the next device; stage 0 injects microbatch t, stage S-1 banks its
output. Everything is a single jitted ``shard_map`` body: no host round
trips, no data-dependent control flow, collectives ride ICI.

Differentiable end to end (``ppermute`` has a transpose rule: the backward
pass is the reverse pipeline), so ``jax.grad`` of a loss through
``pipeline_apply`` yields the standard GPipe backward schedule.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_apply", "stack_block_params"]


def stack_block_params(block_params_list):
    """Stack per-block param trees into one tree with a leading layer axis.

    The leading axis is what gets sharded over the "pipe" mesh axis: L blocks
    over S stages gives each device a contiguous (L/S)-block slab, applied
    locally with ``lax.scan``.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *block_params_list)


def pipeline_apply(block_fn: Callable, stacked_params, x, *, mesh: Mesh,
                   axis: str = "pipe", nb_microbatches: int,
                   batch_axis=None):
    """Apply L stacked blocks to ``x`` as an S-stage GPipe pipeline.

    Args:
        block_fn: ``block_fn(params_i, x) -> y`` for ONE block; must preserve
            the activation shape (trunk blocks do).
        stacked_params: pytree whose leaves have leading dim L (from
            ``stack_block_params``); L must be divisible by the pipe axis
            size S.
        x: global batch ``(B, ...)``; B must be divisible by
            ``nb_microbatches``.
        mesh: mesh containing ``axis``.
        nb_microbatches: M; the batch is split into M equal microbatches.
        batch_axis: optional mesh axis name (or tuple of names) to shard the
            per-microbatch batch dim over — this is how dp composes with pp
            (each data shard runs the same pipeline on its slice of every
            microbatch). ``None`` (default) replicates ``x`` across all
            non-pipe axes. The per-microbatch batch ``B / M`` must divide by
            the batch-axis size.

    Returns:
        ``block_fn`` applied L times to x, identical (up to reordering of the
        microbatch axis, which this function undoes) to the sequential
        ``for p in blocks: x = block_fn(p, x)``.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    s = mesh.shape[axis]
    m = nb_microbatches
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by nb_microbatches {m}")
    leadings = {leaf.shape[0] if leaf.ndim else None
                for leaf in jax.tree.leaves(stacked_params)}
    if len(leadings) != 1 or None in leadings:
        raise ValueError(
            f"stacked_params leaves must share one stacked leading dim; "
            f"got leading dims {sorted(map(str, leadings))}")
    (leading,) = leadings
    if leading % s:
        raise ValueError(f"{leading} blocks not divisible by {s} pipeline "
                         f"stages")

    # (M, mb, ...) microbatch view; replicated over the pipe axis, with the
    # per-microbatch batch dim optionally sharded over batch_axis (dp+pp).
    xm = x.reshape((m, b // m) + x.shape[1:])
    if batch_axis is not None:
        names = (batch_axis,) if isinstance(batch_axis, str) else tuple(
            batch_axis)
        d = 1
        for n in names:
            d *= mesh.shape[n]
        if (b // m) % d:
            raise ValueError(
                f"per-microbatch batch {b // m} not divisible by batch axis "
                f"size {d} ({names})")

    param_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    x_spec = P(None, batch_axis)
    in_specs = (param_spec, x_spec)
    out_spec = x_spec

    def body(params, xm):  # params: (L/S, ...); xm: (M, mb, ...)
        stage = jax.lax.axis_index(axis)

        def run_stage(carry_x):
            return jax.lax.scan(
                lambda h, p: (block_fn(p, h), None), carry_x, params)[0]

        def tick(t, state):
            acts, out = state
            # Stage 0 consumes microbatch t (clamped; ticks past M feed a
            # dummy that never reaches the output bank).
            inp = jax.lax.dynamic_index_in_dim(
                xm, jnp.minimum(t, m - 1), axis=0, keepdims=False)
            x_in = jnp.where(stage == 0, inp, acts)
            y = run_stage(x_in)
            # Bank stage S-1's output for microbatch t - (S-1).
            ot = t - (s - 1)
            out = jax.lax.cond(
                ot >= 0,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.maximum(ot, 0), axis=0),
                lambda o: o,
                out,
            )
            # Shift activations one stage forward (ring; the wraparound
            # value into stage 0 is ignored — stage 0 reads xm).
            acts = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % s) for i in range(s)])
            return acts, out

        acts0 = jnp.zeros_like(xm[0])
        out0 = jnp.zeros_like(xm)
        _, out = jax.lax.fori_loop(0, m + s - 1, tick, (acts0, out0))
        if s > 1:
            # Every stage banked its own tick outputs; only stage S-1's bank
            # is the model output. Select it and replicate with one psum.
            mask = (stage == s - 1).astype(out.dtype)
            out = jax.lax.psum(out * mask, axis)
        return out

    try:  # jax>=0.8 renamed check_rep -> check_vma
        mapped = shard_map(body, mesh=mesh, in_specs=in_specs,
                           out_specs=out_spec, check_vma=False)
    except TypeError:
        mapped = shard_map(body, mesh=mesh, in_specs=in_specs,
                           out_specs=out_spec, check_rep=False)
    out = mapped(stacked_params, xm)
    out = out.reshape(x.shape)
    if batch_axis is not None:
        # Merging (M, mb) would otherwise let XLA gather the batch dim;
        # keep the output sharded like a dp activation.
        out = jax.lax.with_sharding_constraint(
            out, jax.sharding.NamedSharding(mesh, P(batch_axis)))
    return out
