"""Deviceless Mosaic compile probe — no TPU (or tunnel) required.

``jax.experimental.topologies.get_topology_desc`` + the installed libtpu
run the FULL XLA:TPU + Mosaic compile locally, with real scoped-VMEM
accounting (v5e: 128 MB). This turns the ~8-minute remote-compile round
trip per kernel variant into seconds, and lets the dispatcher VMEM gates
be checked against the compiler instead of hand arithmetic.

Execution (timing) still needs hardware; this probes compile-fit only.

Usage:
  python scripts/perf/compile_probe.py            # probe the kernel matrix
  python scripts/perf/compile_probe.py cait       # one kernel family
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

TOPO = topologies.get_topology_desc("v5e:1x1", "tpu",
                                    chips_per_host_bounds=(1, 1, 1))
SHARD = NamedSharding(Mesh(np.array(TOPO.devices), ("x",)), P())
A = jax.ShapeDtypeStruct


def try_compile(name, fn, *avals):
    avals = [jax.tree.map(lambda a: A(a.shape, a.dtype, sharding=SHARD), t)
             for t in avals]
    try:
        c = jax.jit(fn).trace(*avals).lower().compile()
        ma = c.memory_analysis()
        print(f"{name}: OK (args {ma.argument_size_in_bytes / 1e6:.0f} MB, "
              f"temp {ma.temp_size_in_bytes / 1e6:.0f} MB)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report any compile failure
        msg = str(e).replace("\n", " ")[:260]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


def probe_cait():
    from tfimm_tpu.ops.pallas.cait_attention import (_thattn_bwd_call,
                                                     talking_head_attention)

    for tag, n, dim, h in [("s24@224", 197, 384, 8), ("s24@384", 577, 384, 8),
                           ("m36@384", 577, 768, 16)]:
        d = dim // h
        q = A((8, n, 3 * dim), jnp.bfloat16)
        wl = A((h, h), jnp.float32)
        bl = A((h,), jnp.float32)
        g = A((8, n, dim), jnp.bfloat16)
        for stacked in ("0", "1"):
            os.environ["TFIMM_TPU_CAIT_STACKED"] = stacked
            sfx = " stacked" if stacked == "1" else ""
            try_compile(
                f"cait fwd {tag}{sfx}",
                lambda q, wl, bl, ww, bw, h=h, d=d: talking_head_attention(
                    q, wl, bl, ww, bw, nb_heads=h, scale=d ** -0.5),
                q, wl, bl, wl, bl)
            try_compile(
                f"cait bwd {tag}{sfx}",
                lambda q, wl, bl, ww, bw, g, h=h, d=d: _thattn_bwd_call(
                    q, wl, bl, ww, bw, g, h, d ** -0.5)[0],
                q, wl, bl, wl, bl, g)


def probe_mha():
    from tfimm_tpu.ops.pallas.fused_mha import _fused_mha_bwd_call, fused_mha

    for tag, n in [("patch16 (N=197)", 197), ("patch8 (N=785)", 785)]:
        q = A((8, n, 3 * 768), jnp.bfloat16)
        g = A((8, n, 768), jnp.bfloat16)
        for stacked in (False, True):
            sfx = " stacked" if stacked else ""
            try_compile(
                f"fused_mha fwd {tag}{sfx}",
                lambda q, s=stacked: fused_mha(q, 12, 0.125, stacked=s), q)
            try_compile(
                f"fused_mha bwd {tag}{sfx}",
                lambda q, g, s=stacked: _fused_mha_bwd_call(
                    q, g, 12, 0.125, stacked=s), q, g)


def probe_window():
    from tfimm_tpu.ops.pallas.window_mha import window_mha_diff

    n, c, h = 104, 96, 3
    q = A((64 * 32, n, c), jnp.bfloat16)
    bias = A((h, n, n), jnp.float32)
    mask = A((32, n, n), jnp.float32)
    for stacked in ("0", "1"):
        os.environ["TFIMM_TPU_WINDOW_STACKED"] = stacked
        sfx = " stacked" if stacked == "1" else ""

        def fwd(q, k, v, bias, mask):
            return window_mha_diff(q, k, v, bias, mask, h, 0.17, False)

        try_compile(f"window_mha fwd stage1{sfx}", fwd, q, q, q, bias, mask)
        try_compile(
            f"window_mha bwd stage1{sfx}",
            lambda *a: jax.grad(
                lambda *b: fwd(*b).astype(jnp.float32).sum(),
                argnums=(0, 1, 2, 3))(*a), q, q, q, bias, mask)


def probe_relpos():
    from tfimm_tpu.ops.pallas.flash_attention_relpos import (
        flash_attention_relpos,
    )

    for tag, gh, gw, b, blk in [("global", 64, 64, 12, 512),
                                ("window", 14, 14, 300 * 12, 196)]:
        n = gh * gw
        q = A((b, n, 64), jnp.bfloat16)
        rh = A((b, n, gh), jnp.bfloat16)
        rw = A((b, n, gw), jnp.bfloat16)
        for paired in ("0", "1"):
            os.environ["TFIMM_TPU_RELPOS_PAIRED"] = paired
            sfx = " paired" if paired == "1" else ""

            def fwd(q, k, v, rh, rw, gh=gh, gw=gw, blk=blk):
                return flash_attention_relpos(
                    q, k, v, rh, rw, grid_size=(gh, gw), scale=0.125,
                    block_q=blk, block_k=blk)

            try_compile(f"relpos fwd {tag}{sfx}", fwd, q, q, q, rh, rw)
            try_compile(
                f"relpos bwd {tag}{sfx}",
                lambda *a: jax.grad(
                    lambda *b: fwd(*b).astype(jnp.float32).sum(),
                    argnums=(0, 1, 2, 3, 4))(*a), q, q, q, rh, rw)


def probe_convnext_mlp():
    """Fused LN+MLP kernel at every ConvNeXt-B stage shape (bs128 tokens)."""
    from tfimm_tpu.ops.pallas.convnext_mlp import convnext_mlp

    # ConvNeXt-B stages, plus the large/xlarge big-C stages (768/1536/2048).
    for c, toks in [(128, 128 * 3136), (256, 128 * 784), (512, 128 * 196),
                    (1024, 128 * 49), (768, 64 * 196), (1536, 64 * 49),
                    (2048, 32 * 49)]:
        hidden = 4 * c
        args = (A((toks, c), jnp.bfloat16), A((toks, c), jnp.bfloat16),
                A((c,), jnp.float32), A((c,), jnp.float32),
                A((c, hidden), jnp.bfloat16), A((hidden,), jnp.float32),
                A((hidden, c), jnp.bfloat16), A((c,), jnp.float32),
                A((c,), jnp.float32))
        from tfimm_tpu.ops.pallas.convnext_mlp import _pick_blocks

        if _pick_blocks(toks, c, hidden, 2) is None:
            print(f"convnext_mlp C={c} M={toks}: DECLINED by design "
                  "(weights above the measured win region; XLA path)",
                  flush=True)
            continue
        try_compile(f"convnext_mlp C={c} M={toks}",
                    lambda *a: convnext_mlp(*a, eps=1e-6), *args)


def probe_models():
    """Whole-model compiles with chip-mode kernel dispatch
    (TFIMM_TPU_ASSUME_TPU=1) — the integration the CPU test suite can only
    reach in interpret mode. Also compiles each model with its
    pending-measurement variant toggled on."""
    os.environ["TFIMM_TPU_ASSUME_TPU"] = "1"
    from tfimm_tpu import create_model

    cases = [
        ("vit_base_patch16_224", 8, "TFIMM_TPU_MHA_STACKED"),
        ("swin_tiny_patch4_window7_224", 8, "TFIMM_TPU_WINDOW_STACKED"),
        ("cait_s24_224", 8, "TFIMM_TPU_CAIT_STACKED"),
        ("convnext_base", 8, None),
        ("resnet50", 8, None),
    ]
    for name, bs, toggle in cases:
        model = create_model(name, dtype=jnp.bfloat16)
        h, w = model.cfg.input_size
        x = A((bs, h, w, model.cfg.in_channels), jnp.bfloat16)
        pav = jax.tree.map(lambda a: A(a.shape, a.dtype), model.params)

        def fwd(params, x, model=model):
            y = model.apply(params, x, training=False)
            return y[0] if isinstance(y, tuple) else y

        def bwd(params, x, model=model):
            def loss(p):
                y = model.apply(p, x, training=False)
                out = y[0] if isinstance(y, tuple) else y
                return out.astype(jnp.float32).mean()

            return jax.grad(loss)(params)

        for env_on in ([None] if toggle is None else ["0", "1"]):
            if toggle is not None:
                os.environ[toggle] = env_on
            sfx = f" {toggle}={env_on}" if toggle else ""
            try_compile(f"{name} fwd{sfx}", fwd, pav, x)
            try_compile(f"{name} bwd{sfx}", bwd, pav, x)
        if toggle is not None:
            os.environ.pop(toggle, None)


PROBES = {"cait": probe_cait, "mha": probe_mha, "window": probe_window,
          "relpos": probe_relpos, "convnext_mlp": probe_convnext_mlp,
          "models": probe_models}

if __name__ == "__main__":
    which = sys.argv[1:] or list(PROBES)
    for w in which:
        PROBES[w]()
