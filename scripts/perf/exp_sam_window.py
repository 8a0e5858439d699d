"""SAM windowed-attention experiment: XLA vs the fused rel-pos kernel.

The 12 windowed blocks of the SAM ViT-B encoder (window 14 -> N=196, d=64,
25 windows x 12 heads = 300 attention rows at bs1) still run the XLA path;
round-1 kept kernels away from short sequences on evidence that turned out
to be polluted by the ~60 ms tunnel dispatch overhead (fused_mha later won
1.5x at N=197). This measures, with slope timing:

  1. the windowed attention body: XLA einsum+add_decomposed_rel_pos+softmax
     vs flash_attention_relpos at block_q=block_k=N=196,
  2. the same for backprop (both paths are differentiable),
  3. the full SAM encoder forward, for context.

Also re-probes Swin-T per-stage block times now that window_mha is the
default TPU path, to locate the remaining Swin headroom.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tfimm_tpu.utils.constants import V5E_BF16_PEAK_FLOPS as PEAK  # noqa: E402


def slope(fn, n1=5, n2=30):
    """Seconds per call of ``fn`` via the shared differential timer
    (utils.profile._slope_time): one jitted fori_loop runner with a scalar
    readback — the tunnel transfer is ~60 ms plus size — so the timing
    method (warm-up, retries, diagnostics) has exactly one implementation."""
    from tfimm_tpu.utils.profile import _slope_time

    @jax.jit
    def run(n):
        def body(_, c):
            return fn(c)
        out = jax.lax.fori_loop(0, n, body, fn(None))
        return jax.tree.leaves(out)[0].astype(jnp.float32).mean()

    return _slope_time(lambda n: run(n), n1, n2)


def sam_window_attention():
    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        add_decomposed_rel_pos,
    )
    from tfimm_tpu.ops.pallas.flash_attention_relpos import (
        flash_attention_relpos,
    )

    B, N, D, G = 300, 196, 64, 14  # 25 windows x 12 heads, window 14
    scale = D ** -0.5
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    rel_h = jnp.asarray(rng.normal(size=(2 * G - 1, D)) * 0.02, jnp.float32)
    rel_w = jnp.asarray(rng.normal(size=(2 * G - 1, D)) * 0.02, jnp.float32)

    # rel index tables for a fixed 14x14 grid
    coords = np.arange(G)
    rel = coords[:, None] - coords[None, :] + G - 1  # (G, G)
    Rh = jnp.asarray(np.asarray(rel_h)[rel])         # (G, G, D)
    Rw = jnp.asarray(np.asarray(rel_w)[rel])

    def xla_path(args):
        if args is None:
            args = (q, k, v)
        qq, kk, vv = args
        attn = jnp.einsum("bqd,bkd->bqk", qq * scale, kk)
        qg = qq.reshape(B, G, G, D)
        attn = (attn.reshape(B, G, G, G, G)
                + jnp.einsum("bhwc,hkc->bhwk", qg, Rh.astype(qq.dtype)
                             )[:, :, :, :, None]
                + jnp.einsum("bhwc,wkc->bhwk", qg, Rw.astype(qq.dtype)
                             )[:, :, :, None, :]).reshape(B, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", attn.astype(vv.dtype), vv)
        return (qq + (out.mean() * 0).astype(qq.dtype), kk, vv)

    def kernel_path(args):
        if args is None:
            args = (q, k, v)
        qq, kk, vv = args
        qg = qq.reshape(B, G, G, D)
        rh_term = jnp.einsum("bhwc,hkc->bhwk", qg,
                             Rh.astype(qq.dtype)).reshape(B, N, G)
        rw_term = jnp.einsum("bhwc,wkc->bhwk", qg,
                             Rw.astype(qq.dtype)).reshape(B, N, G)
        out = flash_attention_relpos(qq, kk, vv, rh_term, rw_term,
                                     grid_size=(G, G), scale=scale,
                                     block_q=N, block_k=N)
        return (qq + (out.mean() * 0).astype(qq.dtype), kk, vv)

    flops = 2 * 2 * B * N * N * D
    for name, fn in [("xla", xla_path), ("kernel", kernel_path)]:
        s = slope(fn)
        print(f"sam-window fwd {name:6s}: {s*1e3:7.3f} ms "
              f"{flops/s/1e12:5.1f} TF/s ({100*flops/s/PEAK:4.1f}%)",
              flush=True)

    # backprop
    def make_bwd(path):
        def loss(qq, kk, vv):
            return path((qq, kk, vv))[0].astype(jnp.float32).mean()
        g = jax.grad(loss, argnums=(0, 1, 2))

        def step(args):
            if args is None:
                args = (q, k, v)
            qq, kk, vv = args
            dq, dk, dv = g(qq, kk, vv)
            return (qq + (dq.mean() * 0).astype(qq.dtype),
                    kk + (dk.mean() * 0).astype(kk.dtype),
                    vv + (dv.mean() * 0).astype(vv.dtype))
        return step

    for name, fn in [("xla", xla_path), ("kernel", kernel_path)]:
        s = slope(make_bwd(fn), n1=3, n2=18)
        print(f"sam-window bwd {name:6s}: {s*1e3:7.3f} ms", flush=True)


def sam_encoder_total():
    import tfimm_tpu.architectures.segment_anything  # noqa: F401 (registers)
    from tfimm_tpu import create_model

    model = create_model("sam_vit_b", dtype=jnp.bfloat16)
    enc = model.image_encoder
    p = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, model.params["image_encoder"]))
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, size=(1, 1024, 1024, 3)), jnp.bfloat16)

    from tfimm_tpu.core import Context

    def fwd(args):
        if args is None:
            args = (x,)
        (xx,) = args
        with Context(training=False):
            y = enc(p, xx)
        return (xx + (y.mean() * 0).astype(xx.dtype),)

    s = slope(fwd, n1=3, n2=12)
    print(f"sam encoder fwd total: {s*1e3:.1f} ms/img ({1/s:.1f} img/s)",
          flush=True)


def sam_encoder_bwd():
    """Encoder fine-tune step (grad wrt params): the global blocks take the
    relpos kernel's Pallas backward, so TFIMM_TPU_RELPOS_PAIRED affects
    this path directly (windowed blocks stay on XLA in training)."""
    import tfimm_tpu.architectures.segment_anything  # noqa: F401 (registers)
    from tfimm_tpu import create_model
    from tfimm_tpu.core import Context

    model = create_model("sam_vit_b", dtype=jnp.bfloat16)
    enc = model.image_encoder
    p = jax.device_put(jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, model.params["image_encoder"]))
    x = jnp.asarray(np.random.default_rng(1).uniform(
        -1, 1, size=(1, 1024, 1024, 3)), jnp.bfloat16)

    def loss(p, xx):
        with Context(training=True):
            return enc(p, xx).astype(jnp.float32).mean()

    grad = jax.grad(loss)

    def step(args):
        if args is None:
            args = (x, p)
        xx, pp = args
        g = grad(pp, xx)
        leaf = jax.tree.leaves(g)[0]
        return (xx + (leaf.mean() * 0).astype(xx.dtype), pp)

    s = slope(step, n1=2, n2=8)
    print(f"sam encoder bwd total: {s*1e3:.1f} ms/img ({1/s:.1f} img/s)",
          flush=True)


def swin_stage_probe():
    from tfimm_tpu.architectures.swin import (SwinTransformerBlock,
                                              SwinTransformerConfig)
    from tfimm_tpu.core import Context

    B = 128
    rng = np.random.default_rng(0)
    stages = [(96, 56, 3, 2), (192, 28, 6, 2), (384, 14, 12, 6),
              (768, 7, 24, 2)]
    total = 0.0
    for c, hw, heads, depth in stages:
        x = jnp.asarray(rng.uniform(-1, 1, size=(B, hw * hw, c)),
                        jnp.bfloat16)
        cfg = SwinTransformerConfig(name="probe", window_size=7)
        blk = SwinTransformerBlock(cfg, input_size=(hw, hw), embed_dim=c,
                                   nb_heads=heads, drop_path_rate=0.0,
                                   shift_size=0)
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                         if a.dtype == jnp.float32 else a,
                         blk.init(jax.random.PRNGKey(0)))

        def fwd(args, blk=blk, p=p, x=x):
            if args is None:
                args = (x,)
            (xx,) = args
            with Context(training=False):
                y = blk(p, xx)
            return (xx + (y.mean() * 0).astype(xx.dtype),)

        s = slope(fwd)
        nw = (hw // 7) ** 2
        flops = (2 * B * hw * hw * c * 3 * c + 2 * B * hw * hw * c * c
                 + 2 * 2 * B * nw * heads * 49 * 49 * (c // heads)
                 + 2 * 2 * B * hw * hw * c * 4 * c)
        print(f"swin C={c:4d} {hw}x{hw} h={heads}: block {s*1e3:7.3f} ms "
              f"{flops/s/1e12:5.1f} TF/s ({100*flops/s/PEAK:4.1f}%) "
              f"x{depth}", flush=True)
        total += s * depth
    print(f"swin blocks total {total*1e3:.1f} ms -> {B/total:.0f} img/s "
          f"upper bound", flush=True)


def swin_pack_compare():
    """window_mha at Swin-T stage-1 shape: pack g=2 vs g=4."""
    import os

    from tfimm_tpu.ops.pallas.window_mha import window_mha

    B, NW, N, C, H = 128, 64, 49, 96, 3
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B * NW, N, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B * NW, N, C)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B * NW, N, C)), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(H, N, N)) * 0.05, jnp.float32)
    scale = (C // H) ** -0.5

    flops = 2 * 2 * B * NW * H * N * N * (C // H)
    for g in (2, 4):
        os.environ["TFIMM_TPU_WINDOW_PACK"] = str(g)

        def fn(args, g=g):
            if args is None:
                args = (q, k, v)
            qq, kk, vv = args
            o = window_mha(qq, kk, vv, bias, None, nb_heads=H, scale=scale)
            return (qq + (o.mean() * 0).astype(qq.dtype), kk, vv)

        s = slope(fn)
        print(f"swin-pack g={g}: {s*1e3:7.3f} ms "
              f"{flops/s/1e12:5.1f} TF/s ({100*flops/s/PEAK:4.1f}%)",
              flush=True)
    os.environ.pop("TFIMM_TPU_WINDOW_PACK", None)


if __name__ == "__main__":
    which = sys.argv[1:] or ["window", "encoder", "pack", "swin"]
    if "window" in which:
        sam_window_attention()
    if "encoder" in which:
        sam_encoder_total()
    if "encoder_bwd" in which:
        sam_encoder_bwd()
    if "pack" in which:
        swin_pack_compare()
    if "swin" in which:
        swin_stage_probe()
