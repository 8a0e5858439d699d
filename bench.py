"""Headline benchmark: ViT-B/16 inference images/sec/chip at batch 128.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published V100 fp32 number for vit_base_patch16_224
inference (3865.84 img/s, results/profiling/v100.csv; see BASELINE.md).

Runs bf16 on the TPU chip (the TPU-native deployment dtype); fp32 params are
cast, compute follows. Warm-up iteration excluded; blocked timing via
block_until_ready.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 3865.84  # V100 fp32, results/profiling/v100.csv


def main():
    from tfimm_tpu import create_model

    batch_size = 128
    model = create_model("vit_base_patch16_224", dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(-1, 1, size=(batch_size, 224, 224, 3)), jnp.bfloat16
    )

    # The whole timing loop runs on-device inside one jitted scan with a data
    # dependency between iterations, and the result is fetched to host: this
    # defeats async-dispatch/caching artifacts of remote TPU tunnels (naive
    # block_until_ready timing measured "1.3M img/s" here, which is ~240x the
    # bf16 roofline — i.e., it measured nothing).
    @functools.partial(jax.jit, static_argnums=2)
    def forward_n(params, x, n):
        def body(carry, _):
            y = model.apply(params, carry, training=False)
            carry = carry + (y.mean() * 0).astype(carry.dtype)
            return carry, y.mean()
        return jax.lax.scan(body, x, None, length=n)[1]

    params = jax.device_put(model.params)
    n_iters = 20
    np.asarray(forward_n(params, images, n_iters))  # compile + warm-up

    start = time.perf_counter()
    np.asarray(forward_n(params, images, n_iters))
    elapsed = time.perf_counter() - start

    img_per_sec = batch_size * n_iters / elapsed
    result = {
        "metric": "vit_base_patch16_224_inference_bs128",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
