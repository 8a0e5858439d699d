"""Audit the convnext_base inference max-batch boundary.

The sweep recorded max_bs=2816 with only 5.3 GiB of reported HBM — far
below the 15.25 GiB budget — which means the failing probe above it was
either a genuine nonlinear HBM cliff (XLA's layout/fusion choice changes
discontinuously with batch) or a different RESOURCE_EXHAUSTED misread as
the OOM boundary. This prints the full compiler error at the first
failing batch so the CSV row's provenance is explicit.

Run AFTER the main sweep (single core; a concurrent run doubles both).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["TFIMM_TPU_ASSUME_TPU"] = "1"

import jax.numpy as jnp  # noqa: E402

from maxbatch_compile import compiled_bytes  # noqa: E402
from tfimm_tpu import create_model  # noqa: E402


def main():
    model = create_model("convnext_base", dtype=jnp.bfloat16)
    for bs in (2816, 2904):
        print(f"--- convnext_base inference bs={bs}", flush=True)
        try:
            m = compiled_bytes(model, "inference", bs)
            print(f"fits: {m / 2**30:.2f} GiB", flush=True)
        except Exception as e:  # noqa: BLE001 — print everything
            msg = str(e)
            print(f"{type(e).__name__}:", flush=True)
            print(msg[:2000], flush=True)


if __name__ == "__main__":
    main()
