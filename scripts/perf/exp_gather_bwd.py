"""Measure the window-gather backward implementations on TPU.

Compares swin_tiny backprop under the two _BWD_IMPL choices in
ops/window_gather.py (inverse gather vs structured transpose chain), plus
vit_base backprop for the fused_mha bf16-score-matmul change. One process,
sequential, slope-timed.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    from tfimm_tpu.ops import window_gather
    from tfimm_tpu.utils.profile import time_model

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "swin"):
        for impl in ("structured", "gather"):
            window_gather._BWD_IMPL = impl
            window_gather._permutation_take.cache_clear()
            r = time_model("swin_tiny_patch4_window7_224",
                           target="backprop", batch_size=64, nb_batches=5)
            print(f"swin_tiny backprop bs64 bwd={impl}: {r:.1f} img/s",
                  flush=True)

    if which in ("all", "vit"):
        r = time_model("vit_base_patch16_224", target="backprop",
                       batch_size=64, nb_batches=5)
        print(f"vit_base backprop bs64: {r:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
