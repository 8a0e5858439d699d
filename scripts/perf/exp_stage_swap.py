"""Verify the stage-level AD swap: swin backprop should return to the
per-block numbers (~1225 img/s swin_tiny) while inference keeps the
window-resident gather path (~6519 img/s)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    from tfimm_tpu.utils.profile import time_model

    for name, bs, target in [
        ("swin_tiny_patch4_window7_224", 64, "backprop"),
        ("swin_tiny_patch4_window7_224", 128, "inference"),
    ]:
        r = time_model(name, target=target, batch_size=bs, nb_batches=5)
        print(f"{name} {target} bs{bs}: {r:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
