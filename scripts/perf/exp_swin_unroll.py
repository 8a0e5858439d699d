"""End-to-end check of the window_mha unroll default (round-5 occupancy
follow-up).

exp_swin_occupancy.py's wb sweep put the isolated stage-1 call's minimum at
wb=4 (unroll 12; 1.652 ms) vs the shipping default unroll 32 -> wb=10
(1.750 ms) — a 6% isolated-cell gap. This measures whether that transfers
end-to-end: swin_tiny bs128 inference, the full shipping dispatch (fused
blocks + window-resident stages), _MAX_UNROLL A/B'd at module level.

Run on TPU: python scripts/perf/exp_swin_unroll.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import tfimm_tpu.ops.pallas.window_mha as wm
from tfimm_tpu.utils.profile import time_model


def main():
    for unroll in (32, 12, 16):
        wm._MAX_UNROLL = unroll
        rate, stats = time_model(
            "swin_tiny_patch4_window7_224", target="inference",
            batch_size=128, nb_batches=5, samples=3, return_stats=True)
        print(f"unroll={unroll:2d}: {rate:8.1f} img/s "
              f"(spread {100*stats['spread_rel']:.2f}%)", flush=True)


if __name__ == "__main__":
    main()
