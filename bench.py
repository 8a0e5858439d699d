"""Headline benchmark: ViT-B/16 inference images/sec/chip at batch 128.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the reference's published V100 fp32 number for vit_base_patch16_224
inference (3865.84 img/s, results/profiling/v100.csv; see BASELINE.md).
`roofline_fraction` reports value x FLOPs/img against v5e bf16 peak — the
criterion BASELINE.json actually sets.

Runs bf16 on the TPU chip (the TPU-native deployment dtype); fp32 params are
cast, compute follows.

Timing methodology (all three steps matter through the axon remote-TPU
tunnel):
  1. The whole loop runs on-device inside one jitted fori_loop with a data
     dependency between iterations and only a SCALAR fetched back — naive
     per-call block_until_ready timing measured "1.3M img/s" here (~240x
     roofline, i.e. nothing).
  2. DIFFERENTIAL timing: the same compiled function is timed at two
     iteration counts and throughput comes from the slope. A single timed
     call carries a fixed ~60 ms dispatch+readback overhead through the
     tunnel (measured: the same per-iteration body costs "4.2 ms" at n=20
     but "1.8 ms" at n=100), which the difference cancels exactly.
  3. MEDIAN OF K INDEPENDENT SLOPE SAMPLES (round 5). One slope sample is
     one-sided fragile: a transient stall in the 1.7 s long leg inflates
     the slope and nothing detects it — a single ~300 ms tunnel stall
     reproduces BENCH_r04's 18% ViT-B dip exactly (3,776 vs 4,603 while
     ConvNeXt-B and ViT-backprop in the SAME run matched the committed
     numbers to 1.2%, ruling out uniform degradation or contention).
     The headline takes 5 samples; the JSON carries the raw samples,
     their relative spread, and the middle-3 core spread so a reader can
     tell a clean run from a stall-contaminated one.

Every throughput line also carries the Pallas kernel-dispatch fingerprint
captured at trace time (which kernel bodies were selected), so an
environment-sensitive dispatch difference is distinguishable from a slow
transport after the fact.
"""

import csv
import json
import os

from tfimm_tpu.utils.constants import V5E_BF16_PEAK_FLOPS as V5E_BF16_PEAK

BASELINE_IMG_PER_SEC = 3865.84  # V100 fp32, results/profiling/v100.csv


def _flops_per_image(name, fallback_macs):
    """True FLOPs/img = 2x the MACs stored in results/flops.csv (the
    timm/tfimm table stores MACs; XLA cost analysis, matches timm param-for-
    param). Read from the committed artifact so bench.py and the sweep
    scripts (resweep/zoo, which read the same file) publish identical
    roofline math — a hand-copied constant here drifted 3.7% for
    convnext_base in round 2. SEMANTIC CHANGE (round 2): roofline_fraction
    values printed before the 2x MACs->FLOPs correction (BENCH_r01.json)
    understate by exactly 2x — compare historical JSON lines accordingly."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "flops.csv")
    try:
        with open(path) as f:
            for row in csv.DictReader(f):
                if row["model"] == name:
                    return 2 * float(row["flops"])
    except OSError:
        pass
    return 2 * fallback_macs


VIT_B16_FLOPS = _flops_per_image("vit_base_patch16_224", 17.84e9)
# Secondary north-star config. (Swin is deliberately NOT benched here: its
# windowed-attention Pallas kernels take ~8 min per variant to compile
# through the remote-TPU tunnel, which would blow the bench's time budget —
# Swin numbers are published in results/v5e_headline.csv instead.)
CONVNEXT_B_FLOPS = _flops_per_image("convnext_base", 15.96e9)


def _throughput(name, batch_size=128, target="inference", samples=5,
                nb_batches=12, training=False):
    """Slope-timed throughput — the shared implementation in
    utils/profile.py (one jitted fori_loop with a data dependency, traced
    count, differential timing, positive-slope retries, median of
    ``samples`` independent slopes). bench.py and every published CSV must
    time the same way; a second copy here drifted from time_model once
    (tuple outputs) before being consolidated.

    Returns (median_rate, stats) where stats carries the raw samples, their
    spread, and the Pallas kernel-dispatch fingerprint of the trace."""
    from tfimm_tpu.ops.pallas.dispatch import capture_dispatches
    from tfimm_tpu.utils.profile import time_model

    with capture_dispatches() as kernels:
        rate, stats = time_model(name, target=target, batch_size=batch_size,
                                 nb_batches=nb_batches, samples=samples,
                                 training=training, return_stats=True)
    stats["kernels"] = sorted(kernels)
    raw = sorted(stats["samples"])
    if len(raw) >= 5:  # spread of the middle 3: robust to 1-2 stalled legs
        core = raw[1:-1]
        stats["spread_core_rel"] = round(
            (core[-1] - core[0]) / (sum(core) / len(core)), 4)
    return rate, stats


def main():
    img_per_sec, stats = _throughput("vit_base_patch16_224", samples=5)
    result = {
        "metric": "vit_base_patch16_224_inference_bs128",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "samples": stats["samples"],
        "spread_rel": stats["spread_rel"],
        "spread_core_rel": stats.get("spread_core_rel"),
        "kernels": stats["kernels"],
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
        "roofline_fraction": round(
            img_per_sec * VIT_B16_FLOPS / V5E_BF16_PEAK, 3
        ),
        # MEASURED floor (round 4, scripts/perf/exp_attn_floor.py ->
        # results/attn_floor.csv): the shipping attention kernel
        # (0.656 ms/layer) is 1.39x FASTER than XLA's own matmuls-only
        # attention at the same shapes (0.913), and ablating its softmax
        # saves only 1.7% (0.645) — the kernel is matmul-structure-bound
        # at its own skeleton. Ceiling = measured model time with
        # attention at that skeleton floor and every other op as measured
        # (87-94% peak, results/README.md decomposition). The earlier
        # 0.90 constant assumed a 0.37 ms analytic "padded FLOPs at
        # 197 TF/s" floor that no measured implementation approaches.
        "practical_ceiling_fraction": 0.84,
        "practical_ceiling_def": (
            "model time with the attention kernel at its measured matmul-"
            "skeleton floor (softmax-ablated kernel, 0.645 ms/layer, "
            "results/attn_floor.csv; XLA's matmuls-only floor is 0.913) "
            "and every other op as measured (87-94% peak) — "
            "results/README.md ViT-B decomposition"),
    }
    # Secondary north-star configs (BASELINE.json names ConvNeXt-B alongside
    # ViT-B; Swin-T is the windowed-attention kernel's flagship). Failures
    # here must not take down the primary metric line.
    for name, key, flops in [
        ("convnext_base", "convnext_base_img_per_sec", CONVNEXT_B_FLOPS),
    ]:
        try:
            rate, cn_stats = _throughput(name, samples=3)
            result[key] = round(rate, 2)
            result[key.replace("_img_per_sec", "_samples")] = (
                cn_stats["samples"])
            result[key.replace("_img_per_sec", "_kernels")] = (
                cn_stats["kernels"])
            result[key.replace("_img_per_sec", "_roofline_fraction")] = round(
                rate * flops / V5E_BF16_PEAK, 3)
            # Decomposition-backed (results/README.md): the 7x7 depthwise
            # conv is VPU-bound at ~4.5 TF/s with no MXU formulation, so
            # ConvNeXt-B's physical ceiling is ~0.60 of the useful-FLOP
            # roofline even with every matmul at peak. (The measured op-SUM
            # bound is lower, ~0.52 — it double-counts glue HBM traffic that
            # XLA fuses; the emitted ceiling is the physical definition.)
            result[key.replace("_img_per_sec",
                               "_practical_ceiling_fraction")] = 0.60
            result[key.replace("_img_per_sec", "_practical_ceiling_def")] = (
                "dwconv at its measured VPU floor (~4.5 TF/s, "
                "exp_dwconv.py) + every matmul at peak — results/README.md "
                "ConvNeXt-B decomposition")
        except Exception:
            pass
    # ViT-B backprop @bs64 — BASELINE.md calls the backprop V100 columns the
    # trustworthy comparison. Roofline uses 3x forward FLOPs (1:2 fwd:bwd).
    try:
        rate, bwd_stats = _throughput("vit_base_patch16_224",
                                      target="backprop", batch_size=64,
                                      nb_batches=3, samples=5)
        result["vit_base_backprop_img_per_sec"] = round(rate, 2)
        result["vit_base_backprop_samples"] = bwd_stats["samples"]
        result["vit_base_backprop_kernels"] = bwd_stats["kernels"]
        result["vit_base_backprop_vs_v100_fp32"] = round(rate / 92.36, 2)
        result["vit_base_backprop_roofline_fraction"] = round(
            rate * 3 * VIT_B16_FLOPS / V5E_BF16_PEAK, 3)
        # Decomposition-backed (results/README.md vit_bwd table), both
        # named levers now MEASURED EXHAUSTED: (round 4) the attention
        # kernel's fwd+bwd (0.689 ms/layer) already beats XLA's
        # matmuls-only floor (0.719, results/attn_floor.csv); (round 5)
        # the standalone-LN rows are an isolation artifact — fusing LN
        # into its downstream Dense (full Pallas fwd+bwd,
        # ops/pallas/ln_dense.py) LOSES 0.71-0.73x f+b because XLA's
        # in-graph LN->Dense composition already runs at 85% of peak
        # (results/ln_dense.csv). The measured step is at its ceiling.
        result["vit_base_backprop_practical_ceiling_fraction"] = 0.70
        result["vit_base_backprop_practical_ceiling_def"] = (
            "measured-exhausted: attention kernel below XLA's matmuls-only "
            "fwd+bwd floor (attn_floor.csv) and LN-into-Dense fusion "
            "measured negative (ln_dense.csv) — no named lever remains")
    except Exception:
        pass
    # Train-mode backprop (round 5): the reference times training=True
    # (tfimm/utils/profile.py:97) — drop-path/dropout active, BN on batch
    # stats with running-stat merges. Published alongside the BN-stable
    # column so vs-V100-backprop comparisons are apples-to-apples
    # (docs/profiling.md explains both modes).
    try:
        rate, tr_stats = _throughput("vit_base_patch16_224",
                                     target="backprop", batch_size=64,
                                     nb_batches=3, samples=3, training=True)
        result["vit_base_backprop_train_img_per_sec"] = round(rate, 2)
        result["vit_base_backprop_train_samples"] = tr_stats["samples"]
        result["vit_base_backprop_train_vs_v100_fp32"] = round(
            rate / 92.36, 2)
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
