"""Measure the sublane-stacked attention-kernel bodies on TPU.

Three opt-in variants (all interpret-tested, off by default until this
experiment decides them):

  TFIMM_TPU_MHA_STACKED=1     fused_mha pair bodies    -> vit_base
  TFIMM_TPU_WINDOW_STACKED=1  window_mha group bodies  -> swin_tiny
  TFIMM_TPU_CAIT_STACKED=1    cait head-chunk bodies   -> cait_s24
  TFIMM_TPU_RELPOS_PAIRED=1   relpos head-pair packing -> sam_vit_b encoder

Each (model, target, stacked on/off) cell is slope-timed in its OWN
subprocess — the env vars are read at kernel trace time, and a fresh
process guarantees no stale jit cache crosses configs. Rows append to
results/stacked_experiment.csv; completed rows are skipped on rerun
(tunnel-flake resumable). Remote Pallas compiles cost ~8 min per new
variant: the full matrix is ~12 cells, budget ~1.5-2h.

Usage:
  python scripts/perf/exp_stacked.py            # run all remaining cells
  python scripts/perf/exp_stacked.py --cell vit_base_patch16_224:backprop:1
"""

import csv
import os
import subprocess
import sys
import time

# After a timed-out worker is killed, its in-flight remote-TPU work can
# linger server-side and contend the next cell's slope timing (the exact
# zombie-contention failure the round-2 sweeps hit); let the chip drain.
SETTLE_AFTER_TIMEOUT_S = 120

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
OUT = os.path.join(ROOT, "results", "stacked_experiment.csv")

CELLS = [
    # (model, env var, batch sizes per target)
    ("vit_base_patch16_224", "TFIMM_TPU_MHA_STACKED",
     {"inference": 128, "backprop": 64}),
    ("swin_tiny_patch4_window7_224", "TFIMM_TPU_WINDOW_STACKED",
     {"inference": 128, "backprop": 64}),
    ("cait_s24_224", "TFIMM_TPU_CAIT_STACKED",
     {"inference": 128, "backprop": 64}),
    # TFIMM_TPU_CAIT_LARGE (the round-3 widened forward VMEM gate):
    # RESOLVED round 4 and the toggle REMOVED. Every registered @384 CaiT
    # already fits the default 10 MB gate (deviceless HLO diff), and the
    # only shape the widened gate added — cait_m48_448, 784 tokens — FAILS
    # to compile on hardware (XLA:TPU scoped-vmem OOM, 20.54 MB > 16 MB;
    # both =1 cells of this experiment). The =0 rows in the CSV (68.2
    # inference / 23.7 backprop img/s at bs 8/4) measure the shipping XLA
    # path at that shape and stand as its record.
]

WORKER = r"""
import sys
sys.path.insert(0, {root!r})
from tfimm_tpu.utils.profile import time_model
rate = time_model({model!r}, target={target!r}, batch_size={bs}, nb_batches=5)
print("RESULT", rate)
"""


def done_cells():
    if not os.path.exists(OUT):
        return set()
    with open(OUT) as f:
        return {(r["model"], r["target"], r["stacked"])
                for r in csv.DictReader(f)}


SAM_CELLS = [
    # (label, exp_sam_window.py mode, marker in its output)
    ("sam_vit_b_image_encoder_1024", "encoder", "fwd total"),
    ("sam_vit_b_image_encoder_1024", "encoder_bwd", "bwd total"),
]


def run_cell(model, env_var, target, bs, stacked):
    env = dict(os.environ)
    env[env_var] = "1" if stacked else "0"
    code = WORKER.format(root=ROOT, model=model, target=target, bs=bs)
    p = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=1800)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
    return None


def run_sam_cell(mode, marker, paired):
    env = dict(os.environ)
    # "force" bypasses the is_training gate (round 4: paired is default-on
    # for inference, auto-off in training contexts) so the backprop A/B
    # really measures the paired backward rather than the same unpaired
    # path twice.
    env["TFIMM_TPU_RELPOS_PAIRED"] = "force" if paired else "0"
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "perf",
                                      "exp_sam_window.py"), mode],
        env=env, capture_output=True, text=True, timeout=2400)
    for line in p.stdout.splitlines():
        if marker in line and "img/s" in line:
            try:
                return float(line.rsplit("(", 1)[1].split()[0])
            except (IndexError, ValueError):
                break  # unexpected format: report FAILED, keep sweeping
    sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
    return None


def main():
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--cell":
        only = tuple(sys.argv[2].split(":"))
    done = done_cells()
    new_file = not os.path.exists(OUT)
    with open(OUT, "a", newline="") as f:
        w = csv.writer(f)
        if new_file:
            # "toggle" records WHICH env var the on/off column refers to:
            # the cait_s24_384 row toggles TFIMM_TPU_CAIT_LARGE (kernel vs
            # XLA fallback), NOT a stacked body — don't read its ratio as a
            # stacking result.
            w.writerow(["model", "target", "toggle", "stacked", "batch_size",
                        "img_per_sec"])
        for model, env_var, targets in CELLS:
            for target, bs in targets.items():
                for stacked in ("1", "0"):
                    if only and (model, target, stacked) != only:
                        continue
                    if (model, target, stacked) in done:
                        print(f"skip {model} {target} stacked={stacked}")
                        continue
                    print(f"run  {model} {target} stacked={stacked} ...",
                          flush=True)
                    try:
                        rate = run_cell(model, env_var, target, bs,
                                        stacked == "1")
                    except subprocess.TimeoutExpired:
                        print(f"  TIMEOUT (settling {SETTLE_AFTER_TIMEOUT_S}s"
                              " for the killed worker's remote work)",
                              flush=True)
                        time.sleep(SETTLE_AFTER_TIMEOUT_S)
                        continue
                    if rate is None:
                        print("  FAILED", flush=True)
                        continue
                    w.writerow([model, target, env_var, stacked, bs,
                                round(rate, 1)])
                    f.flush()
                    print(f"  {rate:.1f} img/s", flush=True)
        for label, mode, marker in SAM_CELLS:
            target = "inference" if mode == "encoder" else "backprop"
            for paired in ("1", "0"):
                if only and (label, target, paired) != only:
                    continue
                if (label, target, paired) in done:
                    print(f"skip {label} {target} paired={paired}")
                    continue
                print(f"run  {label} {target} paired={paired} ...",
                      flush=True)
                try:
                    rate = run_sam_cell(mode, marker, paired == "1")
                except subprocess.TimeoutExpired:
                    print(f"  TIMEOUT (settling {SETTLE_AFTER_TIMEOUT_S}s"
                          " for the killed worker's remote work)",
                          flush=True)
                    time.sleep(SETTLE_AFTER_TIMEOUT_S)
                    continue
                if rate is None:
                    print("  FAILED", flush=True)
                    continue
                w.writerow([label, target, "TFIMM_TPU_RELPOS_PAIRED",
                            paired, 1, round(rate, 1)])
                f.flush()
                print(f"  {rate:.1f} img/s", flush=True)
    summarize()


def summarize():
    """Print stacked-vs-baseline ratios for every completed (model, target)."""
    if not os.path.exists(OUT):
        return
    cells = {}
    toggles = {}
    with open(OUT) as f:
        for r in csv.DictReader(f):
            cells[(r["model"], r["target"], r["stacked"])] = float(
                r["img_per_sec"])
            toggles[(r["model"], r["target"])] = r.get("toggle", "")
    print("\n=== toggle on vs off ===")
    for (model, target, s), on in sorted(cells.items()):
        if s != "1":
            continue
        off = cells.get((model, target, "0"))
        ratio = f"{on / off:5.3f}x" if off else "  (no baseline)"
        base = f"{off:9.1f}" if off else "        ?"
        tog = toggles.get((model, target), "")
        print(f"{model:32s} {target:9s} {tog:26s} "
              f"{base} -> {on:9.1f}  {ratio}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--summary":
        summarize()
    else:
        main()
