"""Re-measure results/v5e_maxbatch.csv throughputs on the shipping kernel
path (VERDICT r2 item 9).

The round-2 sweep ran with TFIMM_TPU_NO_FLASH=1 to bound the per-batch-size
Pallas compile costs of the max-batch SEARCH through the remote-compile
tunnel. The batch-size bounds it found are memory facts and stay valid (the
kernels keep activations in VMEM, freeing HBM if anything); this script
keeps those batch sizes and re-times each (model, target) once with the
kernels enabled — 2 compiles per model instead of a fresh search — then
rewrites the CSV in place.

Usage: python scripts/perf/maxbatch_remeasure.py [--results-file PATH]
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results-file", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "results",
        "v5e_maxbatch.csv"))
    args = parser.parse_args()

    os.environ.pop("TFIMM_TPU_NO_FLASH", None)  # the point of the re-run

    from tfimm_tpu.utils.profile import time_model

    with open(args.results_file) as f:
        reader = csv.DictReader(f)
        fields = reader.fieldnames
        rows = list(reader)

    tmp = args.results_file + ".tmp"
    done = set()
    if os.path.exists(tmp):
        with open(tmp) as f:
            done = {r["model"] for r in csv.DictReader(f)}

    write_header = not os.path.exists(tmp)
    for row in rows:
        if row["model"] in done:
            continue
        ibs = int(row["inference_batch_size"])
        bbs = int(row["backprop_batch_size"])
        try:
            inf = time_model(row["model"], target="inference",
                             batch_size=ibs, nb_batches=3)
            bwd = time_model(row["model"], target="backprop",
                             batch_size=bbs, nb_batches=3)
        except Exception as e:
            print(f"{row['model']}: FAILED ({type(e).__name__}: {e})",
                  flush=True)
            continue
        row["inference_img_per_sec"] = round(inf, 2)
        row["backprop_img_per_sec"] = round(bwd, 2)
        with open(tmp, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            if write_header:
                w.writeheader()
                write_header = False
            w.writerow(row)
        print(row, flush=True)

    new_rows = {}
    if os.path.exists(tmp):  # absent when every row failed on a fresh run
        with open(tmp) as f:
            new_rows = {r["model"]: r for r in csv.DictReader(f)}
    if len(new_rows) == len(rows):
        with open(args.results_file, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            for row in rows:  # keep original order
                w.writerow(new_rows[row["model"]])
        os.remove(tmp)
        print("maxbatch remeasure done (CSV rewritten)", flush=True)
    else:
        print(f"partial: {len(new_rows)}/{len(rows)} rows in {tmp}; "
              "re-run to resume", flush=True)


if __name__ == "__main__":
    main()
