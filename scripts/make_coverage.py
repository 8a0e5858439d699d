"""Generate results/coverage.csv: map every registered user-facing variant to
its measured zoo row, or to the measured variant whose compiled forward graph
it shares (weight-only re-releases: same architecture, different checkpoint).

Makes the zoo-breadth claim mechanically auditable (VERDICT r3 item 8): the
reference publishes ~181 profiling rows for 286 variants because many
variants differ only in pretraining corpus (in21k/ssl/swsl/ap/ns/miil...).
Here every variant gets one of:

  measured          its own row in results/v5e_zoo.csv or v5e_headline.csv
  alias             identical graph key to a measured variant (only name /
                    URL / preprocessing metadata differ)
  alias-head        graph key differs ONLY in nb_classes (an in21k head is
                    a wider final matmul on an identical trunk)
  UNEXPLAINED       none of the above — a distinct unmeasured graph

Usage: python scripts/make_coverage.py [--check]
  --check exits nonzero if any row is UNEXPLAINED.
"""

import csv
import os
import sys
from dataclasses import fields

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ROOT)

import tfimm_tpu  # noqa: E402,F401
import tfimm_tpu.architectures.segment_anything  # noqa: E402,F401 (register)
from tfimm_tpu.models.registry import (  # noqa: E402
    list_models,
    model_class,
    model_config,
)

OUT = os.path.join(ROOT, "results", "coverage.csv")

# Fields that do not shape the compiled forward graph: identity, checkpoint
# URL, and preprocessing/weight-transfer metadata.
NON_GRAPH_FIELDS = {
    "name", "url", "crop_pct", "interpolation", "mean", "std",
    "first_conv", "classifier", "transform_weights", "weights_to_ignore",
    "fixed_input_size",
}
# Head-width-only field: an in21k variant is the same trunk with a wider
# final matmul.
HEAD_FIELDS = {"nb_classes"}

# Registry name -> the name its measurement is published under (SAM is
# measured as its image encoder at the deployment resolution).
NAME_ALIASES = {"sam_vit_b": "sam_vit_b_image_encoder_1024"}


def graph_key(name, with_head=True):
    cfg = model_config(name)
    cls = model_class(name)
    skip = NON_GRAPH_FIELDS | (set() if with_head else HEAD_FIELDS)
    items = tuple(sorted(
        (f.name, repr(getattr(cfg, f.name)))
        for f in fields(cfg) if f.name not in skip))
    return (cls.__name__,) + items


def measured_models():
    out = set()
    for fn in ("v5e_zoo.csv", "v5e_headline.csv"):
        path = os.path.join(ROOT, "results", fn)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for row in csv.DictReader(f):
                m = row.get("model", "")
                if m:
                    out.add(m.strip())
    return out


def main():
    measured = measured_models()
    names = list_models()
    full_key = {n: graph_key(n, with_head=True) for n in names}
    trunk_key = {n: graph_key(n, with_head=False) for n in names}
    by_full, by_trunk = {}, {}
    for n in names:
        if n in measured:
            by_full.setdefault(full_key[n], n)
            by_trunk.setdefault(trunk_key[n], n)

    rows, unexplained = [], 0
    for n in sorted(names):
        if n in measured:
            rows.append([n, "measured", "", ""])
        elif NAME_ALIASES.get(n) in measured:
            rows.append([n, "measured", NAME_ALIASES[n], "published-as"])
        elif full_key[n] in by_full:
            rows.append([n, "alias", by_full[full_key[n]],
                         "graph-identical"])
        elif trunk_key[n] in by_trunk:
            rows.append([n, "alias-head", by_trunk[trunk_key[n]],
                         "nb_classes-only"])
        else:
            rows.append([n, "UNEXPLAINED", "", ""])
            unexplained += 1

    with open(OUT, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["model", "status", "alias_of", "note"])
        w.writerows(rows)
    n_meas = sum(1 for r in rows if r[1] == "measured")
    n_alias = sum(1 for r in rows if r[1].startswith("alias"))
    print(f"{len(rows)} variants: {n_meas} measured, {n_alias} aliases, "
          f"{unexplained} UNEXPLAINED -> {OUT}")
    if "--check" in sys.argv and unexplained:
        for r in rows:
            if r[1] == "UNEXPLAINED":
                print("  UNEXPLAINED:", r[0])
        sys.exit(1)
    return unexplained


if __name__ == "__main__":
    main()
