#!/usr/bin/env python
"""Interactive parity harness for porting new architectures
(reference: scripts/test_conversion.py:1-93).

Given a model name and a PT checkpoint (or timm), converts weights and prints
the max absolute/relative logit deviation on a fixed random image. Repeated
eval-mode calls verify BN statistics are used consistently.

Usage: python scripts/test_conversion.py --model resnet18 --checkpoint r18.pth
"""

import argparse
import os
import sys

# Allow running the script from anywhere without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--timm-name", default="")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    import numpy as np
    import torch

    import jax.numpy as jnp
    from tfimm_tpu import create_model
    from tfimm_tpu.utils.pt_convert import load_pt_state_dict

    try:
        import timm
    except ImportError:
        timm = None

    jax_model = create_model(args.model)
    timm_name = args.timm_name or args.model
    if timm is None:
        raise SystemExit("This harness compares against timm; install timm or "
                         "use tests/test_pt_parity.py's torch_refs instead.")
    pt_model = timm.create_model(timm_name, pretrained=False)
    if args.checkpoint:
        sd = torch.load(args.checkpoint, map_location="cpu")
        pt_model.load_state_dict(sd)
    pt_model.eval()
    load_pt_state_dict(jax_model, pt_model.state_dict())

    rng = np.random.default_rng(args.seed)
    h, w = jax_model.cfg.input_size
    img = rng.uniform(-1, 1, size=(2, h, w, jax_model.cfg.in_channels))
    img = img.astype("float32")
    with torch.no_grad():
        pt_out = pt_model(torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
    for trial in range(2):  # repeated calls check BN state handling
        jax_out = np.asarray(jax_model(jnp.asarray(img)))
        abs_err = np.abs(jax_out - pt_out).max()
        rel_err = abs_err / max(np.abs(pt_out).max(), 1e-6)
        print(f"trial {trial}: max abs err {abs_err:.2e}, rel {rel_err:.2e}")
    print("PASS" if rel_err < 1e-3 else "FAIL (rel err >= 1e-3)")


if __name__ == "__main__":
    main()
