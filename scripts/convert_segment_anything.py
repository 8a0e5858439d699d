#!/usr/bin/env python
"""Convert Meta SAM checkpoints and compare component outputs
(reference: scripts/convert_segment_anything.py:1-94).

Usage: python scripts/convert_segment_anything.py --model sam_vit_b \
           --checkpoint sam_vit_b_01ec64.pth --output-dir /models
"""

import argparse
import os
import sys

# Allow running the script from anywhere without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=["sam_vit_b", "sam_vit_l", "sam_vit_h"])
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--compare", action="store_true",
                        help="Compare encoder outputs against the official "
                             "segment_anything package (if installed)")
    args = parser.parse_args()

    import numpy as np
    import torch

    import jax.numpy as jnp
    import tfimm_tpu.architectures.segment_anything  # noqa: F401
    from tfimm_tpu import save_model
    from tfimm_tpu.models.registry import model_entrypoint
    from tfimm_tpu.utils.pt_convert import load_pt_state_dict

    cls, cfg = model_entrypoint(args.model)
    model = cls(cfg)
    model.init(0)
    state_dict = torch.load(args.checkpoint, map_location="cpu")
    load_pt_state_dict(model, state_dict)
    save_model(model, os.path.join(args.output_dir, args.model))
    print(f"saved to {os.path.join(args.output_dir, args.model)}")

    if args.compare:
        try:
            from segment_anything import sam_model_registry
        except ImportError:
            raise SystemExit("--compare requires the segment_anything package")
        build = {"sam_vit_b": "vit_b", "sam_vit_l": "vit_l",
                 "sam_vit_h": "vit_h"}[args.model]
        pt_sam = sam_model_registry[build](checkpoint=args.checkpoint).eval()
        img = np.random.default_rng(0).uniform(
            -1, 1, size=(1, 1024, 1024, 3)).astype("float32")
        with torch.no_grad():
            pt_emb = pt_sam.image_encoder(
                torch.from_numpy(img).permute(0, 3, 1, 2)).numpy()
        jax_emb = np.asarray(model.image_encoder(
            model.params["image_encoder"], jnp.asarray(img)))
        err = np.abs(jax_emb.transpose(0, 3, 1, 2) - pt_emb).max()
        print(f"image encoder max abs err: {err:.2e}")


if __name__ == "__main__":
    main()
