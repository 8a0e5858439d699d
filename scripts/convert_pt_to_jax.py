#!/usr/bin/env python
"""Offline checkpoint conversion (reference: scripts/convert_timm_to_tf.py).

Converts PyTorch/timm checkpoints into tfimm_tpu saved models. Works from
either the timm package (if installed) or a local .pth state_dict file, so
zero-egress environments can convert checkpoints downloaded elsewhere.

Usage:
    python scripts/convert_pt_to_jax.py --model vit_base_patch16_224 \
        --checkpoint /path/to/weights.pth --output-dir /models
    python scripts/convert_pt_to_jax.py --name-filter 'vit_*' --from-timm \
        --output-dir /models
"""

import argparse
import os
import sys

# Allow running the script from anywhere without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_one(name, output_dir, checkpoint="", from_timm=False):
    import torch

    from tfimm_tpu import create_model, save_model
    from tfimm_tpu.utils.pt_convert import load_pt_state_dict, load_timm_weights

    model = create_model(name)
    if checkpoint:
        state_dict = torch.load(checkpoint, map_location="cpu",
                                weights_only=False)
        for key in ("state_dict", "model"):
            if isinstance(state_dict, dict) and key in state_dict:
                state_dict = state_dict[key]
        load_pt_state_dict(model, state_dict)
    elif from_timm:
        timm_name = model.cfg.url[len("[timm]"):] or name
        load_timm_weights(model, timm_name)
    else:
        raise ValueError("Provide --checkpoint or --from-timm")
    save_model(model, os.path.join(output_dir, name))
    print(f"{name}: saved to {os.path.join(output_dir, name)}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="")
    parser.add_argument("--name-filter", default="")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--from-timm", action="store_true")
    parser.add_argument("--output-dir", required=True)
    args = parser.parse_args()

    from tfimm_tpu import list_models

    names = [args.model] if args.model else list_models(args.name_filter)
    os.makedirs(args.output_dir, exist_ok=True)
    for name in names:
        try:
            convert_one(name, args.output_dir, args.checkpoint, args.from_timm)
        except Exception as e:
            print(f"{name}: FAILED ({e})")


if __name__ == "__main__":
    main()
