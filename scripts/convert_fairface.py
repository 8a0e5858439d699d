#!/usr/bin/env python
"""Convert FairFace attribute models (torchvision ResNet-34 checkpoints) to
tfimm_tpu (reference: scripts/convert_fairface.py:20-76).

FairFace ships torchvision-format ResNet-34 state dicts with an 18-way
attribute head (race 7 + gender 2 + age 9). torchvision's resnet naming
matches timm's, so conversion is the standard path with nb_classes=18.

Usage: python scripts/convert_fairface.py \
           --checkpoint res34_fair_align_multi_7.pt --output-dir /models
"""

import argparse
import os
import sys

# Allow running the script from anywhere without installing the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--name", default="fairface_resnet34")
    args = parser.parse_args()

    import numpy as np
    import torch

    import jax.numpy as jnp
    from tfimm_tpu import create_model, save_model
    from tfimm_tpu.utils.pt_convert import load_pt_state_dict

    model = create_model("resnet34", nb_classes=18)
    state_dict = torch.load(args.checkpoint, map_location="cpu")
    if isinstance(state_dict, torch.nn.Module):
        state_dict = state_dict.state_dict()
    load_pt_state_dict(model, state_dict)

    # Smoke check: logits finite on a random image.
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 224, 224, 3)),
                    jnp.float32)
    y = model(x)
    assert y.shape == (1, 18) and bool(jnp.all(jnp.isfinite(y)))

    out = os.path.join(args.output_dir, args.name)
    save_model(model, out)
    print(f"saved to {out}")


if __name__ == "__main__":
    main()
