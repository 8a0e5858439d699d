#!/usr/bin/env python
"""Validate a model on an image folder (timm's validate.py workflow; the
reference has no equivalent — accuracy evaluation there is inside the
trainer).

Folder layout: ``data_dir/<class_name>/*.{jpg,jpeg,png}``, classes sorted
alphabetically to index labels. Decoding runs on the native C++ pipeline
(tfimm_tpu.native) with a PIL fallback; the forward pass is jitted at a fixed
batch size (the last short batch is padded and masked out).

Usage:
    python scripts/validate.py --model vit_base_patch16_224 \
        --data-dir /data/imagenet/val --batch-size 128 [--model-path DIR]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--data-dir", required=True)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--model-path", default="",
                        help="Load weights from a save_model directory")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--num-threads", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tfimm_tpu import create_model, create_preprocessing
    from tfimm_tpu.train.datasets import ImageFolderConfig, ImageFolderDataset

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    kwargs = {"model_path": args.model_path} if args.model_path else {}
    model = create_model(args.model, dtype=dtype, **kwargs)
    preprocess = create_preprocessing(args.model,
                                      in_channels=model.cfg.in_channels)

    ds = ImageFolderDataset(ImageFolderConfig(
        path=args.data_dir, batch_size=args.batch_size,
        input_size=tuple(model.cfg.input_size), shuffle=False,
        num_threads=args.num_threads,
    ))
    if model.cfg.nb_classes < len(ds.classes):
        raise ValueError(
            f"Model has {model.cfg.nb_classes} classes but the folder has "
            f"{len(ds.classes)}")

    @jax.jit
    def forward(params, images):
        logits = model.apply(params, preprocess(images).astype(dtype),
                             training=False)
        if logits.ndim == 3:  # distilled: mean over heads
            logits = logits.mean(axis=1)
        return jnp.argsort(logits.astype(jnp.float32), axis=-1)[:, -5:]

    top1, top5, total = 0, 0, 0
    start = time.perf_counter()
    for images, labels in ds:
        top5_pred = np.asarray(forward(model.params, jnp.asarray(images)))
        top1 += int((top5_pred[:, -1] == labels).sum())
        top5 += int((top5_pred == labels[:, None]).any(axis=1).sum())
        total += len(labels)
    elapsed = time.perf_counter() - start

    print(f"model={args.model} samples={total} "
          f"top1={top1 / max(total, 1):.4f} top5={top5 / max(total, 1):.4f} "
          f"({total / max(elapsed, 1e-9):.1f} img/s incl. input pipeline)")


if __name__ == "__main__":
    main()
