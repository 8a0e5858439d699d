#!/usr/bin/env python
"""Generate SAM golden fixtures from Meta's vendored Segment Anything code
(reference checkout: tfimm/architectures/segment_anything/torch/modeling —
the original facebookresearch/segment-anything implementation, which the
reference's own SAM tests use as ground truth).

Captures, for a tiny SAM config with seeded random weights:
  * image-encoder output for a fixed image,
  * prompt-encoder sparse/dense embeddings for points / boxes / mask-input /
    EMPTY prompt cases,
  * dense positional encoding,
  * mask-decoder masks + IoU predictions (multimask),
  * the full state_dict (loaded by tests through convert_pt_state_dict).

Run ONCE where /root/reference exists; only the .npz is committed
(tests/models/test_sam_golden.py consumes it).
"""

import importlib.util
import json
import os
import sys
from functools import partial

import numpy as np
import torch
import torch.nn as nn

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden", "sam.npz")
MODELING = ("/root/reference/tfimm/architectures/segment_anything/torch/"
            "modeling")


def load_meta_modeling():
    spec = importlib.util.spec_from_file_location(
        "meta_sam_modeling", os.path.join(MODELING, "__init__.py"),
        submodule_search_locations=[MODELING])
    mod = importlib.util.module_from_spec(spec)
    sys.modules["meta_sam_modeling"] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    m = load_meta_modeling()
    torch.manual_seed(200)

    img_size, patch, enc_dim, out_chans = 64, 16, 16, 8
    emb_size = img_size // patch  # 4

    image_encoder = m.ImageEncoderViT(
        depth=2, embed_dim=enc_dim, img_size=img_size, mlp_ratio=4.0,
        norm_layer=partial(nn.LayerNorm, eps=1e-6), num_heads=2, patch_size=patch,
        qkv_bias=True, use_rel_pos=True, global_attn_indexes=(1,),
        window_size=2, out_chans=out_chans,
    )
    prompt_encoder = m.PromptEncoder(
        embed_dim=out_chans, image_embedding_size=(emb_size, emb_size),
        input_image_size=(img_size, img_size), mask_in_chans=4,
    )
    mask_decoder = m.MaskDecoder(
        num_multimask_outputs=3,
        transformer=m.TwoWayTransformer(depth=2, embedding_dim=out_chans,
                                        mlp_dim=16, num_heads=2),
        transformer_dim=out_chans, iou_head_depth=3, iou_head_hidden_dim=8,
    )
    sam = m.Sam(image_encoder=image_encoder, prompt_encoder=prompt_encoder,
                mask_decoder=mask_decoder)
    sam.eval()

    rng = np.random.default_rng(200)
    img = rng.uniform(-1, 1, size=(1, img_size, img_size, 3)).astype("float32")

    arrays = {}
    with torch.no_grad():
        emb = image_encoder(torch.from_numpy(img).permute(0, 3, 1, 2))
        arrays["encoder_output"] = emb.numpy()  # (1, 8, 4, 4) NCHW

        arrays["dense_pe"] = prompt_encoder.get_dense_pe().numpy()

        points = rng.uniform(4, 60, size=(1, 2, 2)).astype("float32")
        labels = np.array([[1, 0]], dtype="int64")
        sp, dp = prompt_encoder(
            points=(torch.from_numpy(points), torch.from_numpy(labels)),
            boxes=None, masks=None)
        arrays["points_coords"] = points
        arrays["points_labels"] = labels.astype("int32")
        arrays["points_sparse"] = sp.numpy()
        arrays["points_dense"] = dp.numpy()

        boxes = np.array([[8.0, 10.0, 40.0, 50.0]], dtype="float32")
        sb, db = prompt_encoder(points=None, boxes=torch.from_numpy(boxes),
                                masks=None)
        arrays["boxes"] = boxes
        arrays["boxes_sparse"] = sb.numpy()

        mask_in = rng.uniform(-4, 4, size=(1, 1, 4 * emb_size, 4 * emb_size)
                              ).astype("float32")
        sm, dm = prompt_encoder(points=None, boxes=None,
                                masks=torch.from_numpy(mask_in))
        arrays["mask_input"] = mask_in
        arrays["mask_dense"] = dm.numpy()

        se, de = prompt_encoder(points=None, boxes=None, masks=None)
        arrays["empty_sparse_shape"] = np.asarray(se.shape)
        arrays["empty_dense"] = de.numpy()

        masks, iou = mask_decoder(
            image_embeddings=emb,
            image_pe=prompt_encoder.get_dense_pe(),
            sparse_prompt_embeddings=sp,
            dense_prompt_embeddings=dp,
            multimask_output=True,
        )
        arrays["decoder_masks"] = masks.numpy()
        arrays["decoder_iou"] = iou.numpy()

    sd = {f"sd::{k}": v.detach().numpy() for k, v in sam.state_dict().items()}
    arrays.update(sd)
    arrays["input"] = img
    meta = {
        "config": dict(input_size=(img_size, img_size), encoder_patch_size=patch,
                       encoder_embed_dim=enc_dim, encoder_nb_blocks=2,
                       encoder_nb_heads=2, embed_dim=out_chans,
                       encoder_global_attn_indices=(1,), encoder_window_size=2,
                       prompt_mask_hidden_dim=4, decoder_nb_blocks=2,
                       decoder_nb_heads=2, decoder_mlp_channels=16,
                       decoder_iou_hidden_dim=8),
        "source": "facebookresearch/segment-anything via reference vendored "
                  "copy (tfimm/architectures/segment_anything/torch/modeling)",
    }
    arrays["meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
