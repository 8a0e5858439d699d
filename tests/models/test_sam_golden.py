"""SAM component parity against Meta's original implementation.

Ground truth: tests/fixtures/golden/sam.npz, generated once by
scripts/make_golden_fixtures_sam.py from the reference checkout's vendored
facebookresearch/segment-anything code (tiny config, seeded random weights).
Covers the reference's SAM test scope (tests/models/test_segment_anything.py
:152 empty-prompt prompt-encoder case, mask-decoder parity, :440
transfer_weights, :475 save/load) with ground truth nobody in this repo
authored.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from tfimm_tpu.models.registry import model_entrypoint
from tfimm_tpu.utils.pt_convert import convert_pt_state_dict
import tfimm_tpu.architectures.segment_anything  # noqa: F401

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "fixtures", "golden", "sam.npz")


@pytest.fixture(scope="module")
def golden():
    data = np.load(FIXTURE)
    meta = json.loads(bytes(data["meta"]).decode())
    sd = {k[4:]: data[k] for k in data.files if k.startswith("sd::")}
    return data, meta, sd


@pytest.fixture(scope="module")
def model(golden):
    data, meta, sd = golden
    cls, cfg = model_entrypoint("sam_vit_b")
    kwargs = {k: tuple(v) if isinstance(v, list) else v
              for k, v in meta["config"].items()}
    cfg = dataclasses.replace(cfg, **kwargs)
    m = cls(cfg)
    m.init(0)
    m.params = convert_pt_state_dict(m, sd)
    return m


def _err(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    assert a.shape == b.shape, (a.shape, b.shape)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


def test_image_encoder_parity(golden, model):
    data, _, _ = golden
    emb = model.image_encoder(model.params["image_encoder"],
                              jnp.asarray(data["input"]))
    assert _err(np.asarray(emb).transpose(0, 3, 1, 2),
                data["encoder_output"]) < 1e-4


def test_dense_pe_parity(golden, model):
    data, _, _ = golden
    pe = model.prompt_encoder.get_dense_pe(model.params["prompt_encoder"],
                                           (4, 4))
    assert _err(np.asarray(pe).transpose(2, 0, 1), data["dense_pe"][0]) < 1e-5


def _prompt(model, points=None, labels=None, boxes=None, masks=None, n=1):
    inputs = {
        "points": jnp.zeros((n, 0, 2)) if points is None else jnp.asarray(points),
        "labels": jnp.zeros((n, 0), jnp.int32) if labels is None
        else jnp.asarray(labels),
        "boxes": jnp.zeros((n, 0, 4)) if boxes is None else jnp.asarray(boxes),
        "masks": jnp.zeros((n, 0, 16, 16)) if masks is None
        else jnp.asarray(masks),
    }
    return model.prompt_encoder(model.params["prompt_encoder"], inputs)


def test_prompt_encoder_points_parity(golden, model):
    data, _, _ = golden
    sparse, dense = _prompt(model, points=data["points_coords"],
                            labels=data["points_labels"])
    assert _err(sparse, data["points_sparse"]) < 1e-5
    assert _err(np.asarray(dense).transpose(0, 3, 1, 2),
                data["points_dense"]) < 1e-5


def test_prompt_encoder_boxes_parity(golden, model):
    data, _, _ = golden
    sparse, _ = _prompt(model, boxes=data["boxes"].reshape(1, 1, 4))
    assert _err(sparse, data["boxes_sparse"]) < 1e-5


def test_prompt_encoder_mask_input_parity(golden, model):
    data, _, _ = golden
    _, dense = _prompt(model, masks=data["mask_input"])
    assert _err(np.asarray(dense).transpose(0, 3, 1, 2),
                data["mask_dense"]) < 1e-5


def test_prompt_encoder_empty_prompt_parity(golden, model):
    """Reference: tests/models/test_segment_anything.py:152 — no prompts at
    all must yield an (N, 0, D) sparse embedding and the no-mask dense."""
    data, _, _ = golden
    sparse, dense = _prompt(model)
    assert tuple(np.asarray(sparse).shape) == tuple(data["empty_sparse_shape"])
    assert _err(np.asarray(dense).transpose(0, 3, 1, 2),
                data["empty_dense"]) < 1e-5


def test_mask_decoder_parity(golden, model):
    data, _, _ = golden
    emb = jnp.asarray(data["encoder_output"].transpose(0, 2, 3, 1))
    pe = jnp.asarray(data["dense_pe"].transpose(0, 2, 3, 1))
    masks, iou = model.mask_decoder(
        model.params["mask_decoder"],
        {"image_embeddings": emb,
         "image_pe": pe,
         "sparse_embeddings": jnp.asarray(data["points_sparse"]),
         "dense_embeddings": jnp.asarray(
             data["points_dense"].transpose(0, 2, 3, 1))},
        multimask_output=True,
    )
    assert _err(masks, data["decoder_masks"]) < 1e-4
    assert _err(iou, data["decoder_iou"]) < 1e-4


def test_sam_transfer_weights(golden, model):
    """Resolution-change transfer: pos-embed and rel-pos tables interpolate
    (reference: tests/models/test_segment_anything.py:440)."""
    from tfimm_tpu.models.factory import transfer_weights

    cls = type(model)
    cfg = dataclasses.replace(model.cfg, input_size=(128, 128))
    target = cls(cfg)
    target.init(0)
    transfer_weights(model, target)
    img = np.random.default_rng(0).uniform(-1, 1, (1, 128, 128, 3))
    emb = target.image_encoder(target.params["image_encoder"],
                               jnp.asarray(img, jnp.float32))
    assert np.asarray(emb).shape == (1, 8, 8, 8)
    assert np.isfinite(np.asarray(emb)).all()


def test_sam_save_load_roundtrip(golden, model, tmp_path):
    """Reference: tests/models/test_segment_anything.py:475."""
    from tfimm_tpu import load_model, save_model

    data, _, _ = golden
    save_model(model, tmp_path / "sam")
    restored = load_model(tmp_path / "sam")
    assert type(restored) is type(model)
    assert restored.cfg == model.cfg
    emb0 = model.image_encoder(model.params["image_encoder"],
                               jnp.asarray(data["input"]))
    emb1 = restored.image_encoder(restored.params["image_encoder"],
                                  jnp.asarray(data["input"]))
    np.testing.assert_array_equal(np.asarray(emb0), np.asarray(emb1))
