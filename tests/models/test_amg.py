"""Automatic mask generator tests (reference: the PT-only
segment_anything/torch/automatic_mask_generator.py has no tests there; these
validate the JAX-native implementation directly)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from tfimm_tpu.models.registry import model_entrypoint
import tfimm_tpu.architectures.segment_anything  # noqa: F401
from tfimm_tpu.architectures.segment_anything.amg import (
    SAMAutomaticMaskGenerator,
    area_from_rle,
    batched_mask_to_box,
    build_all_layer_point_grids,
    build_point_grid,
    calculate_stability_score,
    generate_crop_boxes,
    mask_to_rle,
    nms,
    rle_to_mask,
)


def test_point_grid():
    grid = build_point_grid(4)
    assert grid.shape == (16, 2)
    assert grid.min() == pytest.approx(1 / 8)
    assert grid.max() == pytest.approx(7 / 8)
    layers = build_all_layer_point_grids(8, n_layers=2, scale_per_layer=2)
    assert [len(g) for g in layers] == [64, 16, 4]


def test_crop_boxes():
    boxes, layers = generate_crop_boxes((100, 150), n_layers=1,
                                        overlap_ratio=0.2)
    assert boxes[0] == [0, 0, 150, 100] and layers[0] == 0
    assert len(boxes) == 1 + 4 and set(layers[1:]) == {1}
    for x0, y0, x1, y1 in boxes[1:]:
        assert 0 <= x0 < x1 <= 150 and 0 <= y0 < y1 <= 100
    # Layer-1 crops jointly cover the image.
    cover = np.zeros((100, 150), bool)
    for x0, y0, x1, y1 in boxes[1:]:
        cover[y0:y1, x0:x1] = True
    assert cover.all()


@pytest.mark.parametrize("seed", range(4))
def test_rle_roundtrip(seed):
    rng = np.random.default_rng(seed)
    mask = rng.uniform(size=(17, 23)) > 0.7
    rle = mask_to_rle(mask)
    assert rle["size"] == [17, 23]
    assert sum(rle["counts"]) == 17 * 23
    np.testing.assert_array_equal(rle_to_mask(rle), mask)
    assert area_from_rle(rle) == int(mask.sum())


def test_rle_edge_cases():
    ones = np.ones((3, 4), bool)
    rle = mask_to_rle(ones)
    assert rle["counts"][0] == 0  # leading zero-run
    np.testing.assert_array_equal(rle_to_mask(rle), ones)
    zeros = np.zeros((3, 4), bool)
    np.testing.assert_array_equal(rle_to_mask(mask_to_rle(zeros)), zeros)


def test_nms():
    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # IoU ~0.68 with box 0
        [50, 50, 60, 60],
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms(boxes, scores, iou_thresh=0.5)
    assert keep.tolist() == [0, 2]
    keep = nms(boxes, scores, iou_thresh=0.9)
    assert keep.tolist() == [0, 1, 2]
    assert nms(np.zeros((0, 4)), np.zeros(0), 0.5).size == 0


def test_batched_mask_to_box():
    masks = np.zeros((3, 8, 10), bool)
    masks[0, 2:5, 3:7] = True
    masks[1, 0, 0] = True
    boxes = np.asarray(batched_mask_to_box(jnp.asarray(masks)))
    np.testing.assert_array_equal(boxes[0], [3, 2, 7, 5])
    np.testing.assert_array_equal(boxes[1], [0, 0, 1, 1])
    np.testing.assert_array_equal(boxes[2], [0, 0, 0, 0])  # empty


def test_stability_score():
    logits = jnp.asarray(np.full((1, 4, 4), 10.0))  # far above threshold
    s = calculate_stability_score(logits, 0.0, 1.0)
    assert float(s[0]) == pytest.approx(1.0)
    # Logits straddling the offset band are unstable.
    logits = jnp.asarray(np.linspace(-0.5, 0.5, 16).reshape(1, 4, 4))
    s = calculate_stability_score(logits, 0.0, 0.4)
    assert float(s[0]) < 0.5


def _tiny_sam():
    cls, cfg = model_entrypoint("sam_vit_b")
    cfg = dataclasses.replace(
        cfg, input_size=(64, 64), encoder_embed_dim=16, encoder_nb_blocks=2,
        encoder_nb_heads=2, embed_dim=8, encoder_global_attn_indices=(1,),
        encoder_window_size=2, prompt_mask_hidden_dim=4, decoder_nb_blocks=2,
        decoder_nb_heads=2, decoder_mlp_channels=16, decoder_iou_hidden_dim=8,
    )
    model = cls(cfg)
    model.init(0)
    return model


def test_generate_end_to_end():
    """Untrained tiny SAM with permissive thresholds: records are well-formed,
    boxes bound their segmentations, areas match RLE."""
    model = _tiny_sam()
    gen = SAMAutomaticMaskGenerator(
        model, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=0.0, stability_score_thresh=0.0, box_nms_thresh=0.9,
    )
    img = np.random.default_rng(0).integers(0, 255, (48, 40, 3)).astype(np.uint8)
    records = gen.generate(img)
    assert len(records) > 0
    for rec in records:
        seg = rec["segmentation"]
        assert seg.shape == (48, 40) and seg.dtype == bool
        assert rec["area"] == int(seg.sum())
        x, y, w, h = rec["bbox"]
        assert 0 <= x <= 40 and 0 <= y <= 48
        if seg.any():
            ys, xs = np.nonzero(seg)
            assert x == xs.min() and y == ys.min()
            assert w == xs.max() + 1 - xs.min() and h == ys.max() + 1 - ys.min()
        assert 0.0 <= rec["stability_score"] <= 1.0
        assert rec["crop_box"] == [0.0, 0.0, 40.0, 48.0]
        (px, py), = rec["point_coords"]
        assert 0 <= px <= 40 and 0 <= py <= 48


def test_generate_with_crops_and_rle_output():
    model = _tiny_sam()
    gen = SAMAutomaticMaskGenerator(
        model, points_per_side=2, points_per_batch=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
        crop_n_layers=1, output_mode="uncompressed_rle",
    )
    img = np.random.default_rng(1).integers(0, 255, (40, 40, 3)).astype(np.uint8)
    records = gen.generate(img)
    assert len(records) > 0
    crop_boxes = {tuple(r["crop_box"]) for r in records}
    for rec in records:
        assert rec["segmentation"]["size"] == [40, 40]
        assert rec["area"] == area_from_rle(rec["segmentation"])
    # Full-image crop always present; sub-crops may or may not survive NMS.
    assert (0.0, 0.0, 40.0, 40.0) in crop_boxes


def test_generate_filters_by_iou_threshold():
    model = _tiny_sam()
    img = np.random.default_rng(2).integers(0, 255, (32, 32, 3)).astype(np.uint8)
    permissive = SAMAutomaticMaskGenerator(
        model, points_per_side=2, points_per_batch=4,
        pred_iou_thresh=0.0, stability_score_thresh=0.0)
    strict = SAMAutomaticMaskGenerator(
        model, points_per_side=2, points_per_batch=4,
        pred_iou_thresh=1.0, stability_score_thresh=0.999999)
    assert len(strict.generate(img)) <= len(permissive.generate(img))
