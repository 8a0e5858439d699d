"""SAM tests (reference: tests/models/test_segment_anything.py): component
parity against independent PT implementations, tiny end-to-end model, and the
SAMPredictor in fixed and flexible input modes."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tfimm_tpu.models.registry import model_entrypoint  # noqa: E402
from tfimm_tpu.utils.tree import flatten_params, unflatten_params  # noqa: E402
import tfimm_tpu.architectures.segment_anything  # noqa: F401, E402


def _tiny_cfg(**kwargs):
    cls, cfg = model_entrypoint("sam_vit_b")
    cfg = dataclasses.replace(
        cfg, input_size=(64, 64), encoder_embed_dim=16, encoder_nb_blocks=2,
        encoder_nb_heads=2, embed_dim=8, encoder_global_attn_indices=(1,),
        encoder_window_size=2, prompt_mask_hidden_dim=4, decoder_nb_blocks=2,
        decoder_nb_heads=2, decoder_mlp_channels=16, decoder_iou_hidden_dim=8,
        **kwargs,
    )
    return cls, cfg


def _convert_subtree(jax_params, torch_module, transform=None):
    """Convert a torch module's state_dict into a params subtree by name."""
    sd = {k: v.detach().numpy() for k, v in torch_module.state_dict().items()}
    flat = flatten_params(jax_params)
    out = {}
    renames = {"kernel": "weight", "scale": "weight", "mean": "running_mean",
               "var": "running_var"}
    for path, val in flat.items():
        head, _, leaf = path.rpartition(".")
        pt_key = f"{head}.{renames.get(leaf, leaf)}" if head else renames.get(leaf, leaf)
        arr = sd[pt_key]
        if leaf == "kernel":
            arr = arr.transpose(1, 0) if arr.ndim == 2 else arr.transpose(2, 3, 1, 0)
        assert arr.shape == val.shape, (path, arr.shape, val.shape)
        out[path] = jnp.asarray(arr)
    return unflatten_params(out)


def test_rel_pos_attention_parity():
    from tests.torch_refs.sam_ref import RelPosAttention as TorchRPA
    from tfimm_tpu.architectures.segment_anything.image_encoder import (
        RelPosAttention,
    )

    torch.manual_seed(0)
    tm = TorchRPA(16, 2, (6, 7)).eval()
    jm = RelPosAttention(True, 16, 2, True, True, 0.0, 0.0, (6, 7))
    p = jm.init(jax.random.PRNGKey(0))
    p = _convert_subtree(p, tm)

    x = np.random.default_rng(0).normal(size=(2, 6, 7, 16)).astype("float32")
    with torch.no_grad():
        expected = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(jm(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_two_way_transformer_parity():
    from tests.torch_refs.sam_ref import TwoWayTransformer as TorchTWT
    from tfimm_tpu.architectures.segment_anything.transformer import (
        TwoWayTransformer,
    )

    torch.manual_seed(1)
    tm = TorchTWT(8, 2, 2, 16).eval()
    jm = TwoWayTransformer(8, 2, 2, 16, attention_downsample_rate=2,
                           act_layer="relu")
    p = jm.init(jax.random.PRNGKey(0))
    p = _convert_subtree(p, tm)

    rng = np.random.default_rng(1)
    point_emb = rng.normal(size=(2, 5, 8)).astype("float32")
    image_emb = rng.normal(size=(2, 4, 4, 8)).astype("float32")
    image_pe = rng.normal(size=(2, 4, 4, 8)).astype("float32")
    with torch.no_grad():
        tq, tk = tm(torch.from_numpy(point_emb), torch.from_numpy(image_emb),
                    torch.from_numpy(image_pe))
    q, k = jm(p, jnp.asarray(point_emb), jnp.asarray(image_emb),
              jnp.asarray(image_pe))
    np.testing.assert_allclose(np.asarray(q), tq.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k).reshape(2, 16, 8), tk.numpy(),
                               atol=1e-5)


def test_positional_embedding_random_parity():
    from tests.torch_refs.sam_ref import PositionalEmbeddingRandom as TorchPE
    from tfimm_tpu.architectures.segment_anything.prompt_encoder import (
        PositionalEmbeddingRandom,
    )

    torch.manual_seed(2)
    tm = TorchPE(16)
    jm = PositionalEmbeddingRandom(16)
    p = {"positional_encoding_gaussian_matrix": jnp.asarray(
        tm.positional_encoding_gaussian_matrix.numpy())}
    pts = np.random.default_rng(2).uniform(0, 64, size=(3, 4, 2)).astype("float32")
    with torch.no_grad():
        expected = tm.embed_points(torch.from_numpy(pts), (64, 48)).numpy()
    got = np.asarray(jm.embed_points(p, jnp.asarray(pts), (64, 48)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_sam_end_to_end_and_feature_names():
    cls, cfg = _tiny_cfg()
    model = cls(cfg)
    model.init(0)
    masks, scores, logits = model(model.dummy_inputs)
    assert masks.shape == (1, 1, 64, 64)
    assert masks.dtype == jnp.bool_
    assert logits.shape == (1, 1, 16, 16)
    masks, scores, logits = model(model.dummy_inputs, multimask_output=True)
    assert masks.shape == (1, 3, 64, 64)
    # features
    _, features = model(model.dummy_inputs, return_features=True)
    assert "neck" in features and "block_1" in features


@pytest.mark.parametrize("fixed", [True, False])
def test_sam_predictor(fixed):
    from tfimm_tpu.architectures.segment_anything import SAMPredictor

    cls, cfg = _tiny_cfg(fixed_input_size=fixed)
    model = cls(cfg)
    model.init(0)
    pred = SAMPredictor(model)
    img = np.random.default_rng(3).integers(0, 255, (40, 56, 3)).astype(np.uint8)
    pred.set_image(img)
    masks, scores, logits = pred(points=np.array([[10.0, 20.0]]),
                                 labels=np.array([1]))
    assert masks.shape == (3, 40, 56) and masks.dtype == bool
    assert scores.shape == (3,)
    # chained prediction with previous logits as mask prompt
    masks2, _, _ = pred(points=np.array([[10.0, 20.0]]), labels=np.array([1]),
                        masks=logits, multimask_output=False)
    assert masks2.shape == (1, 40, 56)
    # batched prompts
    masks3, scores3, _ = pred(boxes=np.array([[[2.0, 2.0, 30.0, 30.0]],
                                              [[5.0, 5.0, 20.0, 35.0]]]))
    assert masks3.shape == (2, 3, 40, 56)


def test_predictor_size_bucketing():
    """With size_bucket, images of nearby sizes share one padded input shape
    (one encoder jit specialization) and masks come back at each original
    resolution."""
    from tfimm_tpu.architectures.segment_anything import SAMPredictor

    cls, cfg = _tiny_cfg(fixed_input_size=False)
    model = cls(cfg)
    model.init(0)
    pred = SAMPredictor(model, size_bucket=32)
    rng = np.random.default_rng(11)

    dsts = []
    for size in [(33, 50), (40, 56), (62, 34)]:
        img = rng.integers(0, 255, (*size, 3)).astype(np.uint8)
        pred.set_image(img)
        dsts.append(pred.resizer.dst_size)
        masks, scores, _ = pred(points=np.array([[10.0, 12.0]]),
                                labels=np.array([1]))
        assert masks.shape == (3, *size)
    assert dsts == [(64, 64), (64, 64), (64, 64)]

    with pytest.raises(ValueError):
        SAMPredictor(model, size_bucket=17)  # not a patch-size multiple
