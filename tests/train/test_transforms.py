"""On-device augmentation tests (mixup/cutmix/flip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tfimm_tpu import create_model
from tfimm_tpu.parallel import make_train_step
from tfimm_tpu.train.transforms import Mixup, random_flip_horizontal, smooth_one_hot

from tests.models.architectures import TEST_ARCHITECTURES  # noqa: F401


def _batch(b=8, h=16, w=16, c=3, nb_classes=10, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(rng.uniform(size=(b, h, w, c)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, nb_classes, size=(b,)))
    return images, labels


def test_smooth_one_hot():
    y = smooth_one_hot(jnp.asarray([1, 3]), 4, label_smoothing=0.1)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-6)
    assert float(y[0, 1]) == pytest.approx(0.925)
    assert float(y[0, 0]) == pytest.approx(0.025)


def test_random_flip_horizontal():
    images, _ = _batch()
    out = random_flip_horizontal(jax.random.PRNGKey(0), images)
    a, b = np.asarray(images), np.asarray(out)
    # Every sample is either identical or exactly the horizontal flip.
    for i in range(a.shape[0]):
        assert np.array_equal(b[i], a[i]) or np.array_equal(b[i], a[i, :, ::-1])
    # With 8 samples the odds of all-same are 2^-8; check both occur over keys.
    outs = [np.asarray(random_flip_horizontal(jax.random.PRNGKey(k), images))
            for k in range(4)]
    assert any(not np.array_equal(o, a) for o in outs)


def test_mixup_disabled_prob_zero_is_identity():
    images, labels = _batch()
    mix = Mixup(nb_classes=10, prob=0.0)
    out, soft = mix(jax.random.PRNGKey(0), images, labels)
    np.testing.assert_allclose(np.asarray(out), np.asarray(images), atol=1e-6)
    np.testing.assert_allclose(np.asarray(soft),
                               np.asarray(smooth_one_hot(labels, 10)), atol=1e-6)


def test_mixup_only_convex_combination():
    images, labels = _batch()
    mix = Mixup(nb_classes=10, mixup_alpha=0.8, cutmix_alpha=0.0)
    out, soft = mix(jax.random.PRNGKey(1), images, labels)
    a = np.asarray(images)
    o = np.asarray(out)
    flipped = a[::-1]
    # out = lam*a + (1-lam)*flipped for a single lam: recover lam from one
    # pixel and check globally.
    diff = a - flipped
    idx = np.unravel_index(np.abs(diff).argmax(), diff.shape)
    lam = (o[idx] - flipped[idx]) / diff[idx]
    assert 0.0 <= lam <= 1.0
    np.testing.assert_allclose(o, lam * a + (1 - lam) * flipped, atol=1e-5)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)


def test_cutmix_only_pixels_from_either_source():
    images, labels = _batch(seed=3)
    mix = Mixup(nb_classes=10, mixup_alpha=0.0, cutmix_alpha=1.0)
    # Find a key where the box is non-degenerate.
    for k in range(8):
        out, soft = mix(jax.random.PRNGKey(k), images, labels)
        a, o = np.asarray(images), np.asarray(out)
        flipped = a[::-1]
        from_a = np.isclose(o, a, atol=1e-6)
        from_b = np.isclose(o, flipped, atol=1e-6)
        assert np.all(from_a | from_b), "cutmix must copy pixels, not blend"
        # Label weight equals the uncut fraction exactly.
        box = ~np.isclose(o, a, atol=1e-6).all(axis=3).all(axis=0)
        frac = box.mean()
        if 0.0 < frac < 1.0:
            soft_np = np.asarray(soft)
            i = int(np.asarray(labels)[0])
            j = int(np.asarray(labels)[-1])
            if i != j:
                assert soft_np[0, i] == pytest.approx(1 - frac, abs=1e-4)
                assert soft_np[0, j] == pytest.approx(frac, abs=1e-4)
            return
    pytest.skip("all sampled boxes degenerate (unlikely)")


def test_mixup_in_train_step_soft_labels():
    """Soft labels flow through make_train_step's default loss + accuracy."""
    model = create_model("vit_test_model")
    tx = optax.sgd(0.01)
    step = make_train_step(model, tx)
    images, labels = _batch(b=4, h=32, w=32, nb_classes=1000, seed=5)
    mix = Mixup(nb_classes=1000, label_smoothing=0.1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    images, soft = mix(k1, images, labels)
    params, _, metrics = step(model.params, tx.init(model.params),
                              (images, soft), k2)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0


def test_mixup_jittable():
    images, labels = _batch()
    mix = Mixup(nb_classes=10)
    out, soft = jax.jit(mix)(jax.random.PRNGKey(7), images, labels)
    assert out.shape == images.shape and soft.shape == (8, 10)


def test_image_folder_dataset(tmp_path):
    """Class-per-subdir folder decoded through the native pipeline."""
    from PIL import Image
    from tfimm_tpu.train.datasets import ImageFolderConfig, ImageFolderDataset

    rng = np.random.default_rng(0)
    for ci, cname in enumerate(["ants", "bees"]):
        d = tmp_path / cname
        d.mkdir()
        for i in range(5):
            img = rng.integers(0, 255, (40 + i, 50, 3)).astype(np.uint8)
            fmt = "JPEG" if i % 2 == 0 else "PNG"
            Image.fromarray(img).save(
                d / f"img{i}.{'jpg' if fmt == 'JPEG' else 'png'}", format=fmt)

    cfg = ImageFolderConfig(path=str(tmp_path), batch_size=4,
                            input_size=(32, 32), seed=1)
    ds = ImageFolderDataset(cfg)
    assert ds.classes == ["ants", "bees"]
    assert len(ds) == 2  # 10 images // 4
    seen_labels = []
    for images, labels in ds:
        assert images.shape == (4, 32, 32, 3) and images.dtype == np.uint8
        assert labels.shape == (4,)
        seen_labels.extend(labels.tolist())
    assert set(seen_labels) <= {0, 1} and len(seen_labels) == 8
    # Deterministic under the same seed.
    ds2 = ImageFolderDataset(ImageFolderConfig(
        path=str(tmp_path), batch_size=4, input_size=(32, 32), seed=1))
    first1 = next(iter(ImageFolderDataset(ImageFolderConfig(
        path=str(tmp_path), batch_size=4, input_size=(32, 32), seed=1))))
    first2 = next(iter(ds2))
    np.testing.assert_array_equal(first1[0], first2[0])
    np.testing.assert_array_equal(first1[1], first2[1])
