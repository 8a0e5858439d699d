"""Native C++ image-IO tests (decoder built from tfimm_tpu/native/image_io.cpp;
PIL is the independent ground truth). Skipped when no C++ toolchain exists."""

import io
import shutil

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

if shutil.which("g++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

from tfimm_tpu.native import (  # noqa: E402
    ParallelDecoder,
    decode_image,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    image_info,
    resize_bilinear,
)


def _gradient(h=48, w=64):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([y * 3 % 256, x * 2 % 256, (x + y) % 256], -1).astype(np.uint8)


def _pil_jpeg(img, quality=95):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def _pil_png(img):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_jpeg_decode_matches_pil():
    img = _gradient()
    blob = _pil_jpeg(img)
    ours = decode_jpeg(blob)
    theirs = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    assert ours.shape == theirs.shape == (48, 64, 3)
    # Both decode the same DCT coefficients; IDCT rounding may differ by 1.
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


def test_jpeg_info_and_roundtrip():
    img = _gradient(33, 57)
    blob = encode_jpeg(img, quality=98)
    assert image_info(blob) == (33, 57)
    dec = decode_jpeg(blob)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 2.0


def test_fused_decode_resize_uses_dct_scaling():
    """Large image to small target: the fused path must agree with
    decode-full-then-resize within JPEG/bilinear tolerance."""
    img = _gradient(512, 640)
    blob = encode_jpeg(img, quality=95)
    fused = decode_jpeg(blob, size=(128, 160))
    full = resize_bilinear(decode_jpeg(blob), (128, 160))
    assert fused.shape == (128, 160, 3)
    # DCT-scaled decode is a different (higher-quality) downscale; allow a
    # loose tolerance but require clear agreement.
    assert np.abs(fused.astype(int) - full.astype(int)).mean() < 4.0


def test_png_decode_exact():
    img = _gradient(20, 30)
    assert np.array_equal(decode_png(_pil_png(img)), img)


def test_png_flavours_normalised():
    gray = _gradient(16, 16)[:, :, 0]
    blob = _pil_png(gray)  # 8-bit grayscale PNG
    out = decode_image(blob)
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out[:, :, 0], gray) and np.array_equal(
        out[:, :, 1], gray)
    rgba = np.concatenate([_gradient(16, 16),
                           np.full((16, 16, 1), 255, np.uint8)], -1)
    out = decode_image(_pil_png(rgba))
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out, rgba[:, :, :3])


def test_resize_bilinear_matches_jax():
    import jax
    import jax.numpy as jnp

    img = _gradient(32, 48)
    ours = resize_bilinear(img, (16, 20))
    theirs = jax.image.resize(jnp.asarray(img, jnp.float32), (16, 20, 3),
                              method="linear")
    theirs = np.asarray(jnp.clip(jnp.round(theirs), 0, 255)).astype(np.uint8)
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


def test_malformed_inputs_raise():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8 definitely not a jpeg")
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n garbage")
    with pytest.raises(ValueError):
        image_info(b"1234")
    # Truncated real JPEG
    blob = _pil_jpeg(_gradient())
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 4])


def test_parallel_decoder_batch():
    imgs = [_gradient(40 + i, 50 + i) for i in range(6)]
    blobs = [_pil_jpeg(im) for im in imgs[:3]] + [_pil_png(im) for im in imgs[3:]]
    dec = ParallelDecoder(size=(32, 32), num_threads=4)
    batch = dec.decode(blobs)
    assert batch.shape == (6, 32, 32, 3) and batch.dtype == np.uint8
    # PNG entries are exact resizes of their sources.
    ref = resize_bilinear(imgs[3], (32, 32))
    assert np.abs(batch[3].astype(int) - ref.astype(int)).max() <= 1
    dec.close()
    # Without a size, returns a list at native resolutions.
    dec = ParallelDecoder(num_threads=2)
    out = dec.decode(blobs[:2])
    assert isinstance(out, list) and out[0].shape == (40, 50, 3)
    dec.close()
