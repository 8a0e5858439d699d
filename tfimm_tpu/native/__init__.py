"""Native (C++) input-pipeline components.

The reference's input pipeline delegates JPEG decode and resize to
TensorFlow's C++ kernels inside tf.data; this package is the framework-native
equivalent: a libjpeg/libpng decoder library (image_io.cpp) with a fused
DCT-scaled decode+resize path, compiled on first use with g++ and called
through ctypes. ctypes foreign calls release the GIL, so ``ParallelDecoder``
gets real multi-core decode throughput from an ordinary thread pool — no
multiprocessing, no serialization of decoded arrays.

Everything here is optional: importing this module raises ``RuntimeError``
with a clear message if no C++ toolchain or libjpeg is available; nothing
else in tfimm_tpu depends on it.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterable, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "decode_jpeg",
    "decode_png",
    "decode_image",
    "encode_jpeg",
    "image_info",
    "resize_bilinear",
    "ParallelDecoder",
]

_SRC = Path(__file__).with_name("image_io.cpp")


def _cache_dir() -> Path:
    from tfimm_tpu.utils.cache import get_dir

    return Path(get_dir()) / "native"


_BUILD_FLAGS = [
    # -march=native enables the AVX2 gather path in the resize kernel and
    # vectorizes its blend loops for the local ISA; safe because the .so is
    # cached per machine (flags + host CPU are part of the cache key below).
    # Falls back to portable flags (scalar resize) if unsupported.
    "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
]
_PORTABLE_FLAGS = ["-O3", "-shared", "-fPIC", "-std=c++17"]


def _host_tag() -> str:
    """Host identifier for the build-cache key: -march=native binaries are
    ISA-specific, and a shared (e.g. NFS) cache dir can be mounted on hosts
    with different CPUs — a mismatched .so would SIGILL."""
    import platform

    cpu = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    cpu += line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return hashlib.sha256(cpu.encode()).hexdigest()[:8]


def _so_path(flags) -> Path:
    """Cache path keyed by source, the flags ACTUALLY used, and the host CPU
    (the portable fallback gets its own tag, not the native one)."""
    src = _SRC.read_bytes()
    key = src + " ".join(flags).encode() + _host_tag().encode()
    tag = hashlib.sha256(key).hexdigest()[:16]
    return _cache_dir() / f"libtfimm_image_io_{tag}.so"


def _build_library() -> Path:
    """Compile image_io.cpp into the cache dir, keyed by source+flags+host."""
    for flags, is_fallback in ((_BUILD_FLAGS, False), (_PORTABLE_FLAGS, True)):
        out = _so_path(flags)
        if out.exists():
            return out
        out.parent.mkdir(parents=True, exist_ok=True)
        cmd = ["g++", *flags, str(_SRC), "-o", str(out), "-ljpeg", "-lpng"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
            return out
        except FileNotFoundError:
            raise RuntimeError(
                "tfimm_tpu.native needs a C++ toolchain (g++) to build the "
                "image decoder; install one or use a Python-side decoder."
            )
        except subprocess.CalledProcessError as e:
            # -march=native can be unsupported (exotic toolchains); the loop
            # retries with portable flags under the portable cache tag.
            if is_fallback:
                raise RuntimeError(
                    f"Failed to build native image decoder:\n{e.stderr}"
                )
    raise AssertionError("unreachable")


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build_library()))
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        intp = ctypes.POINTER(ctypes.c_int)
        lib.tfimm_jpeg_info.argtypes = [u8p, ctypes.c_size_t, intp, intp, intp]
        lib.tfimm_decode_jpeg.argtypes = [u8p, ctypes.c_size_t, u8p,
                                          ctypes.c_int, ctypes.c_int]
        lib.tfimm_decode_jpeg_resize.argtypes = [u8p, ctypes.c_size_t, u8p,
                                                 ctypes.c_int, ctypes.c_int]
        lib.tfimm_resize_bilinear_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.tfimm_resize_bilinear_u8.restype = None
        lib.tfimm_encode_jpeg.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_ulong)]
        lib.tfimm_png_info.argtypes = [u8p, ctypes.c_size_t, intp, intp]
        lib.tfimm_decode_png.argtypes = [u8p, ctypes.c_size_t, u8p,
                                         ctypes.c_int, ctypes.c_int]
        lib.tfimm_free.argtypes = [ctypes.c_void_p]
        lib.tfimm_free.restype = None
        _lib = lib
    return _lib


def _as_u8p(data: bytes):
    return (ctypes.c_ubyte * len(data)).from_buffer_copy(data)


def _is_png(data: bytes) -> bool:
    return data[:8] == b"\x89PNG\r\n\x1a\n"


def image_info(data: bytes) -> Tuple[int, int]:
    """(height, width) of a JPEG or PNG byte string without full decode."""
    lib = _get_lib()
    buf = _as_u8p(data)
    h, w = ctypes.c_int(), ctypes.c_int()
    if _is_png(data):
        rc = lib.tfimm_png_info(buf, len(data), ctypes.byref(h),
                                ctypes.byref(w))
    else:
        c = ctypes.c_int()
        rc = lib.tfimm_jpeg_info(buf, len(data), ctypes.byref(h),
                                 ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise ValueError("Malformed image data")
    return h.value, w.value


def decode_jpeg(data: bytes,
                size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """JPEG bytes -> (H, W, 3) uint8 RGB. With ``size=(h, w)`` the decode is
    fused with the resize: libjpeg's DCT scaling does the coarse reduction
    during entropy decode, then one bilinear pass lands on the target."""
    lib = _get_lib()
    buf = _as_u8p(data)
    if size is not None:
        out = np.empty((*size, 3), np.uint8)
        rc = lib.tfimm_decode_jpeg_resize(
            buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            size[0], size[1])
    else:
        h, w = image_info(data)
        out = np.empty((h, w, 3), np.uint8)
        rc = lib.tfimm_decode_jpeg(
            buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            h, w)
    if rc != 0:
        raise ValueError("Malformed JPEG data")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB (palette/gray/alpha/16-bit inputs are
    normalised)."""
    lib = _get_lib()
    buf = _as_u8p(data)
    h, w = image_info(data)
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.tfimm_decode_png(
        buf, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w)
    if rc != 0:
        raise ValueError("Malformed PNG data")
    return out


def decode_image(data: bytes,
                 size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Decode JPEG or PNG (sniffed from magic bytes) to (H, W, 3) uint8."""
    if _is_png(data):
        img = decode_png(data)
        return resize_bilinear(img, size) if size is not None else img
    return decode_jpeg(data, size=size)


def resize_bilinear(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """(H, W, C) uint8 -> (h, w, C) uint8, bilinear with half-pixel centres."""
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    out = np.empty((*size, c), np.uint8)
    _get_lib().tfimm_resize_bilinear_u8(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        size[0], size[1], c)
    return out


def encode_jpeg(image: np.ndarray, quality: int = 95) -> bytes:
    """(H, W, 3) uint8 RGB -> JPEG bytes."""
    image = np.ascontiguousarray(image, np.uint8)
    h, w, c = image.shape
    if c != 3:
        raise ValueError("encode_jpeg expects RGB (H, W, 3)")
    lib = _get_lib()
    out = ctypes.c_void_p()
    out_len = ctypes.c_ulong()
    rc = lib.tfimm_encode_jpeg(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w,
        int(quality), ctypes.byref(out), ctypes.byref(out_len))
    try:
        if rc != 0:
            raise ValueError("JPEG encoding failed")
        return ctypes.string_at(out, out_len.value)
    finally:
        lib.tfimm_free(out)


class ParallelDecoder:
    """Thread-pool image decoder. The C calls release the GIL, so N threads
    decode on N cores; a batch of decoded-and-resized images comes back as a
    single (B, H, W, 3) uint8 array ready for ``create_preprocessing``."""

    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 num_threads: int = 8):
        _get_lib()  # fail fast if the toolchain is missing
        self.size = size
        self.pool = ThreadPoolExecutor(max_workers=num_threads)

    def decode(self, blobs: Sequence[bytes]) -> np.ndarray:
        images = list(self.pool.map(
            lambda b: decode_image(b, size=self.size), blobs))
        if self.size is not None:
            return np.stack(images)
        return images  # type: ignore[return-value]

    def __call__(self, blobs: Iterable[bytes]):
        return self.decode(list(blobs))

    def close(self):
        self.pool.shutdown()
