"""Anti-aliased blur pooling (reference: tfimm/layers/blurpool.py:5-66)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["BlurPool2d", "avg_pool_2d", "adaptive_avg_pool_2d", "max_pool_2d"]


class BlurPool2d:
    """Fixed binomial blur kernel as a depthwise conv with REFLECT padding,
    then stride-2 downsampling. The kernel is a constant, not a parameter."""

    def __init__(self, channels: int, filter_size: int = 3, stride: int = 2):
        self.channels = channels
        self.filter_size = filter_size
        self.stride = stride
        coeffs = np.poly1d((0.5, 0.5)) ** (filter_size - 1)
        blur_1d = np.asarray(coeffs.coeffs, dtype=np.float32)
        blur_2d = np.outer(blur_1d, blur_1d)
        kernel = np.tile(blur_2d[:, :, None, None], (1, 1, 1, channels))
        self._kernel = jnp.asarray(kernel)
        self.pad = [(filter_size - 1) // 2, (filter_size - 1) // 2 + (filter_size - 1) % 2]

    def init(self, rng):
        return {}

    def __call__(self, p, x):
        pad = self.pad
        x = jnp.pad(x, ((0, 0), (pad[0], pad[1]), (pad[0], pad[1]), (0, 0)),
                    mode="reflect")
        return jax.lax.conv_general_dilated(
            x, self._kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding="VALID",
            feature_group_count=self.channels,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def avg_pool_2d(x, window, stride=None, padding="VALID"):
    stride = stride or window
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), padding
    )
    return summed / (window * window)


def avg_pool_2d_exclude_pad(x, window, stride=1):
    """SAME avg pool that excludes padding from the divisor (PyTorch
    count_include_pad=False / Keras 'same' semantics)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        "SAME",
    )
    ones = jnp.ones(x.shape[:3] + (1,), dtype=x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        "SAME",
    )
    return summed / counts


def adaptive_avg_pool_2d(x, output_size):
    """PyTorch nn.AdaptiveAvgPool2d semantics for NHWC inputs.

    Output bin ``i`` averages input rows ``[floor(i*H/out), ceil((i+1)*H/out))``
    (and likewise for columns), so bins may overlap / have unequal sizes when
    the input is not divisible. Implemented as two small matmuls with
    numpy-precomputed pooling matrices (shapes are static under jit; the
    matmuls map onto the MXU, unlike a gather-based formulation).
    """
    out_h, out_w = ((output_size, output_size)
                    if isinstance(output_size, int) else output_size)
    _, h, w, _ = x.shape

    def pool_matrix(n_in, n_out):
        m = np.zeros((n_out, n_in), dtype=np.float32)
        for i in range(n_out):
            start = (i * n_in) // n_out
            end = -(-((i + 1) * n_in) // n_out)  # ceil
            m[i, start:end] = 1.0 / (end - start)
        return m

    ph = jnp.asarray(pool_matrix(h, out_h), x.dtype)
    pw = jnp.asarray(pool_matrix(w, out_w), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", ph, x)
    return jnp.einsum("pw,bowc->bopc", pw, x)


def max_pool_2d(x, window, stride=None, padding="VALID"):
    stride = stride or window
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        padding,
    )
