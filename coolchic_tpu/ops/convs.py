"""Thin conv wrappers with the exact padding semantics the codec needs.

All arrays are NCHW; kernels are OIHW (torch layout, which keeps parameter
interchange with the bitstream trivial). XLA picks the efficient internal
layout for TPU itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DIMS = ("NCHW", "OIHW", "NCHW")


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
           padding: int = 0) -> jnp.ndarray:
    """Plain cross-correlation (torch F.conv2d) with symmetric zero padding."""
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.reshape(1, -1, 1, 1)
    return y


def conv2d_replicate(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
                     padding: int = 0) -> jnp.ndarray:
    """torch F.conv2d on an edge-replicated input (Cool-Chic synthesis convs,
    reference coolchic/component/core/synthesis.py:70)."""
    if padding > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)), mode="edge")
    return conv2d(x, kernel, bias, padding=0)


def conv_transpose2d_stride2(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """torch F.conv_transpose2d(x, k, stride=2, padding=0) for OIHW kernels.

    Implemented as lhs-dilated correlation with the spatially flipped kernel,
    which is the definition of the transposed convolution. Cool-Chic only uses
    symmetric kernels here, but we flip anyway for exact torch semantics.
    """
    k = kernel.shape[-1]
    flipped = jnp.flip(kernel, axis=(-2, -1))
    # conv_transpose(x, k, stride=s, padding=0) == conv(dilate(x, s), flip(k),
    # padding=k-1) for the torch (IOHW "gradient") convention; with OIHW single
    # channel in/out this transpose of in/out channels is a no-op.
    return jax.lax.conv_general_dilated(
        x, jnp.swapaxes(flipped, 0, 1),
        window_strides=(1, 1),
        padding=[(k - 1, k - 1), (k - 1, k - 1)],
        lhs_dilation=(2, 2),
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.float32,
    )


def replicate_pad(x: jnp.ndarray, pad: tuple[int, int, int, int]) -> jnp.ndarray:
    """torch F.pad(x, (left, right, top, bottom), mode='replicate')."""
    left, right, top, bottom = pad
    return jnp.pad(x, ((0, 0), (0, 0), (top, bottom), (left, right)), mode="edge")
