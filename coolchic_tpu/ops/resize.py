"""PyTorch-`F.interpolate`-compatible resizing, expressed as matrix products.

The Cool-Chic bitstream format pins the exact semantics of three resampling
modes (reference: torch.nn.functional.interpolate with align_corners=False):

  - ``nearest``  : used by the IFCE context path (integer, must be exact) and
                   as a final upsampling type for motion fields.
  - ``bicubic``  : used by the common-randomness path and the final
                   ``rescale_output`` (a = -0.75, Keys kernel).
  - ``bilinear`` : alternative final upsampling type.

On TPU we express the separable filters as two small dense matrices so the
whole resize is two matmuls (MXU-friendly), rather than a gather. Nearest
mode keeps a pure integer take() so the fixed-point decode path stays exact.

Reference parity: coolchic/component/core/coolchic.py:740-758 (rescale),
coolchic/component/core/upsampling.py:556-595 (fixed_upsampling),
coolchic/bitstream/component/coolchic.py:142-146 (IFCE x2 nearest).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_CUBIC_A = -0.75


def _cubic_w1(t: np.ndarray) -> np.ndarray:
    # |t| <= 1 branch of the Keys kernel.
    a = _CUBIC_A
    return ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0


def _cubic_w2(t: np.ndarray) -> np.ndarray:
    # 1 < |t| < 2 branch of the Keys kernel.
    a = _CUBIC_A
    return ((a * t - 5.0 * a) * t + 8.0 * a) * t - 4.0 * a


@lru_cache(maxsize=None)
def _resize_matrix_np(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """Dense [out_size, in_size] 1-D resampling matrix, float32."""
    w = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size

    if mode == "bilinear":
        for o in range(out_size):
            src = max((o + 0.5) * scale - 0.5, 0.0)
            i0 = int(np.floor(src))
            t = src - i0
            i0c = min(i0, in_size - 1)
            i1c = min(i0 + 1, in_size - 1)
            w[o, i0c] += 1.0 - t
            w[o, i1c] += t
    elif mode == "bicubic":
        for o in range(out_size):
            src = (o + 0.5) * scale - 0.5
            i0 = int(np.floor(src))
            t = src - i0
            coeffs = [_cubic_w2(t + 1.0), _cubic_w1(t), _cubic_w1(1.0 - t), _cubic_w2(2.0 - t)]
            for k, c in enumerate(coeffs):
                idx = min(max(i0 - 1 + k, 0), in_size - 1)
                w[o, idx] += c
    else:
        raise ValueError(f"Unknown separable resize mode {mode}")

    return w.astype(np.float32)


@lru_cache(maxsize=None)
def _nearest_index_np(in_size: int, out_size: int) -> np.ndarray:
    # torch 'nearest' (legacy): src = floor(dst * in / out)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def interpolate(x: jnp.ndarray, size: tuple[int, int], mode: str) -> jnp.ndarray:
    """Resize ``x`` ([..., H, W]) to ``size`` with torch-interpolate semantics.

    align_corners=False for bilinear/bicubic (the only variant Cool-Chic uses).
    """
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out) and mode != "bicubic":
        return x
    if mode == "nearest":
        if (h_out, w_out) == (2 * h_in, 2 * w_in):
            # Exact x2: repeat (cheap forward, reshape-sum backward) instead
            # of a gather (scatter backward).
            return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)
        iy = _nearest_index_np(h_in, h_out)
        ix = _nearest_index_np(w_in, w_out)
        return x[..., iy, :][..., :, ix]

    if (h_in, w_in) == (h_out, w_out):
        # bicubic at identical size is the identity (Keys kernel interpolates).
        return x

    wy = jnp.asarray(_resize_matrix_np(h_in, h_out, mode))
    wx = jnp.asarray(_resize_matrix_np(w_in, w_out, mode))
    # [..., H_in, W_in] -> [..., H_out, W_in] -> [..., H_out, W_out]
    y = jnp.einsum("oh,...hw->...ow", wy, x)
    y = jnp.einsum("ow,...hw->...ho", wx, y)
    return y


def interpolate_x2(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    """F.interpolate(scale_factor=2.0) semantics."""
    return interpolate(x, (2 * x.shape[-2], 2 * x.shape[-1]), mode)
