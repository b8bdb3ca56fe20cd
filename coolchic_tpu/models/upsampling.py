"""Learned pyramid upsampling with symmetric separable kernels.

Each x2 step applies (a) a transposed conv with an even symmetric separable
kernel to the accumulated coarse stack and (b) an odd symmetric separable
residual pre-filter to the higher-resolution grid before concatenation.
Kernels are parameterized by their half (symmetry is structural, so the
bitstream only carries (k+1)//2 taps per filter).

Reference parity: coolchic/component/core/upsampling.py:19-595. The "train
with a full 2-D kron kernel / eval with two 1-D passes" distinction is kept:
the 2-D variant has better-behaved gradients, the separable one is the
cheaper decode path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.ops.convs import conv2d, conv_transpose2d_stride2, replicate_pad
from coolchic_tpu.ops.resize import interpolate_x2

# Half of the symmetric bicubic x2 kernel used as the >=8 taps init
# (normative init constant, upsampling.py:266).
_BICUBIC_HALF = np.array([0.0351562, 0.1054687, -0.2617187, -0.8789063], dtype=np.float32)
_BILINEAR_HALF = np.array([0.25, 0.75], dtype=np.float32)


def half_param_size(target_k_size: int) -> int:
    return (target_k_size + 1) // 2


def symmetric_kernel_1d(half: jnp.ndarray, target_k_size: int) -> jnp.ndarray:
    """(a b c), k=5 -> (a b c b a); (a b c), k=6 -> (a b c c b a)."""
    reversed_ = jnp.flip(half)
    return jnp.concatenate([half, reversed_[target_k_size % 2:]])


def tconv_half_init(k_size: int) -> jnp.ndarray:
    assert k_size >= 4 and k_size % 2 == 0, f"ups kernel must be even >= 4, got {k_size}"
    core = _BILINEAR_HALF if k_size < 8 else _BICUBIC_HALF
    half = np.zeros((half_param_size(k_size),), dtype=np.float32)
    half[len(half) - len(core):] = core
    return jnp.asarray(half)


def preconcat_half_init(k_size: int) -> jnp.ndarray:
    assert k_size % 2 == 1, f"preconcat kernel must be odd, got {k_size}"
    half = np.zeros((half_param_size(k_size),), dtype=np.float32)
    half[-1] = 1.0  # Dirac after symmetrization
    return jnp.asarray(half)


def upsampling_init(ups_k_size: int, ups_preconcat_k_size: int, n_ups: int) -> dict:
    return {
        "tconv_half": [tconv_half_init(ups_k_size) for _ in range(n_ups)],
        "tconv_bias": [jnp.zeros((1,), dtype=jnp.float32) for _ in range(n_ups)],
        "conv_half": [preconcat_half_init(ups_preconcat_k_size) for _ in range(n_ups)],
        "conv_bias": [jnp.zeros((1,), dtype=jnp.float32) for _ in range(n_ups)],
    }


def _tconv_x2(x: jnp.ndarray, half: jnp.ndarray, k: int, training: bool) -> jnp.ndarray:
    """Upsample [B, 1, H, W] -> [B, 1, 2H, 2W] with the symmetric kernel."""
    w1d = symmetric_kernel_1d(half, k)
    p0 = k // 2
    crop = 2 * p0 - 1 + k // 2

    if training:
        k2d = jnp.outer(w1d, w1d).reshape(1, 1, k, k)
        x_pad = replicate_pad(x, (p0, p0, p0, p0))
        y = conv_transpose2d_stride2(x_pad, k2d)
        return y[:, :, crop:y.shape[2] - crop, crop:y.shape[3] - crop]

    # Eval: two separable 1-D passes (the decode-complexity path).
    x_pad = replicate_pad(x, (p0, p0, 0, 0))
    y = _tconv1d(x_pad, w1d, axis=3)
    y = y[:, :, :, crop:y.shape[3] - crop]
    y_pad = replicate_pad(y, (0, 0, p0, p0))
    y = _tconv1d(y_pad, w1d, axis=2)
    return y[:, :, crop:y.shape[2] - crop, :]


def _tconv1d(x: jnp.ndarray, w1d: jnp.ndarray, axis: int) -> jnp.ndarray:
    """1-D stride-2 transposed conv along H (axis=2) or W (axis=3)."""
    k = w1d.shape[0]
    if axis == 3:
        kernel = jnp.flip(w1d).reshape(1, 1, 1, k)
        pad = [(0, 0), (k - 1, k - 1)]
        dil = (1, 2)
    else:
        kernel = jnp.flip(w1d).reshape(1, 1, k, 1)
        pad = [(k - 1, k - 1), (0, 0)]
        dil = (2, 1)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=pad, lhs_dilation=dil,
        dimension_numbers=("NCHW", "OIHW", "NCHW"), preferred_element_type=jnp.float32,
    )


def _preconcat(x: jnp.ndarray, half: jnp.ndarray, k: int, training: bool) -> jnp.ndarray:
    """Residual symmetric filtering of [B, 1, H, W] (zero padding)."""
    if x.shape[1] == 0:
        return x
    w1d = symmetric_kernel_1d(half, k)
    pad = k // 2
    if training:
        k2d = jnp.outer(w1d, w1d).reshape(1, 1, k, k)
        return conv2d(x, k2d, padding=pad) + x
    yw = jax.lax.conv_general_dilated(
        x, w1d.reshape(1, 1, 1, k), (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), preferred_element_type=jnp.float32)
    yh = jax.lax.conv_general_dilated(
        yw, w1d.reshape(1, 1, k, 1), (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), preferred_element_type=jnp.float32)
    return yh + x


def upsampling_apply(params: dict, grids: list[jnp.ndarray], ups_k_size: int,
                     ups_preconcat_k_size: int, training: bool) -> jnp.ndarray:
    """Latent grids (largest first, each [H_i, W_i]) -> dense [C, H, W] stack.

    Output channel c corresponds to input grid c (reference ordering).
    """
    n_ups = len(params["tconv_half"])
    rev = list(reversed(grids))
    acc = rev[0][None, None]  # [1(batch=channels), 1, h, w]
    for idx, target in enumerate(rev[1:]):
        x = acc.reshape(-1, 1, acc.shape[-2], acc.shape[-1])
        x = _tconv_x2(x, params["tconv_half"][idx % n_ups], ups_k_size, training)
        x = x[:, :, : target.shape[-2], : target.shape[-1]]
        high = _preconcat(target[None, None], params["conv_half"][idx % n_ups],
                          ups_preconcat_k_size, training)
        acc = jnp.concatenate([high, x.reshape(1, -1, *x.shape[-2:])], axis=1)
    # acc: [1, C, H, W] with channel 0 = largest grid ... channel C-1 = smallest
    return acc[0]


def fixed_upsampling(grids: list[jnp.ndarray], mode: str = "bicubic"
                     ) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """Non-learned pyramid upsampling (reference upsampling.py:556-595).

    grids: largest first, each [H_i, W_i].
    Returns (dense [C, H, W] stack, intermediates) where intermediates[j] is
    the [j, h, w]-shaped stack of the j smallest grids at the resolution of
    the j-th smallest grid (intermediates[0] is a zeros placeholder).
    """
    rev = list(reversed(grids))
    acc = rev[0][None]  # [1, h, w]
    intermediates: list[jnp.ndarray] = [jnp.zeros_like(acc)]
    for target in rev[1:]:
        intermediates.append(acc)
        if acc.shape[-2:] != target.shape[-2:]:
            x = interpolate_x2(acc, mode)
            x = x[..., : target.shape[-2], : target.shape[-1]]
        else:
            x = acc
        acc = jnp.concatenate([target[None], x], axis=0)
    return acc, intermediates
