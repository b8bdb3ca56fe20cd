"""Motion compensation (warping) with selectable interpolation filters.

A gather-based separable interpolation: the integer part of the flow
relocates each pixel's tap window (indices clamped to the border, matching
grid_sample(padding_mode="border", align_corners=True)); the fractional part
selects per-pixel filter coefficients:

  - filter_size 2: bilinear (coeffs (1-s, s))
  - filter_size 4: bicubic, a = -0.75 (torch grid_sample polynomial)
  - filter_size >= 6: cos-windowed sinc ("Efficient Sub-pixel Motion
    Compensation in Learned Video Codecs", eq. 6)

At eval time flows are quantized to 1/64 pixel (fractional_accuracy).
Reference parity: coolchic/component/intercoding/warp.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

FRACTIONAL_ACCURACY = 64


def _coeffs(s: jnp.ndarray, filter_size: int) -> jnp.ndarray:
    """s: [..., 1] fractional offsets in [0, 1) -> [..., filter_size] taps."""
    lo = -(filter_size // 2) + 1
    hi = filter_size // 2
    kappa = jnp.arange(lo, hi + 1, dtype=jnp.float32)
    if filter_size == 2:
        return jnp.concatenate([1.0 - s, s], axis=-1)
    if filter_size == 4:
        a = -0.75
        b = jnp.array([
            [0, a, -2 * a, a],
            [1, 0, -(a + 3), a + 2],
            [0, -a, (2 * a + 3), -(a + 2)],
            [0, 0, a, -a],
        ], dtype=jnp.float32)
        s_pow = jnp.concatenate([s**e for e in range(4)], axis=-1)
        return s_pow @ b.T
    window = jnp.cos(jnp.pi * (s - kappa) / filter_size)
    return window * jnp.sinc(s - kappa)


@lru_cache(maxsize=16)
def _warp_jit(filter_size: int, training: bool):
    @jax.jit
    def fn(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        _, _, h, w = x.shape
        if not training:
            q_flow = jnp.round(flow * FRACTIONAL_ACCURACY) / FRACTIONAL_ACCURACY
        else:
            q_flow = flow
        rounded = jnp.floor(q_flow)
        frac = q_flow - rounded  # [1, 2, H, W]

        jj = jnp.arange(w, dtype=jnp.float32)[None, :]
        ii = jnp.arange(h, dtype=jnp.float32)[:, None]
        base_x = jj + rounded[0, 0]  # [H, W]
        base_y = ii + rounded[0, 1]

        lo = -(filter_size // 2) + 1
        taps = jnp.arange(lo, filter_size // 2 + 1, dtype=jnp.float32)

        # Tap indices, clamped to borders (grid_sample "border" semantics).
        ix = jnp.clip(base_x[None] + taps[:, None, None], 0, w - 1).astype(jnp.int32)  # [k,H,W]
        iy = jnp.clip(base_y[None] + taps[:, None, None], 0, h - 1).astype(jnp.int32)
        # neighbors[c, a, b, i, j] = x[c, iy[a, i, j], ix[b, i, j]]
        neighbors = x[0][:, iy[:, None, :, :], ix[None, :, :, :]]  # [C, k, k, H, W]

        cx = jnp.moveaxis(_coeffs(frac[0, 0][..., None], filter_size), -1, 0)  # [k, H, W]
        cy = jnp.moveaxis(_coeffs(frac[0, 1][..., None], filter_size), -1, 0)

        # interpolate along the x taps (b) with the x fraction, then y taps.
        lines = jnp.einsum("cabhw,bhw->cahw", neighbors, cx)
        out = jnp.einsum("cahw,ahw->chw", lines, cy)
        return out[None]

    return fn


def warp_fn(x, flow, filter_size: int, training: bool = False):
    """Warp [1, C, H, W] by flow [1, 2, H, W] (pixels; ch 0 = horizontal)."""
    res = _warp_jit(int(filter_size), bool(training))(jnp.asarray(x, jnp.float32),
                                                      jnp.asarray(flow, jnp.float32))
    return res if isinstance(x, jnp.ndarray) else np.asarray(res)


def nearest_warp(x, flow):
    """Nearest-neighbor warp with border clamping (global translation path).

    Matches vanilla_warp_fn(mode="nearest"): grid_sample nearest rounds the
    sampling coordinate to the nearest pixel, then clamps to the border.
    """
    x = np.asarray(x)
    flow = np.asarray(flow)
    _, _, h, w = x.shape
    jj = np.arange(w)[None, :] + flow[0, 0]
    ii = np.arange(h)[:, None] + flow[0, 1]
    ix = np.clip(np.round(jj).astype(np.int64), 0, w - 1)
    iy = np.clip(np.round(ii).astype(np.int64), 0, h - 1)
    return x[:, :, iy, ix]


def apply_global_translation(reference_frames: list, global_flows: list) -> list:
    """Shift each reference by its constant global flow (nearest warp)."""
    out = []
    for ref, gflow in zip(reference_frames, global_flows):
        h, w = np.asarray(ref).shape[-2:]
        flow = np.broadcast_to(np.asarray(gflow, dtype=np.float32).reshape(1, 2, 1, 1),
                               (1, 2, h, w))
        out.append(nearest_warp(ref, flow))
    return out
