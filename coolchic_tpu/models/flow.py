"""Dense optical-flow estimation for guided motion pretraining.

The reference uses torchvision's pretrained RAFT purely as an encoder-side
guidance signal (coolchic/component/intercoding/raft.py) -- the flow never
reaches the bitstream, it only initializes the motion decoder's training.
This module provides a self-contained, deterministic pyramidal
Lucas-Kanade estimator (no pretrained weights needed, jit-friendly) filling
the same role; any better estimator can be plugged in through
`estimate_flow`'s signature.

Flow convention matches the codec's warper: warp(ref, flow)[i, j] =
ref[i + flow_y, j + flow_x] -- i.e. the flow maps the current frame's pixels
to their source location in the reference.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.models.warp import warp_fn


def _to_gray(x: jnp.ndarray) -> jnp.ndarray:
    """[1, C, H, W] -> [1, 1, H, W] luminance."""
    if x.shape[1] == 3:
        w = jnp.array([0.2126, 0.7152, 0.0722], dtype=jnp.float32).reshape(1, 3, 1, 1)
        return (x * w).sum(axis=1, keepdims=True)
    return x.mean(axis=1, keepdims=True)


def _down2(x: jnp.ndarray) -> jnp.ndarray:
    b, c, h, w = x.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    x = x[:, :, :h2, :w2]
    return x.reshape(b, c, h2 // 2, 2, w2 // 2, 2).mean(axis=(3, 5))


def _box(x: jnp.ndarray, k: int = 7) -> jnp.ndarray:
    """Separable box filter (same padding)."""
    pad = k // 2
    ky = jnp.ones((1, 1, k, 1), dtype=jnp.float32)
    kx = jnp.ones((1, 1, 1, k), dtype=jnp.float32)
    dims = ("NCHW", "OIHW", "NCHW")
    c = x.shape[1]
    x = x.reshape(-1, 1, *x.shape[-2:])
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), [(pad, pad), (0, 0)],
                                     dimension_numbers=dims)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (pad, pad)],
                                     dimension_numbers=dims)
    return x.reshape(-1, c, *x.shape[-2:])


def _lk_refine(target: jnp.ndarray, ref: jnp.ndarray, flow: jnp.ndarray,
               n_iters: int) -> jnp.ndarray:
    """Iterative dense LK at one pyramid level. target/ref: [1,1,H,W]."""
    def body(_, flow):
        warped = warp_fn(ref, flow, filter_size=2, training=True)
        ix = (jnp.roll(warped, -1, axis=-1) - jnp.roll(warped, 1, axis=-1)) * 0.5
        iy = (jnp.roll(warped, -1, axis=-2) - jnp.roll(warped, 1, axis=-2)) * 0.5
        it = warped - target
        ixx = _box(ix * ix)
        iyy = _box(iy * iy)
        ixy = _box(ix * iy)
        ixt = _box(ix * it)
        iyt = _box(iy * it)
        eps = 1e-4
        det = (ixx + eps) * (iyy + eps) - ixy * ixy
        du = -((iyy + eps) * ixt - ixy * iyt) / det
        dv = -((ixx + eps) * iyt - ixy * ixt) / det
        step = jnp.clip(jnp.concatenate([du, dv], axis=1), -2.0, 2.0)
        return flow + step

    return jax.lax.fori_loop(0, n_iters, body, flow)


@lru_cache(maxsize=8)
def _flow_fn(shape: tuple, n_levels: int, n_iters: int):
    @jax.jit
    def fn(target, ref):
        tg, rg = _to_gray(target), _to_gray(ref)
        tgs, rgs = [tg], [rg]
        for _ in range(n_levels - 1):
            tgs.append(_down2(tgs[-1]))
            rgs.append(_down2(rgs[-1]))

        h_c, w_c = tgs[-1].shape[-2:]
        flow = jnp.zeros((1, 2, h_c, w_c), dtype=jnp.float32)
        for lvl in range(n_levels - 1, -1, -1):
            if lvl != n_levels - 1:
                h_l, w_l = tgs[lvl].shape[-2:]
                flow = 2.0 * jax.image.resize(flow, (1, 2, h_l, w_l), "bilinear")
            flow = _lk_refine(tgs[lvl], rgs[lvl], flow, n_iters)
        return flow

    return fn


def estimate_flow(target, ref, n_levels: int | None = None, n_iters: int = 8):
    """Dense flow mapping `target` pixels to `ref` ([1, 2, H, W], pixels)."""
    target = jnp.asarray(target, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    h, w = target.shape[-2:]
    if n_levels is None:
        n_levels = max(int(np.log2(min(h, w))) - 4, 1)
    return _flow_fn(target.shape, n_levels, n_iters)(target, ref)
