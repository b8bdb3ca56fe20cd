"""Rate-distortion loss: L = sum_d w_d * D_d + lambda * (R_latent + R_nn) / n_pixels.

Distortions: MSE (YUV420 weighted (4*Y + U + V) / 6) and Wasserstein (see
train/wasserstein.py). Out-of-[0,1] targets (flow pretraining) are
renormalized on the fly.

Reference parity: coolchic/training/loss.py.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Union

import jax.numpy as jnp


def dist_to_db(dist) -> float:
    """-10 log10(dist), floored at 100 dB (reference metrics/mse.py)."""
    import math

    if dist <= 0:
        return 100.0
    return min(-10.0 * math.log10(dist), 100.0)


def mse_fn(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(x - y))


def compute_mse(x, y) -> jnp.ndarray:
    """MSE; dicts (yuv420) are weighted by per-channel pixel counts."""
    if not isinstance(x, dict):
        return mse_fn(x, y)
    total = 0.0
    mse = 0.0
    for k in ("y", "u", "v"):
        n = x[k].size
        mse = mse + mse_fn(x[k], y[k]) * n
        total += n
    return mse / total


class LossOutput(NamedTuple):
    loss: jnp.ndarray
    dist: jnp.ndarray
    rate_bpp: jnp.ndarray
    total_rate_latent_bpp: jnp.ndarray
    mse: jnp.ndarray


def loss_function(decoded_image, rate_latent_bit: Dict[str, jnp.ndarray], target_image,
                  dist_weight: Dict[str, float], lmbda: float,
                  total_rate_nn_bit: float = 0.0,
                  wasserstein_fn=None) -> LossOutput:
    if not isinstance(target_image, dict):
        # Renormalize out-of-range targets (e.g. raw flow pretraining targets).
        out_of_range = jnp.abs(target_image).max() > 1.0
        t_min = jnp.where(out_of_range, target_image.min(), 0.0)
        t_max = jnp.where(out_of_range, target_image.max(), 1.0)
        rng = t_max - t_min
        decoded_image = (decoded_image - t_min) / rng
        target_image = (target_image - t_min) / rng

    dist = 0.0
    mse = None
    for name, w in dist_weight.items():
        if name == "mse":
            cur = compute_mse(decoded_image, target_image)
            mse = cur
        elif name == "wasserstein":
            if wasserstein_fn is None:
                raise ValueError("wasserstein distortion requested but no extractor given")
            cur = wasserstein_fn(decoded_image, target_image)
        else:
            raise ValueError(f"Unknown distortion {name}")
        dist = dist + w * cur
    if mse is None:
        mse = compute_mse(decoded_image, target_image)

    if isinstance(decoded_image, dict):
        n_pixels = decoded_image["y"].shape[-2] * decoded_image["y"].shape[-1]
    else:
        n_pixels = decoded_image.shape[-2] * decoded_image.shape[-1]

    total_latent_bit = sum(v.sum() for v in rate_latent_bit.values())
    rate_bpp = (total_latent_bit + total_rate_nn_bit) / n_pixels
    loss = dist + lmbda * rate_bpp
    return LossOutput(loss=loss, dist=dist, rate_bpp=rate_bpp,
                      total_rate_latent_bpp=total_latent_bit / n_pixels, mse=mse)
