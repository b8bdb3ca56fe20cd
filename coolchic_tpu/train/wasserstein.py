"""Wasserstein distortion (texture-realism objective for --tune=wasserstein).

Pipeline (reference coolchic/training/metrics/wasserstein.py, after the
Google "codex" Wasserstein-distortion formulation):
  1. extract multi-layer CNN features of decoded and target images (the
     reference uses torchvision VGG16/ImageNet features after ReLUs 3, 8,
     15, 22, each reshaped to (C, 1, H, W));
  2. per feature array, build `num_levels` mean/variance pyramids with a 3x3
     binomial lowpass (stride-1 filter + stride-2 subsample);
  3. distortion = sum over levels of mean(weight * wd_map) with
     wd_map_0 = (fa - fb)^2, wd_map_i = (m_a - m_b)^2 + (sqrt(v_a) -
     sqrt(v_b))^2 and weight = relu(1 - |log2_sigma - i|), log2_sigma = 3.

Feature extractor is pluggable. Pretrained VGG16 weights can be supplied as
an .npz via COOLCHIC_VGG16_NPZ (keys features.{i}.weight / features.{i}.bias
in torchvision layout); without them a deterministic He-initialized VGG16
is used -- random CNN features are a known, weaker-but-workable perceptual
basis, and the rest of the objective (including the common-randomness
machinery) is identical.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.ops.convs import conv2d

# torchvision VGG16 "features" prefix: (out_channels, layer index of conv)
_VGG_CONVS = [
    (64, 0), (64, 2),            # relu at 1, 3
    ("pool", 4),
    (128, 5), (128, 7),          # relu at 6, 8
    ("pool", 9),
    (256, 10), (256, 12), (256, 14),  # relu 11, 13, 15
    ("pool", 16),
    (512, 17), (512, 19), (512, 21),  # relu 18, 20, 22
]
_DESIRED_RELU = (3, 8, 15, 22)
LOG2_SIGMA = 3
NUM_LEVELS = 5


def _he_init_weights(seed: int = 20260817) -> dict:
    rng = np.random.default_rng(seed)
    weights = {}
    in_ch = 3
    for out_ch, idx in _VGG_CONVS:
        if out_ch == "pool":
            continue
        fan_in = in_ch * 9
        w = rng.standard_normal((out_ch, in_ch, 3, 3)) * np.sqrt(2.0 / fan_in)
        weights[f"features.{idx}.weight"] = w.astype(np.float32)
        weights[f"features.{idx}.bias"] = np.zeros(out_ch, dtype=np.float32)
        in_ch = out_ch
    return weights


@lru_cache(maxsize=1)
def _load_vgg_weights() -> dict:
    path = os.environ.get("COOLCHIC_VGG16_NPZ", "")
    if path and os.path.exists(path):
        data = np.load(path)
        return {k: np.asarray(data[k], dtype=np.float32) for k in data.files}
    return _he_init_weights()


def vgg16_features(x: jnp.ndarray, weights: dict | None = None) -> list[jnp.ndarray]:
    """[1, 3, H, W] in [0,1] -> list of 4 feature arrays reshaped to
    [(C), 1, h, w] like the reference (arm.py-style per-channel batching)."""
    w = weights or {k: jnp.asarray(v) for k, v in _load_vgg_weights().items()}
    results = []
    idx = 0
    for out_ch, conv_idx in _VGG_CONVS:
        if out_ch == "pool":
            # 2x2 max pool, stride 2
            b, c, h, ww = x.shape
            x = x[:, :, : h // 2 * 2, : ww // 2 * 2]
            x = x.reshape(b, c, h // 2, 2, ww // 2, 2).max(axis=(3, 5))
            continue
        x = conv2d(x, w[f"features.{conv_idx}.weight"], w[f"features.{conv_idx}.bias"],
                   padding=1)
        x = jax.nn.relu(x)
        relu_idx = conv_idx + 1
        if relu_idx in _DESIRED_RELU:
            b, c, h, ww = x.shape
            results.append(x.reshape(b * c, 1, h, ww))
    return results


_LOWPASS = np.outer([0.25, 0.5, 0.25], [0.25, 0.5, 0.25]).reshape(1, 1, 3, 3) \
    .astype(np.float32)


def _lowpass(x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    k = jnp.asarray(_LOWPASS)
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), preferred_element_type=jnp.float32)


def _multiscale_stats(features: jnp.ndarray, num_levels: int):
    squared = jnp.square(features)
    means, variances = [], []
    for _ in range(num_levels):
        m = _lowpass(features)
        p = _lowpass(squared)
        means.append(m)
        variances.append(p - jnp.square(m))
        features = m[..., ::2, ::2]
        squared = p[..., ::2, ::2]
    return means, variances


def _safe_clamp_min(y: jnp.ndarray, lo: float) -> jnp.ndarray:
    """Clamp forward, identity gradient (reference safe_clamp_min)."""
    return y + jax.lax.stop_gradient(jnp.maximum(y, lo) - y)


def wasserstein_distortion(fa: jnp.ndarray, fb: jnp.ndarray,
                           num_levels: int = NUM_LEVELS) -> jnp.ndarray:
    means_a, vars_a = _multiscale_stats(fa, num_levels)
    means_b, vars_b = _multiscale_stats(fb, num_levels)

    log2_sigma = jnp.full((1, 1, *fa.shape[-2:]), float(LOG2_SIGMA))
    wd_maps = [jnp.square(fa - fb)]
    for ma, mb, va, vb in zip(means_a, means_b, vars_a, vars_b):
        sa = jnp.sqrt(_safe_clamp_min(va, 5e-7))
        sb = jnp.sqrt(_safe_clamp_min(vb, 5e-7))
        wd_maps.append(jnp.square(ma - mb) + jnp.square(sa - sb))

    dist = 0.0
    for i, wd_map in enumerate(wd_maps):
        weight = jax.nn.relu(1.0 - jnp.abs(log2_sigma - i))
        dist = dist + jnp.mean(weight * wd_map)
        if i > 0:
            log2_sigma = _lowpass(log2_sigma, stride=2)
    return dist


def make_wasserstein_fn(target_img: jnp.ndarray):
    """Returns wd(decoded) with the target features precomputed & cached
    (the reference caches target features in its global singleton)."""
    weights = {k: jnp.asarray(v) for k, v in _load_vgg_weights().items()}
    target_ft = [jax.lax.stop_gradient(f) for f in vgg16_features(target_img, weights)]

    def fn(decoded_img: jnp.ndarray, _target_unused=None) -> jnp.ndarray:
        decoded_ft = vgg16_features(decoded_img, weights)
        dist = 0.0
        for fa, fb in zip(decoded_ft, target_ft):
            dist = dist + wasserstein_distortion(fa, fb)
        return dist

    return fn
