"""Convolutional synthesis transform.

Small conv stack parsed from "<out>-<k>-<linear|residual>-<none|relu>" layer
specs, with replicate padding, an optional 1x1 linear stabiliser branch over
the non-common-randomness half of the input, and a frozen 1x1 output
transform (identity, or a per-channel (min, max) affine for YUV content).

Reference parity: coolchic/component/core/synthesis.py:18-370.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.ops.convs import conv2d_replicate


def _conv_init(key: jax.Array, in_ft: int, out_ft: int, k: int, residual: bool) -> dict:
    if residual:
        w = jnp.zeros((out_ft, in_ft, k, k), dtype=jnp.float32)
    else:
        sqrt_k = math.sqrt(1.0 / (in_ft * k * k))
        w = (jax.random.uniform(key, (out_ft, in_ft, k, k), dtype=jnp.float32) - 0.5) \
            * 2.0 * sqrt_k / out_ft**2
    return {"weight": w, "bias": jnp.zeros((out_ft,), dtype=jnp.float32)}


def output_transform_init(out_ft: int, img_min_max: jnp.ndarray | None = None) -> dict:
    """Identity 1x1 conv, or diag(max-min) + min when image stats are given."""
    if img_min_max is None:
        w = jnp.eye(out_ft, dtype=jnp.float32).reshape(out_ft, out_ft, 1, 1)
        b = jnp.zeros((out_ft,), dtype=jnp.float32)
    else:
        mn, mx = img_min_max[:, 0], img_min_max[:, 1]
        w = jnp.diag(mx - mn).reshape(out_ft, out_ft, 1, 1).astype(jnp.float32)
        b = mn.astype(jnp.float32)
    return {"weight": w, "bias": b}


def synthesis_init(key: jax.Array, cfg: CoolChicConfig,
                   img_min_max: jnp.ndarray | None = None) -> dict:
    input_ft = cfg.input_feature_synthesis
    out_ft_final = cfg.synthesis_out_ft

    params: dict = {"output_transform": output_transform_init(out_ft_final, img_min_max)}

    if cfg.linear_stabiliser_synth:
        n_in_stab = input_ft // 2 if cfg.flag_common_randomness else input_ft
        key, sub = jax.random.split(key)
        params["stabiliser"] = _conv_init(sub, n_in_stab, out_ft_final, 1, residual=False)

    layers = []
    in_ft = input_ft
    for out_ft, k, mode, _ in cfg.parsed_synthesis:
        key, sub = jax.random.split(key)
        layers.append(_conv_init(sub, in_ft, out_ft, k, residual=(mode == "residual")))
        in_ft = out_ft
    params["layers"] = layers
    return params


def _conv_taps(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, k: int) -> jnp.ndarray:
    """Replicate-padded conv as k*k dense [C_out, C_in] x [C_in, H*W] matmul
    taps ([1, C_in, H, W] -> [1, C_out, H, W]). Identical math to
    conv2d_replicate up to f32 summation order; the per-tap einsum is the
    form whose vmap is a batched GEMM (the lax.conv vmap rule emits a
    feature-grouped conv that wastes the MXU -- see _conv_batched_weights)."""
    h, wd = x.shape[-2:]
    if k > 1:
        p = (k - 1) // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="edge")
    out = None
    for dy in range(k):
        for dx in range(k):
            xs = jax.lax.slice(x, (0, 0, dy, dx),
                               (x.shape[0], x.shape[1], dy + h, dx + wd))
            t = jnp.einsum("oi,bihw->bohw", w[:, :, dy, dx], xs)
            out = t if out is None else out + t
    return out + b[None, :, None, None]


def synthesis_apply(params: dict, cfg: CoolChicConfig, x: jnp.ndarray,
                    training: bool = False) -> jnp.ndarray:
    """[1, C_in, H, W] -> [1, C_out, H, W].

    training=True routes through the tap-einsum conv so the BATCHED training
    window (vmap over images, per-image weights) lowers to batched GEMMs
    instead of feature-grouped convs (measured ~4x window slowdown at
    batch >= 2). Eval/decode keeps lax.conv: the bitstream float tail stays
    bit-identical to the pinned golden."""
    conv = (lambda y, wt, bs, kk: _conv_taps(y, wt, bs, kk)) if training else \
        (lambda y, wt, bs, kk: conv2d_replicate(y, wt, bs, padding=(kk - 1) // 2))
    y = x
    for lay, (out_ft, k, mode, non_linearity) in zip(params["layers"], cfg.parsed_synthesis):
        z = conv(y, lay["weight"], lay["bias"], k)
        if mode == "residual":
            z = z + y
        if non_linearity == "relu":
            z = jax.nn.relu(z)
        y = z

    if "stabiliser" in params:
        n_in_stab = params["stabiliser"]["weight"].shape[1]
        stab = conv(x[:, :n_in_stab], params["stabiliser"]["weight"],
                    params["stabiliser"]["bias"], 1)
        y = y + stab

    ot = params["output_transform"]
    return conv(y, ot["weight"], ot["bias"], 1)


def _conv_batched_weights(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                          k: int) -> jnp.ndarray:
    """Conv2d with PER-IMAGE weights as k*k batched matmuls.

    x [G, C_in, H, W], w [G, C_out, C_in, k, k], b [G, C_out]. vmapping
    lax.conv over the weight axis lowers to a feature-grouped conv whose
    tiny per-group channel count wastes the MXU (measured 535 ms for 8
    512x768 hop syntheses); einsum keeps each tap a dense [C_out, C_in] x
    [C_in, H*W] batched matmul (measured ~30x faster)."""
    h, wd = x.shape[-2:]
    if k > 1:
        p = (k - 1) // 2
        x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p)), mode="edge")
    out = None
    for dy in range(k):
        for dx in range(k):
            xs = jax.lax.slice(x, (0, 0, dy, dx),
                               (x.shape[0], x.shape[1], dy + h, dx + wd))
            t = jnp.einsum("goi,gihw->gohw", w[:, :, :, dy, dx], xs)
            out = t if out is None else out + t
    return out + b[:, :, None, None]


def synthesis_apply_batched(params: dict, cfg: CoolChicConfig,
                            x: jnp.ndarray) -> jnp.ndarray:
    """synthesis_apply for a batch of images with DIFFERENT (stacked)
    parameters: params leaves carry a leading G axis, x is [G, C_in, H, W].
    Bit-for-bit it differs from the unbatched path only in f32 summation
    order (absorbed by the output bitdepth rounding)."""
    y = x
    for lay, (out_ft, k, mode, non_linearity) in zip(params["layers"],
                                                     cfg.parsed_synthesis):
        z = _conv_batched_weights(y, lay["weight"], lay["bias"], k)
        if mode == "residual":
            z = z + y
        if non_linearity == "relu":
            z = jax.nn.relu(z)
        y = z

    if "stabiliser" in params:
        n_in_stab = params["stabiliser"]["weight"].shape[2]
        y = y + _conv_batched_weights(x[:, :n_in_stab],
                                      params["stabiliser"]["weight"],
                                      params["stabiliser"]["bias"], 1)

    ot = params["output_transform"]
    return _conv_batched_weights(y, ot["weight"], ot["bias"], 1)
