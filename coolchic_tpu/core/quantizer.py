"""Differentiable quantization proxies used by the overfitting encoder.

Functional JAX port of the training-time quantizer family (reference:
coolchic/component/core/quantizer.py). The bitstream path never uses these;
only ``hardround`` semantics (round()) appear decoder-side.

Noise is explicit (a jax PRNG key is threaded by the caller) so the whole
training step stays a pure function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

QUANTIZER_NOISE_TYPES = ("kumaraswamy", "gaussian", "none")
QUANTIZER_TYPES = ("softround_alone", "softround", "hardround", "ste", "none")


def softround(x: jnp.ndarray, t: jnp.ndarray | float) -> jnp.ndarray:
    """Soft rounding of Agustsson & Theis (arXiv:2006.09952, sec. 4.1)."""
    floor_x = jnp.floor(x)
    delta = x - floor_x - 0.5
    return floor_x + 0.5 * jnp.tanh(delta / t) / jnp.tanh(1.0 / (2.0 * t)) + 0.5


def kumaraswamy_noise(uniform: jnp.ndarray, a: jnp.ndarray | float) -> jnp.ndarray:
    """Map U(0,1) samples to a mode-centered Kumaraswamy noise in [-0.5, 0.5].

    ``a`` = 1 gives uniform noise; larger values concentrate around 0.
    (C3, Kim et al., arXiv:2312.02753.)
    """
    b = (2.0**a * (a - 1.0) + 1.0) / a
    return (1.0 - (1.0 - uniform) ** (1.0 / b)) ** (1.0 / a) - 0.5


def sample_noise(key: jax.Array, shape: tuple[int, ...], noise_type: str,
                 noise_parameter: jnp.ndarray | float) -> jnp.ndarray:
    if noise_type == "none":
        return jnp.zeros(shape, dtype=jnp.float32)
    if noise_type == "gaussian":
        return jax.random.normal(key, shape, dtype=jnp.float32) * noise_parameter
    if noise_type == "kumaraswamy":
        u = jax.random.uniform(key, shape, dtype=jnp.float32)
        return kumaraswamy_noise(u, noise_parameter)
    raise ValueError(f"Unknown noise type {noise_type}")


def quantize(x: jnp.ndarray, *, quantizer_type: str, noise: jnp.ndarray | None = None,
             soft_round_temperature: jnp.ndarray | float | None = None) -> jnp.ndarray:
    """Apply the selected quantization proxy.

    - none:            x + n
    - softround_alone: softround(x, t)
    - softround:       softround(softround(x, t) + n, t)   (C3 style)
    - ste:             round(x) forward, softround(x, t) backward
    - hardround:       round(x)
    """
    if quantizer_type == "none":
        return x + noise
    if quantizer_type == "softround_alone":
        return softround(x, soft_round_temperature)
    if quantizer_type == "softround":
        return softround(softround(x, soft_round_temperature) + noise, soft_round_temperature)
    if quantizer_type == "ste":
        y = softround(x, soft_round_temperature)
        return y + jax.lax.stop_gradient(jnp.round(x) - y)
    if quantizer_type == "hardround":
        return jnp.round(x)
    raise ValueError(f"Unknown quantizer type {quantizer_type}")
