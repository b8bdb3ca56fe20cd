"""Laplace CDF and the differentiable rate proxy.

Reference parity: coolchic/component/core/arm.py:448-485.
"""

from __future__ import annotations

import jax.numpy as jnp

from coolchic_tpu.core.constants import MIN_PROBA

_LOG2 = 0.6931471805599453  # ln(2)


def laplace_cdf(x: jnp.ndarray, mu: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    shifted = x - mu
    return 0.5 - 0.5 * jnp.sign(shifted) * jnp.expm1(-jnp.abs(shifted) / scale)


def rate_bits(x: jnp.ndarray, mu: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Per-symbol rate in bits: -log2 max(P[x-0.5 < X <= x+0.5], 2^-16)."""
    proba = laplace_cdf(x + 0.5, mu, scale) - laplace_cdf(x - 0.5, mu, scale)
    proba = jnp.maximum(proba, MIN_PROBA)
    return -jnp.log(proba) / _LOG2
