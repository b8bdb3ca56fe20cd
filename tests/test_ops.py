"""Semantic-parity tests for the low-level ops, using torch as the oracle
(the bitstream format is defined in terms of torch operator semantics)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from coolchic_tpu.core import constants
from coolchic_tpu.core.quantizer import kumaraswamy_noise, softround
from coolchic_tpu.ops.context import spatial_context
from coolchic_tpu.ops.convs import (
    conv2d,
    conv2d_replicate,
    conv_transpose2d_stride2,
    replicate_pad,
)
from coolchic_tpu.ops.resize import interpolate, interpolate_x2

RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((7, 9), (14, 18)),
    ((8, 8), (16, 16)),
    ((5, 6), (17, 13)),
    ((12, 10), (12, 10)),
    ((13, 11), (26, 22)),
])
def test_interpolate_matches_torch(mode, in_hw, out_hw):
    x = rand(2, 3, *in_hw)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode=mode,
                        **({} if mode == "nearest" else {"align_corners": False}))
    got = interpolate(jnp.asarray(x), out_hw, mode)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-5, atol=2e-5)


def test_interpolate_x2_matches_torch_scale_factor():
    x = rand(1, 2, 9, 7)
    for mode in ["nearest", "bicubic"]:
        ref = F.interpolate(torch.from_numpy(x), scale_factor=2.0, mode=mode,
                            **({} if mode == "nearest" else {"align_corners": False}))
        got = interpolate_x2(jnp.asarray(x), mode)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-5, atol=2e-5)


def test_conv2d_matches_torch():
    x, k, b = rand(1, 4, 9, 11), rand(5, 4, 3, 3), rand(5)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(k), torch.from_numpy(b), padding=1)
    got = conv2d(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), padding=1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_conv2d_replicate_matches_torch():
    x, k, b = rand(1, 3, 8, 8), rand(2, 3, 3, 3), rand(2)
    xp = F.pad(torch.from_numpy(x), (1, 1, 1, 1), mode="replicate")
    ref = F.conv2d(xp, torch.from_numpy(k), torch.from_numpy(b))
    got = conv2d_replicate(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b), padding=1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k", [4, 6, 8])
def test_conv_transpose_matches_torch(k):
    x = rand(3, 1, 7, 9)
    kern = rand(1, 1, k, k)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(kern), stride=2)
    got = conv_transpose2d_stride2(jnp.asarray(x), jnp.asarray(kern))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_replicate_pad_matches_torch():
    x = rand(1, 1, 5, 6)
    ref = F.pad(torch.from_numpy(x), (2, 3, 1, 4), mode="replicate")
    got = replicate_pad(jnp.asarray(x), (2, 3, 1, 4))
    np.testing.assert_allclose(np.asarray(got), ref.numpy())


def test_priority_order_context_offsets():
    # First 8 context pixels per the normative priority table.
    idx = constants.non_zero_pixel_ctx_index(8)
    # Positions with priority value 0..7 (from the reference table layout).
    expected = []
    for prio in range(8):
        expected.append(int(np.where(constants.PRIORITY_ORDER == prio)[0][0]))
    np.testing.assert_array_equal(idx, expected)


def test_spatial_context_matches_torch_unfold():
    """Context extraction must match the reference pad+unfold+index_select."""
    h, w, n_ctx = 6, 7, 12
    x = rand(h, w)
    mask = constants.MAX_ARM_MASK_SIZE
    pad = (mask - 1) // 2
    xt = torch.from_numpy(x).view(1, 1, h, w)
    x_pad = F.pad(xt, (pad, pad, pad, pad))
    unf = x_pad.unfold(2, mask, 1).unfold(3, mask, 1)  # [1,1,H,W,9,9]
    unf = unf.reshape(1, 1, h, w, mask * mask).permute(0, 2, 3, 1, 4).reshape(h * w, mask * mask)
    idx = torch.from_numpy(constants.non_zero_pixel_ctx_index(n_ctx))
    ref = torch.index_select(unf, dim=1, index=idx)

    got = spatial_context(jnp.asarray(x), n_ctx)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-6, atol=1e-6)


def test_softround_matches_torch_formula():
    x = rand(100)
    t = 0.27
    xt = torch.from_numpy(x)
    floor_x = torch.floor(xt)
    delta = xt - floor_x - 0.5
    ref = floor_x + 0.5 * torch.tanh(delta / t) / torch.tanh(torch.tensor(1 / (2 * t))) + 0.5
    got = softround(jnp.asarray(x), t)
    # float32 tanh differs by a couple ulp between XLA and torch
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=5e-5)


def test_kumaraswamy_mode_and_range():
    u = np.linspace(1e-4, 1 - 1e-4, 1001).astype(np.float32)
    n = np.asarray(kumaraswamy_noise(jnp.asarray(u), 2.0))
    assert n.min() >= -0.5 and n.max() <= 0.5
    # a=1 -> uniform
    n1 = np.asarray(kumaraswamy_noise(jnp.asarray(u), 1.0))
    np.testing.assert_allclose(n1, u - 0.5, atol=1e-5)


def test_common_randomness_matches_reference_lcg():
    from coolchic_tpu.core.noise import CommonGaussianNoise

    gen = CommonGaussianNoise()
    vals = gen.sample((2, 3))
    # Re-derive the first samples by hand (Lehmer LCG + Box-Muller).
    import math
    seed, a, m = 18101995, 7**5, 2**31 - 1
    expected = []
    for _ in range(6):
        seed = (a * seed) % m
        u1 = seed / m
        seed = (a * seed) % m
        u2 = seed / m
        expected.append(math.sqrt(-2 * math.log(u1)) * math.cos(2 * 3.14159265359 * u2))
    np.testing.assert_allclose(vals.reshape(-1), np.float32(expected), rtol=1e-6)


def test_spatial_context_conv_grad_matches_slices():
    """The conv-based context extraction must match the slice-stack variant
    in value AND gradient."""
    import jax
    from coolchic_tpu.ops.context import spatial_context_slices

    x = rand(10, 12)
    n_ctx = 14

    def f_conv(g):
        return (spatial_context(g, n_ctx) ** 2).sum()

    def f_slices(g):
        return (spatial_context_slices(g, n_ctx) ** 2).sum()

    g1 = jax.grad(f_conv)(jnp.asarray(x))
    g2 = jax.grad(f_slices)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6, atol=1e-6)
