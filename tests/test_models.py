"""Model-component parity vs torch oracles + forward smoke tests."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.models.arm import arm_apply, arm_init, arm_reparameterize
from coolchic_tpu.models.coolchic import coolchic_forward, coolchic_init
from coolchic_tpu.models.upsampling import (
    fixed_upsampling,
    half_param_size,
    symmetric_kernel_1d,
    tconv_half_init,
    upsampling_apply,
    upsampling_init,
)
from coolchic_tpu.models.warp import warp_fn

RNG = np.random.default_rng(7)


def small_cfg(h=40, w=56, ifce=True, hyper=True):
    return CoolChicConfig(
        layers_synthesis=("12-1-linear-relu", "3-1-linear-none", "3-3-residual-relu"),
        linear_stabiliser_synth=True,
        ups_k_size=8, ups_preconcat_k_size=7,
        ifce_resolution=(0, 2) if ifce else None,
        output_feature_ifce=4 if ifce else 0,
        spatial_context_arm=8, linear_stabiliser_arm=True, n_hidden_layers_arm=2,
        latent_resolution=(0, 3),
        hyperlatent_resolution=(2, 3) if hyper else None,
        flag_common_randomness=False,
        img_size=(h, w),
    )


def test_config_derivation():
    cfg = small_cfg()
    # latent 0..3 (4 grids) + hyper 2..3 (2 grids), interleaved by level
    assert cfg.n_latent_grids == 6
    assert cfg.flag_is_hyperlatent == (False, False, False, True, False, True)
    assert cfg.size_per_latent[0] == (40, 56)
    assert cfg.size_per_latent[-1] == (5, 7)
    # hyperlatent grid 3 sits at downsampling ratio 2, inside the IFCE range
    assert cfg.input_features_ifce == (5, 4, 3, 2, 0, 0)
    assert cfg.total_context_arm == 12
    assert cfg.input_feature_synthesis == 4


def test_symmetric_kernel():
    half = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(symmetric_kernel_1d(half, 5), [1, 2, 3, 2, 1])
    np.testing.assert_array_equal(symmetric_kernel_1d(half, 6), [1, 2, 3, 3, 2, 1])


@pytest.mark.parametrize("k,training", [(8, True), (8, False), (4, True), (6, False)])
def test_tconv_x2_matches_torch_reference_semantics(k, training):
    """Replicate-pad -> stride-2 tconv (symmetric separable kernel) -> crop,
    against a torch oracle implementing the same reference forward
    (upsampling.py:287-345)."""
    from coolchic_tpu.models.upsampling import _tconv_x2

    half = RNG.standard_normal(half_param_size(k)).astype(np.float32)
    x = RNG.standard_normal((3, 1, 9, 11)).astype(np.float32)

    w1d = torch.from_numpy(np.concatenate([half, half[::-1][k % 2:]]))
    p0 = k // 2
    crop = 2 * p0 - 1 + k // 2
    xt = torch.from_numpy(x)
    k2d = torch.kron(w1d.view(1, -1), w1d.view(-1, 1)).view(1, 1, k, k)
    x_pad = F.pad(xt, (p0, p0, p0, p0), mode="replicate")
    yc = F.conv_transpose2d(x_pad, k2d, stride=2)
    ref = yc[:, :, crop:yc.shape[2] - crop, crop:yc.shape[3] - crop]

    got = _tconv_x2(jnp.asarray(x), jnp.asarray(half), k, training)
    assert got.shape == ref.shape == (3, 1, 18, 22)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-4, atol=2e-5)


def test_preconcat_matches_torch():
    from coolchic_tpu.models.upsampling import _preconcat

    k = 7
    half = RNG.standard_normal(half_param_size(k)).astype(np.float32)
    x = RNG.standard_normal((1, 1, 13, 17)).astype(np.float32)
    w1d = torch.from_numpy(np.concatenate([half, half[::-1][1:]]))
    k2d = torch.kron(w1d.view(1, -1), w1d.view(-1, 1)).view(1, 1, k, k)
    ref = F.conv2d(torch.from_numpy(x), k2d, padding=k // 2) + torch.from_numpy(x)
    for training in (True, False):
        got = _preconcat(jnp.asarray(x), jnp.asarray(half), k, training)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-4, atol=2e-5)


def test_upsampling_pyramid_shapes_and_dirac_identity():
    """With Dirac preconcat + untrained (bilinear/bicubic) tconvs, output has
    the dense shape and channel 0 equals the full-res grid exactly (Dirac +
    residual on an identity path)."""
    cfg = small_cfg(ifce=False, hyper=False)
    params = upsampling_init(cfg.ups_k_size, cfg.ups_preconcat_k_size, cfg.n_ups)
    grids = [jnp.asarray(RNG.standard_normal(s).astype(np.float32))
             for s in cfg.size_per_latent]
    dense = upsampling_apply(params, grids, cfg.ups_k_size, cfg.ups_preconcat_k_size, True)
    assert dense.shape == (4, 40, 56)
    # channel 0 = preconcat(grid0) = dirac conv + residual = 2 * grid0
    np.testing.assert_allclose(np.asarray(dense[0]), 2 * np.asarray(grids[0]),
                               rtol=1e-5, atol=1e-5)


def test_fixed_upsampling_intermediates():
    cfg = small_cfg(ifce=False, hyper=False)
    grids = [jnp.asarray(RNG.standard_normal(s).astype(np.float32))
             for s in cfg.size_per_latent]
    dense, inter = fixed_upsampling(grids, mode="nearest")
    assert dense.shape == (4, 40, 56)
    assert inter[0].shape == (1, 5, 7) and float(jnp.abs(inter[0]).max()) == 0.0
    assert inter[1].shape == (1, 5, 7)
    assert inter[2].shape == (2, 10, 14)
    assert inter[3].shape == (3, 20, 28)


def test_arm_matches_torch_linear():
    dim, n_hidden = 12, 2
    params = arm_init(jax.random.PRNGKey(3), dim, n_hidden, stabiliser=True)
    x = RNG.standard_normal((50, dim)).astype(np.float32)

    xt = torch.from_numpy(x)
    y = xt
    for lay in params["layers"][:-1]:
        w = torch.from_numpy(np.asarray(lay["weight"]))
        b = torch.from_numpy(np.asarray(lay["bias"]))
        y = torch.relu(F.linear(y, w, b) + y)
    last = params["layers"][-1]
    y = F.linear(y, torch.from_numpy(np.asarray(last["weight"])),
                 torch.from_numpy(np.asarray(last["bias"])))
    stab = params["stabiliser"]
    y = y + F.linear(xt, torch.from_numpy(np.asarray(stab["weight"])),
                     torch.from_numpy(np.asarray(stab["bias"])))

    got = arm_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), y.numpy(), rtol=1e-5, atol=1e-6)

    mu, scale = arm_reparameterize(got)
    ref_scale = torch.exp(torch.clamp(y[:, 1] - 4, min=-5, max=5))
    np.testing.assert_allclose(np.asarray(scale), ref_scale.numpy(), rtol=1e-5)


def test_coolchic_forward_smoke():
    cfg = small_cfg()
    params = coolchic_init(jax.random.PRNGKey(0), cfg)
    out = coolchic_forward(params, cfg, key=jax.random.PRNGKey(1),
                           quantizer_noise_type="gaussian", quantizer_type="softround",
                           soft_round_temperature=0.3, noise_parameter=0.2, training=True)
    assert out.raw_out.shape == (1, 3, 40, 56)
    n_latents = sum(h * w for h, w in cfg.size_per_latent)
    assert out.rate.shape == (n_latents,)
    assert np.isfinite(np.asarray(out.rate)).all()
    # eval mode: latents are integers
    out_eval = coolchic_forward(params, cfg, training=False)
    for g in out_eval.latents:
        arr = np.asarray(g)
        np.testing.assert_array_equal(arr, np.round(arr))


def test_warp_matches_torch_grid_sample_bilinear():
    x = RNG.standard_normal((1, 3, 24, 32)).astype(np.float32)
    flow = (RNG.standard_normal((1, 2, 24, 32)) * 3).astype(np.float32)

    xt, ft = torch.from_numpy(x), torch.from_numpy(flow)
    h, w = 24, 32
    hor = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(1, -1, h, -1)
    ver = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(1, -1, -1, w)
    grid = torch.cat([hor, ver], 1) + torch.cat(
        [ft[:, 0:1] / ((w - 1) / 2), ft[:, 1:2] / ((h - 1) / 2)], dim=1)
    ref = F.grid_sample(xt, grid.permute(0, 2, 3, 1), mode="bilinear",
                        padding_mode="border", align_corners=True)

    got = warp_fn(x, flow, filter_size=2, training=True)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-4, atol=2e-4)


def test_warp_matches_torch_grid_sample_bicubic():
    x = RNG.standard_normal((1, 2, 16, 20)).astype(np.float32)
    flow = (RNG.standard_normal((1, 2, 16, 20)) * 2).astype(np.float32)
    xt, ft = torch.from_numpy(x), torch.from_numpy(flow)
    h, w = 16, 20
    hor = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(1, -1, h, -1)
    ver = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(1, -1, -1, w)
    grid = torch.cat([hor, ver], 1) + torch.cat(
        [ft[:, 0:1] / ((w - 1) / 2), ft[:, 1:2] / ((h - 1) / 2)], dim=1)
    ref = F.grid_sample(xt, grid.permute(0, 2, 3, 1), mode="bicubic",
                        padding_mode="border", align_corners=True)
    got = warp_fn(x, flow, filter_size=4, training=True)
    # grid_sample bicubic does not clamp tap indices identically at extreme
    # borders; interior must match tightly.
    np.testing.assert_allclose(np.asarray(got)[..., 2:-2, 2:-2],
                               ref.numpy()[..., 2:-2, 2:-2], rtol=1e-3, atol=1e-3)
