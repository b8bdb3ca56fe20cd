"""Coding structure, DSL parsing, complexity accounting, checkpointing,
results/BD-rate utilities."""

import numpy as np
import pytest

import jax

from coolchic_tpu.utils.codingstructure import CodingStructure
from coolchic_tpu.utils.complexity import total_mac_per_pixel
from coolchic_tpu.utils.parsecli import (
    INTRA_OPERATING_POINTS,
    coolchic_config_from_args,
    parse_arm,
    parse_frame_positions,
    parse_latent_resolution,
    parse_synthesis_layers,
)
from coolchic_tpu.utils.results import bd_rate


def test_coding_structure_hierarchical_b():
    """I0 ... P8 with hierarchical B fill (reference codingstructure.py doc)."""
    cs = CodingStructure(n_frames=9, intra_pos=[0], p_pos=[8])
    f = {i: cs.get_frame_from_display_order(i) for i in range(9)}
    assert f[0].frame_type == "I" and f[0].depth == 0
    assert f[8].frame_type == "P" and f[8].index_references == [0] and f[8].depth == 1
    assert f[4].frame_type == "B" and f[4].index_references == [0, 8] and f[4].depth == 2
    assert f[2].index_references == [0, 4] and f[2].depth == 3
    assert f[6].index_references == [4, 8] and f[6].depth == 3
    assert f[1].index_references == [0, 2] and f[1].depth == 4
    # Coding order: intras, Ps, then Bs in creation order
    assert f[0].coding_order == 0 and f[8].coding_order == 1 and f[4].coding_order == 2


def test_parse_dsls():
    layers, stab = parse_synthesis_layers(
        "48-1-linear-relu,3-1-linear-none,3-3-residual-relu/stabiliser")
    assert len(layers) == 3 and stab
    arm = parse_arm("14,2/stabiliser")
    assert arm == {"spatial_context_arm": 14, "n_hidden_layers_arm": 2,
                   "linear_stabiliser_arm": True}
    assert parse_latent_resolution("auto", 500_000) == (0, 6)
    assert parse_latent_resolution("auto", 2_000_000) == (0, 7)
    assert parse_latent_resolution("auto", 8_000_000) == (0, 8)
    assert parse_latent_resolution("2-6", 0) == (2, 6)
    assert parse_frame_positions("0,4-6,-2", 10) == [0, 4, 5, 6, 8]


def test_mac_per_pixel_matches_published_operating_points():
    """The reference publishes ~500/1000/2000/3000 MAC/px for lop..vhop
    (docs/source/image_compression/architecture.rst:66-86)."""
    published = {"lop": 500, "mop": 1000, "hop": 2000, "vhop": 3000}
    for op, target in published.items():
        cfg = coolchic_config_from_args(INTRA_OPERATING_POINTS[op], (512, 768))
        got = total_mac_per_pixel(cfg)
        assert abs(got - target) / target < 0.12, (op, got)


def test_checkpoint_roundtrip(tmp_path):
    from coolchic_tpu.models.frame import FrameConfig, frame_encoder_init
    from coolchic_tpu.utils.checkpoint import load_frame_encoder, save_frame_encoder

    cfg = coolchic_config_from_args(INTRA_OPERATING_POINTS["lop"], (32, 48))
    fcfg = FrameConfig(coolchic_cfg={"residue": cfg})
    params = frame_encoder_init(jax.random.PRNGKey(0), fcfg)
    side = {"residue": ({("arm", "weight"): -7, ("arm", "bias"): -8},
                        {("arm", "weight"): 3, ("arm", "bias"): 2})}
    path = str(tmp_path / "ck.npz")
    save_frame_encoder(path, params, fcfg, side)
    p2, fcfg2, side2 = load_frame_encoder(path)
    assert fcfg2 == fcfg
    assert side2 == side
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_detailed_logs():
    from coolchic_tpu.models.frame import FrameConfig, frame_encoder_init
    from coolchic_tpu.train.logs import detailed_test

    import jax.numpy as jnp

    cfg = coolchic_config_from_args(INTRA_OPERATING_POINTS["lop"], (24, 32))
    fcfg = FrameConfig(coolchic_cfg={"residue": cfg})
    params = frame_encoder_init(jax.random.PRNGKey(0), fcfg)
    target = jnp.zeros((1, 3, 24, 32)) + 0.4
    logs = detailed_test(params, fcfg, target)
    assert "psnr_db" in logs and "residue_grid0_bpp" in logs
    assert logs["residue_mac_per_pixel"] > 100


def test_bd_rate_sign():
    psnr = [30, 33, 36, 39]
    rate_b = [0.1, 0.2, 0.4, 0.8]
    rate_a = [r * 0.9 for r in rate_b]  # A is uniformly 10% cheaper
    bd = bd_rate(rate_a, psnr, rate_b, psnr)
    assert -11 < bd < -9


def test_wasserstein_distortion_smoke():
    import jax.numpy as jnp

    from coolchic_tpu.train.wasserstein import make_wasserstein_fn

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((1, 3, 64, 64)), dtype=jnp.float32)
    b = jnp.asarray(rng.random((1, 3, 64, 64)), dtype=jnp.float32)
    wd = make_wasserstein_fn(a)
    assert float(wd(a)) < 1e-9  # identical images -> zero distortion
    assert float(wd(b)) > 0.0
