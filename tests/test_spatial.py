"""Spatial (H) sharding of one large image over the 8-virtual-device mesh.

The spatially-sharded training window and decode-side float path must
reproduce the single-device results: GSPMD halo exchanges for the context
conv / synthesis convs / upsampling must be transparent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from coolchic_tpu.models.frame import FrameConfig, frame_encoder_forward, frame_encoder_init
from coolchic_tpu.parallel.spatial import make_spatial_train, shard_spatial, shard_target
from coolchic_tpu.train.presets import TrainerPhase
from coolchic_tpu.train.train import _make_fns, init_opt_state
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args
from coolchic_tpu.parallel.batch import phase_key

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-virtual-device mesh")


def _synthetic_image(h, w, seed=0):
    """Smooth structure + texture, values in [0, 1]."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 0.5 + 0.25 * np.sin(yy / 37.0) * np.cos(xx / 53.0)
    tex = 0.08 * rng.standard_normal((3, h, w)).astype(np.float32)
    img = np.clip(base[None] + tex, 0.0, 1.0)
    return jnp.asarray(img[None])


def _setup(h, w):
    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], (h, w))}
    fcfg = FrameConfig(coolchic_cfg=cfgs)
    params = frame_encoder_init(jax.random.PRNGKey(0), fcfg)
    target = _synthetic_image(h, w)
    phase = TrainerPhase(lmbda=1e-3, max_itr=8, freq_valid=8, lr=1e-2,
                         quantizer_noise_type="gaussian",
                         quantizer_type="softround")
    return fcfg, params, target, phase


@pytest.mark.slow
def test_spatial_training_matches_single_device_2k():
    """A genuinely large image (1024x1536 = 1.6 Mpix) trains with latents,
    target and activations sharded along H over 8 devices; the loss after a
    window matches the single-device run to f32 reduction tolerance."""
    h, w = 1024, 1536
    fcfg, params, target, phase = _setup(h, w)
    mesh = Mesh(np.array(jax.devices()[:8]), ("space",))

    window, evaluate, prepare = make_spatial_train(
        fcfg, phase_key(phase), mesh, freq_valid=4)

    # single-device path (same fns, unsharded placements)
    fns = _make_fns(fcfg, phase.quantizer_noise_type, phase.quantizer_type,
                    tuple(sorted(phase.dist_weight.items())), phase.lmbda,
                    tuple(phase.betas_model), tuple(phase.betas_latent),
                    phase.precondition_frequency_model, 4, False)
    opt0 = init_opt_state(params, fns["hp_weight"], fns["hp_latent"])
    p1, o1, k1 = fns["train_window"](params, opt0, jax.random.PRNGKey(0),
                                     jnp.float32(1e-2), jnp.float32(0.3),
                                     jnp.float32(0.2), target, None, None,
                                     length=4)
    loss1 = float(fns["eval_fn"](p1, target, None, None).loss)

    ps, os_, ts, key = prepare(params, target, seed=0)
    p2, o2, k2 = window(ps, os_, key, ts, 1e-2, 0.3, 0.2, length=4)
    loss2 = float(evaluate(p2, ts).loss)

    # same RNG stream, same math modulo f32 reduction order + halo summation
    assert abs(loss1 - loss2) / max(abs(loss1), 1e-9) < 1e-3, (loss1, loss2)
    # latents evolved identically up to f32 noise
    l1 = np.asarray(p1["residue"]["latents"][0])
    l2 = np.asarray(p2["residue"]["latents"][0])
    np.testing.assert_allclose(l1, l2, atol=2e-4)


@pytest.mark.slow
def test_spatial_decode_identical_2k():
    """Decode-side float path (eval forward) with H sharded over 8 devices
    is elementwise-equal to the single-device decode (within f32)."""
    h, w = 1024, 1536
    fcfg, params, target, _ = _setup(h, w)
    mesh = Mesh(np.array(jax.devices()[:8]), ("space",))

    @jax.jit
    def dec(p):
        return frame_encoder_forward(p, fcfg, training=False).decoded_image

    ref = np.asarray(dec(params))
    sharded = shard_spatial(params, mesh)
    got = np.asarray(dec(sharded))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_spatial_training_small_fast():
    """Fast variant of the trajectory check (128x192, 3 steps)."""
    h, w = 128, 192
    fcfg, params, target, phase = _setup(h, w)
    mesh = Mesh(np.array(jax.devices()[:8]), ("space",))

    window, evaluate, prepare = make_spatial_train(
        fcfg, phase_key(phase), mesh, freq_valid=3)
    fns = _make_fns(fcfg, phase.quantizer_noise_type, phase.quantizer_type,
                    tuple(sorted(phase.dist_weight.items())), phase.lmbda,
                    tuple(phase.betas_model), tuple(phase.betas_latent),
                    phase.precondition_frequency_model, 3, False)
    opt0 = init_opt_state(params, fns["hp_weight"], fns["hp_latent"])
    p1, _, _ = fns["train_window"](params, opt0, jax.random.PRNGKey(0),
                                   jnp.float32(1e-2), jnp.float32(0.3),
                                   jnp.float32(0.2), target, None, None,
                                   length=3)
    loss1 = float(fns["eval_fn"](p1, target, None, None).loss)

    ps, os_, ts, key = prepare(params, target, seed=0)
    p2, _, _ = window(ps, os_, key, ts, 1e-2, 0.3, 0.2, length=3)
    loss2 = float(evaluate(p2, ts).loss)
    assert abs(loss1 - loss2) / max(abs(loss1), 1e-9) < 1e-3, (loss1, loss2)
