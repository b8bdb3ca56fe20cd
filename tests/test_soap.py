"""SOAP eigenbasis seeding (reference training/soap.py first-step semantics).

The reference's first optimizer step seeds GG with the first gradient's
covariances, sets Q to their eigh eigenbasis, and makes no parameter
update; seed_opt_state reproduces this on the host for WEIGHT leaves.
"""

import jax
import jax.numpy as jnp
import numpy as np


def test_seed_matches_reference_semantics():
    from coolchic_tpu.train.soap import (
        SoapHyperParams,
        soap_init_from_grad_leaf,
        soap_init_leaf,
    )

    rng = np.random.default_rng(0)
    hp = SoapHyperParams(b1=0.95, b2=0.95, max_precond_dim=256)
    g = rng.normal(size=(12, 8)).astype(np.float32)
    state = soap_init_leaf(jnp.zeros((12, 8)), hp)
    seeded = soap_init_from_grad_leaf(g, state, hp)

    beta = hp.effective_shampoo_beta
    gg0 = (1.0 - beta) * (g @ g.T)
    gg1 = (1.0 - beta) * (g.T @ g)
    np.testing.assert_allclose(np.asarray(seeded["GG"][0]), gg0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(seeded["GG"][1]), gg1, rtol=1e-5)

    for i, gg in enumerate((gg0, gg1)):
        q = np.asarray(seeded["Q"][i])
        # orthonormal
        np.testing.assert_allclose(q.T @ q, np.eye(q.shape[0]), atol=1e-4)
        # diagonalizes GG with eigenvalues descending
        eig = np.diagonal(q.T @ gg @ q)
        assert np.all(np.diff(eig) <= 1e-4), eig
    assert bool(seeded["initialized"])


def test_seeded_training_step_runs_and_matches_projection():
    """A SOAP step after seeding projects the gradient into the seeded
    basis: for a rank-1 first gradient, the projected first moment must be
    concentrated on the leading eigen-coordinate."""
    from coolchic_tpu.train.soap import (
        SoapHyperParams,
        soap_init_from_grad_leaf,
        soap_init_leaf,
        soap_step_leaf,
    )

    hp = SoapHyperParams(b1=0.95, b2=0.95, max_precond_dim=256)
    u = np.zeros((6, 1), np.float32)
    u[2] = 1.0
    v = np.ones((1, 4), np.float32)
    g = (u @ v).astype(np.float32)

    state = soap_init_leaf(jnp.zeros((6, 4)), hp)
    state = soap_init_from_grad_leaf(g, state, hp)
    p = jnp.zeros((6, 4))
    p2, s2 = soap_step_leaf(jnp.asarray(g), state, p, 0.01, hp, refresh=False)
    m = np.abs(np.asarray(s2["exp_avg"]))
    assert m[0, 0] == m.max()
    assert m[0, 0] > 10 * (m.sum() - m[0, 0] + 1e-12)


def test_train_seeding_end_to_end():
    """train() with seeding enabled runs and does not diverge on a tiny
    frame (smoke covering grad_fn + seed_opt_state wiring)."""
    from coolchic_tpu.models.frame import FrameConfig, frame_encoder_init
    from coolchic_tpu.train.presets import TrainerPhase
    from coolchic_tpu.train.train import test as eval_test
    from coolchic_tpu.train.train import train
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        coolchic_config_from_args,
    )

    img_size = (32, 48)
    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], img_size)}
    fcfg = FrameConfig(coolchic_cfg=cfgs)
    params = frame_encoder_init(jax.random.PRNGKey(0), fcfg)
    target = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, *img_size))
    phase = TrainerPhase(lmbda=1e-3, max_itr=30, freq_valid=15, lr=1e-2,
                         quantizer_noise_type="gaussian",
                         quantizer_type="softround")
    before = eval_test(params, fcfg, target, lmbda=phase.lmbda)
    out = train(params, fcfg, target, phase, key=jax.random.PRNGKey(2))
    after = eval_test(out, fcfg, target, lmbda=phase.lmbda)
    assert after.loss <= before.loss
