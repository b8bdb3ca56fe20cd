"""The on-device (lax.map) q-step grid scorer must select exactly what the
per-combo host loop selects (reference nnquant/quantizemodel.py grid search;
our batched path exists because ~650 host round-trips dominate on a remote
TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.models.frame import FrameConfig, frame_encoder_init
from coolchic_tpu.nnquant.quantize import quantize_coolchic
from coolchic_tpu.train.train import _make_fns
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args


def test_batched_grid_matches_host_loop():
    cfgs = {"residue": coolchic_config_from_args(INTRA_OPERATING_POINTS["lop"], (64, 96))}
    fcfg = FrameConfig(coolchic_cfg=cfgs)
    params = frame_encoder_init(jax.random.PRNGKey(0), fcfg)
    target = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 96))
    fns = _make_fns(fcfg, "none", "hardround", (("mse", 1.0),), 1e-3,
                    (0.95, 0.95), (0.9, 0.999), 10, 1, False)
    ev = fns["eval_fn"]
    n_pixels = 64 * 96

    def eval_loss(cc, bits):
        t = dict(params)
        t["residue"] = cc
        return float(ev(t, target, None, None).loss) + 1e-3 * bits / n_pixels

    def eval_with_ctx(ctx, cc):
        full, tgt = ctx
        t = dict(full)
        t["residue"] = cc
        return ev(t, tgt, None, None).loss

    q1, s1, e1, r1 = quantize_coolchic(
        params["residue"], cfgs["residue"], eval_loss, 1e-3, n_pixels)
    q2, s2, e2, r2 = quantize_coolchic(
        params["residue"], cfgs["residue"], eval_loss, 1e-3, n_pixels,
        eval_with_ctx=eval_with_ctx, eval_ctx=(params, target))

    assert s1 == s2
    assert e1 == e2
    assert abs(r1 - r2) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(q1), jax.tree_util.tree_leaves(q2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
