"""Regression: the multi-chip dryrun paths must compile without GSPMD
"Involuntary full rematerialization" warnings (VERDICT r3 item 3).

Round-3 history: the driver's MULTICHIP run flagged an involuntary full
rematerialization in jit(train_window) on the spatially-sharded path — the
deep-pyramid upsampling gradients inherited degenerate H-shardings. Fixed by
pinning pyramid intermediates to replicated under the spatial mesh
(models/upsampling.py:_pin_spatial) and resharding the dense stack after
upsampling (models/coolchic.py). This test compiles the same window in a
subprocess and greps its stderr.
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from jax.sharding import Mesh
from coolchic_tpu.models.frame import FrameConfig, frame_encoder_init
from coolchic_tpu.parallel.batch import make_mesh, phase_key
from coolchic_tpu.parallel.spatial import make_spatial_train
from coolchic_tpu.train.presets import TrainerPhase
from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

mesh2 = make_mesh(8, space=2)
sp_mesh = Mesh(mesh2.devices.reshape(-1), ("space",))
phase = TrainerPhase(lmbda=1e-3, max_itr=2, freq_valid=2)
sp_size = (64, 96)
fcfg = FrameConfig(coolchic_cfg={"residue": coolchic_config_from_args(
    INTRA_OPERATING_POINTS["hop"], sp_size)})
params = frame_encoder_init(jax.random.PRNGKey(5), fcfg)
target = jnp.broadcast_to(
    jnp.linspace(0, 1, sp_size[0] * sp_size[1], dtype=jnp.float32
                 ).reshape(1, 1, *sp_size), (1, 3, *sp_size)).copy()
window, evaluate, prepare = make_spatial_train(fcfg, phase_key(phase), sp_mesh,
                                               freq_valid=2)
ps, os_, ts, k = prepare(params, target, seed=0)
ps, os_, k = window(ps, os_, k, ts, 1e-2, 0.3, 0.2, length=2)
lo = evaluate(ps, ts)
jax.block_until_ready(lo.loss)
assert bool(jnp.isfinite(lo.loss))
print("SPMD_CLEAN_DONE")
"""


@pytest.mark.slow
@pytest.mark.parametrize("shardy", [False, True])
def test_spatial_window_compiles_without_involuntary_remat(shardy):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_USE_SHARDY_PARTITIONER"] = "1" if shardy else "0"
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SPMD_CLEAN_DONE" in out.stdout
    assert "Involuntary full rematerialization" not in out.stderr, (
        [ln for ln in out.stderr.splitlines() if "Involuntary" in ln][:2])
