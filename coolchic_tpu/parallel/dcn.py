"""Multi-host (DCN) execution of the batched encoder and the GOP waves.

The reference's only multi-node story is slurm `afterok` chains between
per-frame subprocesses with decoded reference frames handed off via DISK
(reference _getcodingstruct.py:17-91, samples/encode.py:147-183,
component/video.py:360-377). The TPU-native equivalent is a
PROCESS-SPANNING `jax.sharding.Mesh` built after `jax.distributed.initialize`:

  * the batched training step (parallel/batch.py shard_map over "data")
    runs unchanged on the global mesh -- each host advances its local
    images with zero steady-state collectives;
  * between GOP waves, decoded reference pixels move host-to-host as ONE
    all-gather over the "data" axis (jit identity to a replicated
    out_sharding) -- DCN traffic replacing the reference's disk round-trip.

On real hardware `init_multiprocess(platform=None)` keeps the TPU backend
and the same code spans pod slices over DCN. In this repo's environment
(one chip, zero egress) the multi-host path is exercised exactly like the
virtual-device mesh tests: N processes x M virtual CPU devices with gloo
cross-process collectives (`launch_dcn_dryrun`), which compiles and RUNS the
identical program -- see tests/test_dcn.py and __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np


def init_multiprocess(coordinator: str, num_processes: int, process_id: int,
                      *, local_devices: int | None = None,
                      platform: str | None = None) -> None:
    """jax.distributed bring-up. Must run before any JAX computation.

    platform="cpu" (the dryrun/test path) forces the host backend with
    `local_devices` virtual devices per process and gloo cross-process
    collectives; platform=None keeps the ambient (TPU) backend, where
    libtpu provides the DCN transport.
    """
    import jax

    if platform is not None:
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
            if local_devices:
                jax.config.update("jax_num_cpu_devices", local_devices)
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_shard(tree, mesh, spec=None):
    """Host-identical (numpy/jnp) stacked pytree -> GLOBAL arrays sharded over
    the mesh's "data" axis. Works in multi-process: each process materializes
    only its addressable shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = spec if spec is not None else P("data")

    def place(x):
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec if x.ndim > 0 else P())
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(place, tree)


def replicate(arr, mesh):
    """All-gather a "data"-sharded global array to every host (the reference-
    pixel exchange; DCN at host scope, ICI inside a slice)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(arr)


def worker_main(process_id: int, num_processes: int, coordinator: str,
                local_devices: int, steps: int = 2) -> None:
    """The SPMD worker program (every process runs this identically).

    1. batched training window (shard_map over "data") on the
       process-spanning mesh -- one tiny image per global device;
    2. GOP dependency waves with decoded-reference exchange crossing the
       process boundary, verified against per-frame expected pixels.
    """
    init_multiprocess(coordinator, num_processes, process_id,
                      local_devices=local_devices, platform="cpu")
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_processes
    n_global = len(jax.devices())
    assert n_global == num_processes * local_devices

    from coolchic_tpu.models.frame import FrameConfig
    from coolchic_tpu.parallel.batch import (
        batched_init,
        make_batched_window,
        make_mesh,
        phase_key,
    )
    from coolchic_tpu.parallel.gop import gop_waves
    from coolchic_tpu.train.presets import TrainerPhase
    from coolchic_tpu.utils.codingstructure import CodingStructure
    from coolchic_tpu.utils.parsecli import (
        INTRA_OPERATING_POINTS,
        coolchic_config_from_args,
    )

    mesh = make_mesh(n_global, space=1)

    # --- 1. process-spanning batched training window ------------------------
    img_size = (32, 32)
    fcfg = FrameConfig(coolchic_cfg={"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], img_size)})
    phase = TrainerPhase(lmbda=1e-3, max_itr=steps, freq_valid=steps)

    params, opt = batched_init(fcfg, phase, n_global, seed=0)  # same on all hosts
    params = global_shard(params, mesh)
    opt = global_shard(opt, mesh)
    keys = global_shard(np.asarray(
        jax.random.split(jax.random.PRNGKey(7), n_global)), mesh)
    targets = global_shard(np.broadcast_to(
        np.linspace(0, 1, 32 * 32, dtype=np.float32).reshape(1, 1, 1, 32, 32),
        (n_global, 1, 3, 32, 32)).copy(), mesh)

    window = make_batched_window(fcfg, phase_key(phase), steps, mesh)
    new_params, _, _ = window(params, opt, keys, 1e-2, 0.3, 0.2, targets)
    jax.block_until_ready(new_params)
    lat0 = new_params["residue"]["latents"][0]
    assert lat0.shape[0] == n_global
    # every host checks ALL images' latents via one replicating all-gather
    lat0_rep = np.asarray(replicate(lat0, mesh))
    assert np.all(np.isfinite(lat0_rep)), "non-finite latents after DCN window"

    # --- 2. GOP waves with cross-host reference exchange --------------------
    cs = CodingStructure(n_frames=9, intra_pos=[0], p_pos=[8])
    waves = gop_waves(cs)
    assert [len(w) for w in waves] == [1, 1, 1, 2, 4]
    C, H, W = 3, 8, 8
    decoded: dict[int, np.ndarray] = {}

    @jax.jit
    def decode_wave(orders):
        # stand-in per-frame decode: pixels = display_order/8, computed ON the
        # device that owns the frame's slot (orders is "data"-sharded)
        return (orders[:, None, None, None] / 8.0) * jnp.ones((1, C, H, W))

    for wave in waves:
        orders = np.full((n_global,), -1.0, dtype=np.float32)
        for slot, f in enumerate(wave):
            orders[slot % n_global] = f.display_order
        sharded = global_shard(orders, mesh)
        dec = decode_wave(sharded)           # [n_global, C, H, W] over "data"
        rep = np.asarray(replicate(dec, mesh))  # all-gather -> every host
        for slot, f in enumerate(wave):
            # frames decoded on the OTHER host's shard must arrive bit-intact
            np.testing.assert_array_equal(
                rep[slot % n_global], np.full((C, H, W), f.display_order / 8.0,
                                              dtype=np.float32))
            decoded[f.display_order] = rep[slot % n_global]
        # references for the NEXT wave are now present on every host
        for f in wave:
            for r in f.index_references:
                assert r in decoded
    assert len(decoded) == 9
    print(f"dcn worker {process_id}/{num_processes}: OK "
          f"({n_global} global devices, {len(waves)} waves)", flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_dcn_dryrun(n_devices: int = 8, num_processes: int = 2,
                      steps: int = 2, timeout: int = 900) -> None:
    """Spawn `num_processes` worker processes (each with
    n_devices/num_processes virtual CPU devices) and run `worker_main` over
    the process-spanning mesh. Raises on any worker failure."""
    assert n_devices % num_processes == 0
    local = n_devices // num_processes
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins the platform via jax.config
    env["COOLCHIC_DCN_WORKER"] = "1"
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "coolchic_tpu.parallel.dcn",
         "--process_id", str(i), "--num_processes", str(num_processes),
         "--coordinator", f"localhost:{port}", "--local_devices", str(local),
         "--steps", str(steps)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(num_processes)]
    outs = []
    failed = False
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            failed = True
        outs.append(out)
        failed = failed or p.returncode != 0
    if failed:
        raise RuntimeError("DCN dryrun failed:\n" + "\n====\n".join(outs))
    assert all("OK" in o for o in outs), "worker did not report OK"


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--local_devices", type=int, required=True)
    ap.add_argument("--steps", type=int, default=2)
    a = ap.parse_args()
    worker_main(a.process_id, a.num_processes, a.coordinator, a.local_devices,
                steps=a.steps)


if __name__ == "__main__":
    main()
