"""Multi-chip scale-out.

Two complementary axes, matching how an overfitted codec actually scales:

1. "data": images / frames / lambda points are independent optimization
   problems, so the batched training step runs under `jax.shard_map` over the
   "data" mesh axis -- each device slice owns its images' parameters,
   optimizer state and target, with ZERO steady-state collectives. (vmap's
   conv batching lowers to grouped convolutions that GSPMD cannot partition,
   so shard_map -- local vmap per shard -- is both faster and correct.)

2. "space": large images / latent grids are sharded along H with plain GSPMD
   on the (unbatched) conv pipeline -- XLA inserts the halo exchanges for the
   conv/context windows over ICI. Exposed for the decode-side float path and
   single-image training at very high resolutions.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coolchic_tpu.models.frame import FrameConfig, frame_encoder_init
from coolchic_tpu.train.presets import TrainerPhase
from coolchic_tpu.train.soap import SoapHyperParams
from coolchic_tpu.train.train import _make_fns, init_opt_state


def make_mesh(n_devices: int | None = None, space: int = 1) -> Mesh:
    devices = np.array(jax.devices()[: n_devices or len(jax.devices())])
    data = len(devices) // space
    return Mesh(devices.reshape(data, space), axis_names=("data", "space"))


def stack_trees(trees: list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def phase_key(phase: TrainerPhase) -> tuple:
    return (phase.quantizer_noise_type, phase.quantizer_type,
            tuple(sorted(phase.dist_weight.items())), phase.lmbda,
            tuple(phase.betas_model), tuple(phase.betas_latent),
            phase.precondition_frequency_model)


def batched_init(fcfg: FrameConfig, phase: TrainerPhase, n: int, seed: int = 0):
    """Stacked params + optimizer state for n images (leading batch axis)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    params = stack_trees([frame_encoder_init(k, fcfg) for k in keys])
    hp_w = SoapHyperParams(b1=phase.betas_model[0], b2=phase.betas_model[1],
                           weight_decay=0.01,
                           precondition_frequency=phase.precondition_frequency_model,
                           max_precond_dim=256)
    hp_l = SoapHyperParams(b1=phase.betas_latent[0], b2=phase.betas_latent[1],
                           weight_decay=0.0, precondition_frequency=1, max_precond_dim=0)
    opt_single = init_opt_state(frame_encoder_init(keys[0], fcfg), hp_w, hp_l)
    opt = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(),
                                 opt_single)
    return params, opt


@lru_cache(maxsize=16)
def make_batched_window(fcfg: FrameConfig, pkey: tuple, freq_valid: int, mesh: Mesh):
    """jitted shard_map'd window: each "data" slice advances its local images
    by freq_valid training steps (local vmap inside the shard)."""
    (qnt, qt, dw, lmbda, bm, bl, pf) = pkey
    fns = _make_fns(fcfg, qnt, qt, dw, lmbda, bm, bl, pf, freq_valid, False)
    one_step = fns["plain_step"]

    def window_one(params, opt_state, key, lr, temp, noise, target):
        carry = (params, opt_state, key, lr, temp, noise, target, None, None,
                 fns["lmbda"])
        carry, _ = jax.lax.scan(one_step, carry, None, length=freq_valid)
        return carry[0], carry[1], carry[2]

    local = jax.vmap(window_one, in_axes=(0, 0, 0, None, None, None, 0))

    batched_spec = P("data")
    shmap = jax.shard_map(
        lambda p, o, k, lr, t, n, tg: local(p, o, k, lr[0], t[0], n[0], tg),
        mesh=mesh,
        in_specs=(batched_spec, batched_spec, batched_spec, P("space"), P("space"),
                  P("space"), batched_spec),
        out_specs=(batched_spec, batched_spec, batched_spec),
        check_vma=False,
    )

    def fn(params, opt, keys, lr, temp, noise, targets):
        space = mesh.shape["space"]
        lr = jnp.broadcast_to(jnp.float32(lr), (space,))
        temp = jnp.broadcast_to(jnp.float32(temp), (space,))
        noise = jnp.broadcast_to(jnp.float32(noise), (space,))
        return shmap(params, opt, keys, lr, temp, noise, targets)

    return jax.jit(fn)


def shard_batch(tree, mesh: Mesh):
    """Place a stacked pytree on the mesh, batch axis over "data"."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


@lru_cache(maxsize=16)
def make_spatial_synthesis(fcfg: FrameConfig, mesh: Mesh):
    """Single-image decode-side float path (upsampling + synthesis) with the
    image and full-resolution latent sharded along H over the whole mesh --
    GSPMD inserts the conv halo exchanges."""
    from coolchic_tpu.models.frame import frame_encoder_forward

    @jax.jit
    def fn(params):
        out = frame_encoder_forward(params, fcfg, training=False)
        return out.decoded_image

    def run(params):
        n = mesh.devices.size
        flat_mesh = Mesh(mesh.devices.reshape(-1), ("cells",))

        def place(path, x):
            ks = jax.tree_util.keystr(path)
            if "latents" in ks and x.ndim == 2 and x.shape[0] % n == 0:
                return jax.device_put(x, NamedSharding(flat_mesh, P("cells", None)))
            return jax.device_put(x, NamedSharding(flat_mesh, P()))

        params = jax.tree_util.tree_map_with_path(place, params)
        return fn(params)

    return run
