"""Spatial (H) sharding of ONE large image over the chip mesh.

For very high resolutions (2K/4K), a single image's latent pyramid, target
and every conv/context activation shard along the image-height axis with
plain GSPMD: XLA inserts the halo exchanges for the 9x9 ARM context
extraction, the synthesis convs and the upsampling kernels over ICI, and
psums the rate/distortion reductions. Parameters (the tiny NNs) stay
replicated. This is the "long-context analog" of SURVEY.md section 5: the
scale axis is resolution, the collective is a halo.

Verified (tests/test_spatial.py) against the single-device path: training
losses match to f32 reduction tolerance and the decode-side float output
matches elementwise.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coolchic_tpu.models.frame import FrameConfig
from coolchic_tpu.train.train import _make_fns, init_opt_state


def space_submesh(mesh: Mesh) -> Mesh:
    """Flatten every device of (data, space) into one 'space' axis (a single
    big image uses the whole slice)."""
    return Mesh(mesh.devices.reshape(-1), axis_names=("space",))


def shard_spatial(tree, mesh: Mesh, img_size: tuple[int, int] | None = None):
    """Place a frame-encoder pytree (or target image) for spatial training:
    every array whose second-to-last dim is a divisible H gets P(..., 'space',
    None) on that axis; everything else is replicated. Latent grids are
    [H_i, W_i]; targets are [1, C, H, W]."""
    n = mesh.devices.size

    def place(path, x):
        ks = jax.tree_util.keystr(path)
        # shard only grids with >= 4 rows per device: thinner slices are all
        # halo (9x9 context = 4-row halos), and the deep-pyramid tail's tiny
        # gradients otherwise inherit degenerate shardings that force GSPMD
        # into involuntary full rematerialization on the upsampling einsums
        if (hasattr(x, "ndim") and x.ndim >= 2 and x.shape[-2] % n == 0
                and x.shape[-2] // n >= 4 and ("latents" in ks or x.ndim == 4)):
            spec = P(*([None] * (x.ndim - 2) + ["space", None]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_target(target, mesh: Mesh):
    n = mesh.devices.size
    if isinstance(target, dict):
        return {k: jax.device_put(
            v, NamedSharding(mesh, P(None, None, "space", None))
            if v.shape[-2] % n == 0 else NamedSharding(mesh, P()))
            for k, v in target.items()}
    spec = P(None, None, "space", None) if target.shape[-2] % n == 0 else P()
    return jax.device_put(target, NamedSharding(mesh, spec))


@lru_cache(maxsize=8)
def make_spatial_train(fcfg: FrameConfig, pkey: tuple, mesh: Mesh,
                       freq_valid: int = 16):
    """(window, eval, prepare): one spatially-sharded image's training window
    (freq_valid SOAP steps as a scan) and eval. GSPMD propagates the H
    sharding from the latent/target placements through the whole graph."""
    (qnt, qt, dw, lmbda, bm, bl, pf) = pkey
    fns = _make_fns(fcfg, qnt, qt, dw, lmbda, bm, bl, pf, freq_valid, False)

    def prepare(params, target, seed: int = 0):
        opt = init_opt_state(params, fns["hp_weight"], fns["hp_latent"])
        params = shard_spatial(params, mesh)
        opt = shard_spatial(opt, mesh)
        target = shard_target(target, mesh)
        key = jax.device_put(jax.random.PRNGKey(seed),
                             NamedSharding(mesh, P()))
        return params, opt, target, key

    def window(params, opt, key, target, lr, temp, noise, length=freq_valid):
        # ambient mesh so the model can pin pyramid intermediates to
        # explicit shardings (models/upsampling.py:_pin_spatial)
        with jax.set_mesh(mesh):
            return fns["train_window"](params, opt, key, jnp.float32(lr),
                                       jnp.float32(temp), jnp.float32(noise),
                                       target, None, None, length=length)

    def evaluate(params, target):
        with jax.set_mesh(mesh):
            return fns["eval_fn"](params, target, None, None)

    return window, evaluate, prepare
