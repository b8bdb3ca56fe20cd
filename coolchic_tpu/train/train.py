"""The overfitting training loop (the "encoder").

TPU-first structure: the inner loop over `freq_valid` iterations is one
jitted `lax.scan` (forward, backward, gradient clip, SOAP/Adam update), so a
whole validation window runs on-device with zero host round-trips. The host
only sees one eval per window and runs the patience / best-snapshot / cosine
LR logic there (snapshots are free thanks to immutable arrays).

Reference parity: coolchic/training/train.py (per-group optimizers, cosine
LR stepping once per validation, linear temperature & noise schedules,
patience that reloads the best model when schedule_lr is on).
"""

from __future__ import annotations

import math
import os
import time

import numpy as np
from contextlib import contextmanager
from dataclasses import dataclass, field, replace
from functools import lru_cache
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from coolchic_tpu.models.frame import FrameConfig, frame_encoder_forward
from coolchic_tpu.train.loss import LossOutput, dist_to_db, loss_function
from coolchic_tpu.train.params import FROZEN, LATENT, WEIGHT, group_tree
from coolchic_tpu.train.presets import TrainerPhase
from coolchic_tpu.train.soap import (
    SoapHyperParams,
    soap_init_from_grad_leaf,
    soap_init_leaf,
    soap_step_leaf,
)

ETA_MIN = 1e-5


def linear_schedule(initial_final: tuple[float, float], cur_itr: float, max_itr: float) -> float:
    initial, final = initial_final
    return cur_itr * (final - initial) / max_itr + initial


def cosine_lr(lr0: float, t: int, t_max: float) -> float:
    if t_max <= 0:
        return lr0
    return ETA_MIN + (lr0 - ETA_MIN) * (1 + math.cos(math.pi * t / t_max)) / 2


class EncoderLogs(NamedTuple):
    loss: float
    dist: float
    psnr_db: float
    total_rate_latent_bpp: float
    rate_bpp: float


@dataclass
class EncoderMonitor:
    """Per-encode bookkeeping (reference utils/misc.py TrainingExitCode /
    training timing prints): iteration counts, wall-clock per pipeline phase,
    and the chip's peak HBM use when the backend reports it."""

    total_training_time_sec: float = 0.0
    iterations_counter: int = 0
    phase_time_sec: dict = field(default_factory=dict)
    peak_device_bytes: int = 0

    @contextmanager
    def timed(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.phase_time_sec[name] = self.phase_time_sec.get(name, 0.0) + dt
            self.sample_device_memory()

    def sample_device_memory(self):
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = int(stats.get("peak_bytes_in_use", 0))
            self.peak_device_bytes = max(self.peak_device_bytes, peak)
        except Exception:
            pass  # backend without memory_stats (e.g. remote tunnel)

    def report(self) -> str:
        total = sum(self.phase_time_sec.values())
        lines = [f"  {k:<18} {v:8.1f}s ({100 * v / total:4.1f}%)"
                 for k, v in self.phase_time_sec.items()]
        if self.peak_device_bytes:
            lines.append(f"  peak device mem    {self.peak_device_bytes / 2**20:.0f} MiB")
        lines.append(f"  iterations         {self.iterations_counter}")
        return "\n".join(lines)


# ---------------------------------------------------------------------------
# Jitted building blocks (cached per (fcfg, phase knobs)).
# ---------------------------------------------------------------------------
def _make_fns(fcfg: FrameConfig, quantizer_noise_type: str, quantizer_type: str,
              dist_weight: tuple, lmbda: float,
              betas_model: tuple, betas_latent: tuple,
              precondition_frequency_model: int, freq_valid: int, has_refs: bool):
    """Jitted training/eval builders. lambda is a TRACED scalar inside the
    graphs (appended to the scan carry), so one XLA compile serves every
    rate point -- the lambda passed here is only bound into the returned
    convenience wrappers."""
    impl = _make_fns_impl(fcfg, quantizer_noise_type, quantizer_type, dist_weight,
                          betas_model, betas_latent, precondition_frequency_model,
                          freq_valid, has_refs)
    lam = jnp.float32(lmbda)

    def train_window(params, opt_state, key, lr, temp, noise, target, refs, cr,
                     length=freq_valid):
        return impl["train_window"](params, opt_state, key, lr, temp, noise,
                                    target, refs, cr, lam, length=length)

    def eval_fn(params, target, refs, cr):
        return impl["eval_fn"](params, target, refs, cr, lam)

    def grad_fn(params, key, temp, noise, target, refs, cr):
        return impl["grad_fn"](params, key, temp, noise, target, refs, cr, lam)

    out = dict(impl)
    out["train_window"] = train_window
    out["eval_fn"] = eval_fn
    # λ-traced eval (pre-bind form): lets batched callers pass a PER-IMAGE
    # λ vector (the Kodak 24x5 sweep batches across rate points too).
    out["eval_fn_lam"] = impl["eval_fn"]
    out["grad_fn"] = grad_fn
    out["grad_fn_lam"] = impl["grad_fn"]
    out["lmbda"] = lam
    return out


@lru_cache(maxsize=64)
def _make_fns_impl(fcfg: FrameConfig, quantizer_noise_type: str, quantizer_type: str,
                   dist_weight: tuple,
                   betas_model: tuple, betas_latent: tuple,
                   precondition_frequency_model: int, freq_valid: int, has_refs: bool):
    dist_weight_d = dict(dist_weight)

    hp_weight = SoapHyperParams(
        b1=betas_model[0], b2=betas_model[1], weight_decay=0.01,
        precondition_frequency=precondition_frequency_model, max_precond_dim=256)
    hp_latent = SoapHyperParams(
        b1=betas_latent[0], b2=betas_latent[1], weight_decay=0.0,
        precondition_frequency=1, max_precond_dim=0)

    wd_feats_fn = None
    if "wasserstein" in dist_weight_d:
        from coolchic_tpu.train.wasserstein import vgg16_features, wasserstein_distortion

        def wd_feats_fn(decoded, tfeats):  # noqa: F811
            dist = 0.0
            for fa, fb in zip(vgg16_features(decoded), tfeats):
                dist = dist + wasserstein_distortion(fa, fb)
            return dist

    def prep_target(target):
        """Hoist the target's (constant) VGG feature pyramid OUT of the
        training scan: the carried target becomes (image, features) and each
        step reuses the features instead of re-running VGG16 on the target
        every iteration. Identity when wasserstein is off."""
        if wd_feats_fn is None or isinstance(target, tuple):
            return target
        from coolchic_tpu.train.wasserstein import vgg16_features

        return (target, tuple(jax.lax.stop_gradient(f)
                              for f in vgg16_features(target)))

    def _unpack_target(target):
        if wd_feats_fn is None:
            return target, None
        if isinstance(target, tuple):
            return target
        return prep_target(target)

    def loss_of(params, key, temp, noise, target, refs, cr, lmbda):
        timg, tfeats = _unpack_target(target)
        wfn = ((lambda dec, _t: wd_feats_fn(dec, tfeats))
               if wd_feats_fn is not None else None)
        out = frame_encoder_forward(
            params, fcfg, reference_frames=refs, key=key,
            quantizer_noise_type=quantizer_noise_type, quantizer_type=quantizer_type,
            soft_round_temperature=temp, noise_parameter=noise, training=True, cr=cr)
        lo = loss_function(out.decoded_image, out.rate, timg, dist_weight_d, lmbda,
                           wasserstein_fn=wfn)
        return lo.loss

    grad_fn = jax.grad(loss_of)

    def _make_step(refresh: bool):
        def one_step(carry, _):
            params, opt_state, key, lr, temp, noise, target, refs, cr, lmbda = carry
            key, sub = jax.random.split(key)
            grads = grad_fn(params, sub, temp, noise, target, refs, cr, lmbda)

            leaves_p, treedef = jax.tree_util.tree_flatten(params)
            groups = group_tree(params)
            leaves_g = treedef.flatten_up_to(grads)
            leaves_s = treedef.flatten_up_to(opt_state)

            # Global-norm clip of the WEIGHT group at 0.1 (reference train.py:228).
            sq = sum(jnp.sum(jnp.square(g))
                     for g, grp in zip(leaves_g, groups) if grp == WEIGHT)
            norm = jnp.sqrt(sq)
            clip = jnp.minimum(1.0, 0.1 / (norm + 1e-6))
            new_p, new_s = [], []
            for p, g, s, grp in zip(leaves_p, leaves_g, leaves_s, groups):
                if grp == FROZEN or s is None:
                    new_p.append(p)
                    new_s.append(s)
                    continue
                if grp == WEIGHT:
                    p2, s2 = soap_step_leaf(g * clip, s, p, lr, hp_weight,
                                            refresh=refresh)
                else:
                    p2, s2 = soap_step_leaf(g, s, p, lr, hp_latent, refresh=False)
                new_p.append(p2)
                new_s.append(s2)
            params = jax.tree_util.tree_unflatten(treedef, new_p)
            opt_state = jax.tree_util.tree_unflatten(treedef, new_s)
            return (params, opt_state, key, lr, temp, noise, target, refs, cr,
                    lmbda), None

        return one_step

    plain_step = _make_step(False)
    refresh_step = _make_step(True)
    pf = max(precondition_frequency_model, 1)

    def _block(carry, _):
        # (pf - 1) plain steps followed by one eigenbasis-refresh step: the
        # QR refresh lands on every pf-th step with NO lax.cond in the graph.
        if pf > 1:
            carry, _ = jax.lax.scan(plain_step, carry, None, length=pf - 1)
        carry, _ = refresh_step(carry, None)
        return carry, None

    from functools import partial

    @partial(jax.jit, static_argnames="length")
    def train_window(params, opt_state, key, lr, temp, noise, target, refs, cr,
                     lmbda, length=freq_valid):
        carry = (params, opt_state, key, lr, temp, noise, prep_target(target),
                 refs, cr, lmbda)
        n_blocks, rem = divmod(length, pf)
        if n_blocks > 0:
            carry, _ = jax.lax.scan(_block, carry, None, length=n_blocks)
        if rem > 0:
            carry, _ = jax.lax.scan(plain_step, carry, None, length=rem)
        return carry[0], carry[1], carry[2]

    @jax.jit
    def eval_fn(params, target, refs, cr, lmbda):
        timg, tfeats = _unpack_target(target)
        wfn = ((lambda dec, _t: wd_feats_fn(dec, tfeats))
               if wd_feats_fn is not None else None)
        out = frame_encoder_forward(params, fcfg, reference_frames=refs,
                                    training=False, cr=cr)
        return loss_function(out.decoded_image, out.rate, timg, dist_weight_d, lmbda,
                             wasserstein_fn=wfn)

    return {"train_window": train_window, "eval_fn": eval_fn,
            "grad_fn": jax.jit(grad_fn),
            "hp_weight": hp_weight, "hp_latent": hp_latent,
            "plain_step": plain_step, "block": _block, "pf": pf,
            "prep_target": prep_target}


def init_opt_state(params, hp_weight: SoapHyperParams, hp_latent: SoapHyperParams):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    groups = group_tree(params)
    states = []
    for p, grp in zip(leaves, groups):
        if grp == FROZEN:
            states.append(None)
        elif grp == WEIGHT:
            states.append(soap_init_leaf(p, hp_weight))
        else:
            states.append(soap_init_leaf(p, hp_latent))
    return jax.tree_util.tree_unflatten(treedef, states)


def seed_opt_state(params, opt_state, grads, hp_weight: SoapHyperParams):
    """Reference SOAP first-step semantics (training/soap.py:163-182):
    seed each WEIGHT leaf's GG with its first gradient and set Q to the
    eigh eigenbasis; no parameter update. The eigh runs on the host
    (soap_init_from_grad_leaf); only the small weight-leaf gradients are
    fetched -- latent gradients never leave the device."""
    _, treedef = jax.tree_util.tree_flatten(params)
    groups = group_tree(params)
    leaves_s = treedef.flatten_up_to(opt_state)
    leaves_g = treedef.flatten_up_to(grads)
    out = []
    for s, g, grp in zip(leaves_s, leaves_g, groups):
        if grp == WEIGHT and s is not None:
            out.append(soap_init_from_grad_leaf(np.asarray(g), s, hp_weight))
        else:
            out.append(s)
    return jax.tree_util.tree_unflatten(treedef, out)


def logs_from_loss(lo: LossOutput) -> EncoderLogs:
    return EncoderLogs(
        loss=float(lo.loss), dist=float(lo.dist), psnr_db=dist_to_db(float(lo.mse)),
        total_rate_latent_bpp=float(lo.total_rate_latent_bpp), rate_bpp=float(lo.rate_bpp))


def test(params, fcfg: FrameConfig, target, refs=None, cr=None,
         dist_weight: Optional[Dict[str, float]] = None, lmbda: float = 1e-3) -> EncoderLogs:
    dist_weight = dist_weight or {"mse": 1.0}
    eval_fn = _make_fns(
        fcfg, "none", "hardround", tuple(sorted(dist_weight.items())), lmbda,
        (0.95, 0.95), (0.9, 0.999), 10, 1, refs is not None)["eval_fn"]
    return logs_from_loss(eval_fn(params, target, refs, cr))


def train(params: dict, fcfg: FrameConfig, target, phase: TrainerPhase, *,
          refs=None, cr=None, key: Optional[jax.Array] = None,
          monitor: Optional[EncoderMonitor] = None, verbose: bool = False,
          spatial_mesh=None) -> dict:
    """Run one training phase; returns the best parameters found.

    `spatial_mesh` (optional 1-axis "space" Mesh): shard THIS image's
    latents/target/activations along H over the mesh (parallel/spatial.py
    placements); GSPMD inserts the conv/context halo exchanges and psums the
    reductions, so the same jitted window serves both layouts. For 2K/4K
    frames whose activations exceed one chip's HBM (SURVEY.md §7.8a)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    monitor = monitor or EncoderMonitor()
    start_time = time.time()

    fns = _make_fns(
        fcfg, phase.quantizer_noise_type, phase.quantizer_type,
        tuple(sorted(phase.dist_weight.items())), phase.lmbda,
        tuple(phase.betas_model), tuple(phase.betas_latent),
        phase.precondition_frequency_model, phase.freq_valid, refs is not None)
    train_window, eval_fn = fns["train_window"], fns["eval_fn"]
    if spatial_mesh is not None:
        # ambient mesh during trace so the model pins pyramid intermediates
        # to explicit shardings (models/upsampling.py:_pin_spatial)
        import functools

        def _with_mesh(f):
            @functools.wraps(f)
            def g(*a, **kw):
                with jax.set_mesh(spatial_mesh):
                    return f(*a, **kw)
            return g

        train_window, eval_fn = _with_mesh(train_window), _with_mesh(eval_fn)

    opt_state = init_opt_state(params, fns["hp_weight"], fns["hp_latent"])

    # Reference parity: seed the SOAP eigenbases from the first gradient
    # (one extra grad eval; the phase's own first step then uses a fresh
    # gradient, exactly like the reference's skipped first step).
    if os.environ.get("COOLCHIC_SOAP_SEED", "1") != "0":
        key, sub = jax.random.split(key)
        temp0 = linear_schedule(phase.softround_temperature, 0, phase.max_itr)
        noise0 = linear_schedule(phase.noise_parameter, 0, phase.max_itr)
        grads0 = fns["grad_fn"](params, sub, jnp.float32(temp0),
                                jnp.float32(noise0), target, refs, cr)
        opt_state = seed_opt_state(params, opt_state, grads0, fns["hp_weight"])

    if spatial_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from coolchic_tpu.parallel.spatial import shard_spatial, shard_target

        params = shard_spatial(params, spatial_mesh)
        opt_state = shard_spatial(opt_state, spatial_mesh)
        target = shard_target(target, spatial_mesh)
        if refs is not None:
            refs = [shard_target(r, spatial_mesh) for r in refs]
        if cr is not None:
            cr = jax.tree_util.tree_map(
                lambda g: jax.device_put(g, NamedSharding(spatial_mesh, P())), cr)
        key = jax.device_put(key, NamedSharding(spatial_mesh, P()))

    best = logs_from_loss(eval_fn(params, target, refs, cr))
    initial = best
    best_params = params

    n_windows = math.ceil(phase.max_itr / phase.freq_valid)
    t_max = phase.max_itr / phase.freq_valid
    patience_windows = max(phase.patience // phase.freq_valid, 1)

    cnt = 0
    windows_since_record = 0
    for w_idx in range(n_windows):
        if windows_since_record > patience_windows:
            if phase.schedule_lr:
                params = best_params
                windows_since_record = 0
            else:
                break

        lr = cosine_lr(phase.lr, w_idx, t_max) if phase.schedule_lr else phase.lr
        temp = linear_schedule(phase.softround_temperature, cnt, phase.max_itr)
        noise = linear_schedule(phase.noise_parameter, cnt, phase.max_itr)

        n_steps = min(phase.freq_valid, phase.max_itr - cnt)
        params, opt_state, key = train_window(
            params, opt_state, key, jnp.float32(lr), jnp.float32(temp),
            jnp.float32(noise), target, refs, cr, length=n_steps)
        cnt += n_steps
        monitor.iterations_counter += n_steps

        logs = logs_from_loss(eval_fn(params, target, refs, cr))
        if logs.loss < best.loss:
            best = logs
            best_params = params
            windows_since_record = 0
        else:
            windows_since_record += 1

        if verbose:
            print(f"  itr {cnt:>6} loss {logs.loss * 1e3:9.4f} "
                  f"psnr {logs.psnr_db:7.3f} bpp {logs.total_rate_latent_bpp:7.4f} "
                  f"lr {lr:.5f} temp {temp:.3f} noise {noise:.3f}"
                  + ("  *" if logs.loss == best.loss else ""), flush=True)

    monitor.total_training_time_sec += time.time() - start_time
    if verbose:
        print(f"  phase done: loss {initial.loss * 1e3:.4f} -> {best.loss * 1e3:.4f} "
              f"({best.psnr_db:.3f} dB, {best.total_rate_latent_bpp:.4f} bpp)", flush=True)
    return best_params
