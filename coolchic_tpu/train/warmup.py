"""Warm-up: a candidate tournament over differently-seeded initializations.

Each phase briefly trains the surviving candidates, ranks them by loss and
prunes to the next phase's candidate count; the winner seeds the main
training. Reference parity: coolchic/training/warmup.py -- except that the
reference trains candidates serially while `warmup_batched` trains ALL of
them as one vmapped program (a TPU keeps 5 candidate codecs busy as a batch
for roughly the cost of one).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from coolchic_tpu.models.frame import FrameConfig
from coolchic_tpu.train.loss import dist_to_db
from coolchic_tpu.train.presets import Preset
from coolchic_tpu.train.train import (
    EncoderMonitor,
    _make_fns,
    init_opt_state,
    test,
    train,
)


def _stack(trees: list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _index(tree, i: int):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def _train_phase_batched(stacked, n: int, ph, fcfg: FrameConfig, target, refs, cr,
                         key, monitor: EncoderMonitor):
    """One warm-up phase for a stack of n candidates as a vmapped jitted
    program; returns (best_params_stacked, best_losses [n])."""
    fns = _make_fns(
        fcfg, ph.quantizer_noise_type, ph.quantizer_type,
        tuple(sorted(ph.dist_weight.items())), ph.lmbda,
        tuple(ph.betas_model), tuple(ph.betas_latent),
        ph.precondition_frequency_model, ph.freq_valid, refs is not None)

    # Eager, once per phase: hoists the wasserstein target-feature pyramid
    # out of every step (identity for mse-only phases).
    target = fns["prep_target"](target)

    single = _index(stacked, 0)
    opt1 = init_opt_state(single, fns["hp_weight"], fns["hp_latent"])
    opt = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), opt1)

    keys = jax.random.split(key, n)
    pf = fns["pf"]

    def window_one(params, opt_state, k, length_blocks, rem):
        carry = (params, opt_state, k, jnp.float32(ph.lr),
                 jnp.float32(ph.softround_temperature[0]),
                 jnp.float32(ph.noise_parameter[0]), target, refs, cr,
                 fns["lmbda"])
        if length_blocks > 0:
            carry, _ = jax.lax.scan(fns["block"], carry, None, length=length_blocks)
        if rem > 0:
            carry, _ = jax.lax.scan(fns["plain_step"], carry, None, length=rem)
        return carry[0], carry[1], carry[2]

    # Donating params/opt lets XLA reuse their buffers across windows --
    # together with candidate chunking this is what keeps the batched
    # warm-up inside HBM at flagship sizes.
    window_b = jax.jit(jax.vmap(window_one, in_axes=(0, 0, 0, None, None)),
                       static_argnums=(3, 4), donate_argnums=(0, 1))
    eval_b = jax.jit(jax.vmap(lambda p: fns["eval_fn"](p, target, refs, cr)))

    best_loss = jnp.asarray(eval_b(stacked).loss)
    # `stacked` is DONATED to window_b below; on backends that honor donation
    # (TPU) the original buffers are deleted by the first window, so the best
    # snapshot must own copies -- aliasing here reads deleted arrays.
    best_params = jax.tree_util.tree_map(jnp.copy, stacked)

    cnt = 0
    n_windows = math.ceil(ph.max_itr / ph.freq_valid)
    for _ in range(n_windows):
        n_steps = min(ph.freq_valid, ph.max_itr - cnt)
        stacked, opt, keys = window_b(stacked, opt, keys,
                                      n_steps // pf, n_steps % pf)
        cnt += n_steps
        monitor.iterations_counter += n_steps * n
        lo = eval_b(stacked)
        improved = lo.loss < best_loss
        best_loss = jnp.where(improved, lo.loss, best_loss)
        best_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                improved.reshape((n,) + (1,) * (new.ndim - 1)), new, old),
            stacked, best_params)
    return best_params, best_loss


def candidate_chunk_size(n_pixels: int, n_candidates: int) -> int:
    """How many candidates train together in one vmapped program. The
    COOLCHIC_WARMUP_BATCH_PX budget (pixels x candidates) bounds activation
    memory; instead of falling back to the sequential tournament above the
    budget (the round-1 behavior), the batch is CHUNKED -- equal-size chunks
    reuse one compiled program and each chunk stays inside the budget."""
    import os

    budget = int(os.environ.get("COOLCHIC_WARMUP_BATCH_PX", 1_500_000))
    per = max(1, budget // max(n_pixels, 1))
    return max(1, min(per, n_candidates))


def warmup_batched(candidates: list[dict], preset: Preset, fcfg: FrameConfig, target, *,
                   refs=None, cr=None, key: Optional[jax.Array] = None,
                   monitor: Optional[EncoderMonitor] = None,
                   verbose: bool = False) -> dict:
    """All surviving candidates advance together through each warm-up phase
    as one vmapped jitted program (chunked to the activation-memory budget);
    per-candidate best snapshots are kept via masked tree updates between
    validation windows."""
    key = key if key is not None else jax.random.PRNGKey(1)
    monitor = monitor or EncoderMonitor()
    n = len(candidates)
    stacked = _stack(candidates)
    order = list(range(n))  # candidate ids, sorted by current loss

    n_pixels = fcfg.cc_cfgs["residue"].img_size[0] * fcfg.cc_cfgs["residue"].img_size[1]

    for idx_phase, wu_phase in enumerate(preset.warmup.phases):
        ph = wu_phase.training_phase
        keep = wu_phase.candidates
        if keep < n:
            keep_ids = order[:keep]
            stacked = jax.tree_util.tree_map(
                lambda x: x[jnp.asarray(keep_ids)], stacked)
            n = keep
            order = list(range(n))

        chunk = candidate_chunk_size(n_pixels, n)
        parts_params, parts_loss = [], []
        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            sub_tree = jax.tree_util.tree_map(lambda x: x[c0:c1], stacked)
            key, sub = jax.random.split(key)
            bp, bl = _train_phase_batched(sub_tree, c1 - c0, ph, fcfg, target,
                                          refs, cr, sub, monitor)
            parts_params.append(bp)
            parts_loss.append(bl)
        if len(parts_params) == 1:
            stacked, best_loss = parts_params[0], parts_loss[0]
        else:
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *parts_params)
            best_loss = jnp.concatenate(parts_loss)

        losses = [float(v) for v in best_loss]
        rank = sorted(range(n), key=lambda i: losses[i])
        stacked = jax.tree_util.tree_map(lambda x: x[jnp.asarray(rank)], stacked)
        order = list(range(n))
        if verbose:
            ranked = ", ".join(f"{losses[i] * 1e3:.4f}" for i in rank)
            chunk_note = f" (chunks of {chunk})" if chunk < n else ""
            print(f"  warmup phase {idx_phase}: candidate losses (1e-3) "
                  f"[{ranked}]{chunk_note}", flush=True)

    return _index(stacked, 0)


def warmup(candidates: list[dict], preset: Preset, fcfg: FrameConfig, target, *,
           refs=None, cr=None, key: Optional[jax.Array] = None,
           monitor: Optional[EncoderMonitor] = None, verbose: bool = False,
           spatial_mesh=None) -> dict:
    key = key if key is not None else jax.random.PRNGKey(1)
    monitor = monitor or EncoderMonitor()
    ranked = [{"id": i, "params": p, "loss": None} for i, p in enumerate(candidates)]

    for idx_phase, wu_phase in enumerate(preset.warmup.phases):
        ranked = ranked[: wu_phase.candidates]
        for cand in ranked:
            key, sub = jax.random.split(key)
            cand["params"] = train(cand["params"], fcfg, target, wu_phase.training_phase,
                                   refs=refs, cr=cr, key=sub, monitor=monitor,
                                   spatial_mesh=spatial_mesh)
            logs = test(cand["params"], fcfg, target, refs=refs, cr=cr,
                        dist_weight=wu_phase.training_phase.dist_weight,
                        lmbda=wu_phase.training_phase.lmbda)
            cand["loss"] = logs.loss
            if verbose:
                print(f"  warmup phase {idx_phase} candidate {cand['id']}: "
                      f"loss {logs.loss * 1e3:.4f} psnr {logs.psnr_db:.3f} "
                      f"bpp {logs.total_rate_latent_bpp:.4f}", flush=True)
        ranked.sort(key=lambda c: c["loss"])

    return ranked[0]["params"]
