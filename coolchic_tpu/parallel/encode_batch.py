"""Batch image encoding: many images as ONE jitted training program.

The overfitting encoder is embarrassingly parallel across images (each image
owns its params/optimizer/target), so a whole dataset sweep -- e.g. the
24-image Kodak set x 5 lambda points behind `results/v5.0/image-kodak.tsv` --
maps onto a chip as a vmapped batch and onto a pod slice as `shard_map` over
the "data" mesh axis with ZERO steady-state collectives. The reference
encodes one image per process and schedules them with slurm `afterok` chains
(reference samples/encode.py:147-183, _getcodingstruct.py:17-91); here the
batch IS the program.

Pipeline per phase (mirrors train.train, vectorized over images):
  window (freq_valid steps, scan of SOAP blocks) -> batched eval ->
  per-image best-snapshot masked update -> per-image patience reload.
Warm-up runs every candidate as a batched pass over all images and keeps the
per-image argmin. NN quantization + bitstream write then run per image on
the host (cheap next to training).
"""

from __future__ import annotations

import math
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.bitstream.encode import encode_frame
from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.io.framedata import FrameData
from coolchic_tpu.models.frame import FrameConfig, frame_cr_grids, frame_encoder_init
from coolchic_tpu.nnquant.quantize import quantize_coolchic
from coolchic_tpu.train.encode import _target_from_frame, img_min_max
from coolchic_tpu.train.presets import Preset
from coolchic_tpu.train.train import (
    EncoderMonitor,
    _make_fns,
    cosine_lr,
    linear_schedule,
    logs_from_loss,
    test,
)
from coolchic_tpu.utils.codingstructure import CodingStructure


def _stack(trees: list):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _index(tree, i: int):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def _select(mask_b, new, old):
    """Per-image masked pytree update (mask over the leading batch axis)."""
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(mask_b.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
        new, old)


def _make_batched(fns, mesh):
    """vmapped (and optionally shard_map'd over mesh axis "data") window and
    eval over the image batch. The window's step counts are STATIC (they pick
    the scan lengths), so `window` is jitted with them as static args and the
    mapped closure captures them.

    `refs` rides the batch axis as a pytree (a list of [n, 1, C, H, W]
    stacked reference frames for inter-frame slots; None — a leafless
    pytree, so the same in_axes work — for intra batches)."""
    from functools import partial

    def make_window_v(n_blocks, rem):
        def window_one(params, opt_state, k, target, refs, lam, lr, temp, noise):
            carry = (params, opt_state, k, lr, temp, noise, target, refs, None,
                     lam)
            if n_blocks > 0:
                carry, _ = jax.lax.scan(fns["block"], carry, None, length=n_blocks)
            if rem > 0:
                carry, _ = jax.lax.scan(fns["plain_step"], carry, None, length=rem)
            return carry[0], carry[1], carry[2]

        # noise rides the batch axis too: warm-up noise is λ-derived per
        # slot (reference training/presets.py:311), and mixed-λ chunks give
        # each slot its own level
        return jax.vmap(window_one, in_axes=(0, 0, 0, 0, 0, 0, None, None, 0))

    # λ rides the batch axis: the sweep batches across images AND rate points
    # with one compile (λ is traced in the carry, train.py:_make_fns).
    eval_v = jax.vmap(
        lambda p, t, refs, lam: fns["eval_fn_lam"](p, t, refs, None, lam))

    def _fused_update(eval_fn):
        # eval + per-image best-snapshot as ONE device call: the unjitted
        # tree_map/where variant issued ~2 small remote launches per leaf
        # per window (~10 s/window over the tunnel, dwarfing the 0.3 s eval).
        # best_params/best_loss are donated -- they are replaced every call.
        from functools import partial as _partial

        @_partial(jax.jit, donate_argnums=(4, 5))
        def eval_update(p, t, refs, lam, best_params, best_loss):
            lo = eval_fn(p, t, refs, lam)
            improved = lo.loss < best_loss
            new_best = _select(improved, p, best_params)
            return new_best, jnp.where(improved, lo.loss, best_loss), improved, lo

        return eval_update

    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P

        b = P("data")

        @partial(jax.jit, static_argnums=(9, 10))
        def window(p, o, k, t, refs, lam, lr, temp, noise, n_blocks, rem):
            wm = jax.shard_map(
                make_window_v(n_blocks, rem), mesh=mesh,
                in_specs=(b, b, b, b, b, b, P(), P(), b),
                out_specs=(b, b, b), check_vma=False)
            return wm(p, o, k, t, refs, lam, jnp.float32(lr), jnp.float32(temp),
                      jnp.asarray(noise, jnp.float32))

        eval_m = jax.shard_map(eval_v, mesh=mesh, in_specs=(b, b, b, b),
                               out_specs=b, check_vma=False)
        return window, jax.jit(eval_m), _fused_update(eval_m)

    # donate params/opt/keys: the window consumes and replaces them, so XLA
    # reuses their HBM instead of holding both generations live (the batch
    # size is activation+state bound)
    @partial(jax.jit, static_argnums=(9, 10), donate_argnums=(0, 1, 2))
    def window(p, o, k, t, refs, lam, lr, temp, noise, n_blocks, rem):
        return make_window_v(n_blocks, rem)(p, o, k, t, refs, lam,
                                            jnp.float32(lr), jnp.float32(temp),
                                            jnp.asarray(noise, jnp.float32))

    return window, jax.jit(eval_v), _fused_update(eval_v)


def _batched_phase(params_b, targets_b, fcfg, phase, key, mesh, monitor, verbose,
                   lmbda_b=None, noise_b=None, refs_b=None, keys_b=None):
    """One training phase over the image batch; returns best params per image.
    `lmbda_b` (optional [n] vector) gives each batch slot its own rate point —
    λ is traced, so mixed-λ batches share one compile. `noise_b` (optional
    [n, 2] (start, end) rows) overrides phase.noise_parameter per slot, so
    mixed-λ warm-up keeps the reference's λ-derived noise level per slot.
    `refs_b` (optional list of [n, 1, C, H, W]) gives each slot its decoded
    reference frames — inter-frame slots of one GOP wave batch together.
    `keys_b` (optional [n, 2] uint32) pins each slot's PRNG key: the GOP wave
    path passes per-FRAME keys so a frame trains with the same key stream
    whether it rides a wave batch or the serial (n=1) path."""
    from coolchic_tpu.train.train import init_opt_state

    n = targets_b.shape[0] if not isinstance(targets_b, dict) \
        else next(iter(targets_b.values())).shape[0]
    if lmbda_b is None:
        lmbda_b = jnp.full((n,), phase.lmbda, dtype=jnp.float32)
    else:
        lmbda_b = jnp.asarray(lmbda_b, dtype=jnp.float32)
    if noise_b is None:
        noise_b = np.tile(np.asarray(phase.noise_parameter, np.float32), (n, 1))
    else:
        noise_b = np.asarray(noise_b, np.float32).reshape(n, 2)
    fns = _make_fns(
        fcfg, phase.quantizer_noise_type, phase.quantizer_type,
        tuple(sorted(phase.dist_weight.items())), phase.lmbda,
        tuple(phase.betas_model), tuple(phase.betas_latent),
        phase.precondition_frequency_model, phase.freq_valid,
        refs_b is not None)
    window, eval_b, eval_update = _make_batched(fns, mesh)
    pf = fns["pf"]
    # Hoist the (constant) wasserstein target features out of the steps;
    # identity for mse-only phases. Batched: vgg runs once over [n,3,H,W].
    targets_b = fns["prep_target"](targets_b)

    opt1 = init_opt_state(_index(params_b, 0), fns["hp_weight"], fns["hp_latent"])
    opt_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), opt1)
    keys = (jnp.asarray(keys_b) if keys_b is not None
            else jax.random.split(key, n))

    if refs_b is not None:
        refs_b = [jnp.asarray(r, jnp.float32) for r in refs_b]

    # Reference SOAP first-step parity, batched (train.py seed_opt_state):
    # each slot's WEIGHT-leaf eigenbases seed from its own first gradient
    # (one extra vmapped grad eval; only tiny NN-weight grads reach the host).
    import os as _os

    if _os.environ.get("COOLCHIC_SOAP_SEED", "1") != "0":
        from coolchic_tpu.train.train import linear_schedule as _ls, seed_opt_state

        temp0 = jnp.float32(_ls(phase.softround_temperature, 0, phase.max_itr))
        noise0 = jnp.asarray(noise_b[:, 0], jnp.float32)
        if keys_b is not None:
            # per-slot determinism: derive the SOAP-seeding key from each
            # slot's own key, independent of batch composition
            seed_keys = jax.vmap(lambda k: jax.random.fold_in(k, 13))(keys)
        else:
            key, sub = jax.random.split(key)
            seed_keys = jax.random.split(sub, n)
        grads_b = jax.jit(jax.vmap(
            fns["grad_fn_lam"],
            in_axes=(0, 0, None, 0, 0, 0, None, 0)))(
            params_b, seed_keys, temp0, noise0, targets_b, refs_b, None, lmbda_b)
        opt_b = _stack([
            seed_opt_state(_index(params_b, i), _index(opt_b, i),
                           _index(grads_b, i), fns["hp_weight"])
            for i in range(n)])

    best_loss = eval_b(params_b, targets_b, refs_b, lmbda_b).loss
    # distinct buffers: the window DONATES params_b, so the best-snapshot must
    # never alias it (cf. the round-2 warmup donated-alias fix, f2246ff)
    best_params = jax.tree_util.tree_map(jnp.copy, params_b)

    reload_select = jax.jit(_select)   # one device call for a patience reload

    n_windows = math.ceil(phase.max_itr / phase.freq_valid)
    t_max = phase.max_itr / phase.freq_valid
    patience_windows = max(phase.patience // phase.freq_valid, 1)
    since_record = np.zeros(n, dtype=np.int64)

    cnt = 0
    for w_idx in range(n_windows):
        if phase.schedule_lr and (since_record > patience_windows).any():
            reload = jnp.asarray(since_record > patience_windows)
            params_b = reload_select(reload, best_params, params_b)
            since_record[np.asarray(reload)] = 0

        lr = cosine_lr(phase.lr, w_idx, t_max) if phase.schedule_lr else phase.lr
        temp = linear_schedule(phase.softround_temperature, cnt, phase.max_itr)
        # per-slot linear schedule (same math as linear_schedule, vectorised)
        noise = (noise_b[:, 0]
                 + cnt * (noise_b[:, 1] - noise_b[:, 0]) / phase.max_itr)
        n_steps = min(phase.freq_valid, phase.max_itr - cnt)

        params_b, opt_b, keys = window(params_b, opt_b, keys, targets_b, refs_b,
                                       lmbda_b, lr, temp, noise,
                                       n_steps // pf, n_steps % pf)
        cnt += n_steps
        monitor.iterations_counter += n_steps * n

        # fused eval + best-snapshot (one remote call); fetching `improved`
        # is the host sync point for the patience counters
        best_params, best_loss, improved, lo = eval_update(
            params_b, targets_b, refs_b, lmbda_b, best_params, best_loss)
        imp = np.asarray(improved)
        since_record = np.where(imp, 0, since_record + 1)
        if verbose:
            ls = " ".join(f"{v * 1e3:7.4f}" for v in np.asarray(lo.loss))
            print(f"  itr {cnt:>6} losses(1e-3) [{ls}] lr {lr:.5f}", flush=True)

    return best_params, best_loss


def encode_images_batched(frames: Sequence[FrameData], cfgs: dict[str, CoolChicConfig],
                          preset: Preset, out_paths: Sequence[str], *,
                          mesh=None, seed: int = 0, verbose: bool = True,
                          rdoq: bool = True, profile: str = "ref",
                          on_image=None,
                          lmbdas: Optional[Sequence[float]] = None) -> list[dict]:
    """Encode N same-sized I-frames as one batched program; write one
    bitstream per image. Returns per-image result dicts.

    `lmbdas` (optional, len n) assigns each slot its own rate point, so a
    whole RD sweep (images x λ) runs as mixed chunks — the reference runs
    one slurm job per (image, λ) pair (reference samples/encode.py:147-183);
    here a (image, λ) slot is just a batch row with its own traced λ."""
    n = len(frames)
    assert len(out_paths) == n
    lmbdas_f = ([float(x) for x in lmbdas] if lmbdas is not None
                else [None] * n)
    assert len(lmbdas_f) == n
    h, w = frames[0].img_size
    for f in frames:
        assert f.img_size == (h, w), "batched encode needs same-sized images"
        assert f.frame_data_type == frames[0].frame_data_type
        assert f.bitdepth == frames[0].bitdepth

    fcfg = FrameConfig(coolchic_cfg=cfgs, frame_type="I",
                       frame_data_type=frames[0].frame_data_type,
                       bitdepth=frames[0].bitdepth)
    targets_b = _stack([_target_from_frame(f) for f in frames])
    assert not any(c.flag_common_randomness for c in cfgs.values()), \
        "batched encode does not support common randomness yet"
    monitor = EncoderMonitor()
    t_start = time.time()

    key = jax.random.PRNGKey(seed)
    n_candidates = preset.warmup.phases[0].candidates if preset.warmup.phases else 1

    # --- Warm-up: each candidate seed trains batched over all images; the
    # per-image argmin survives. (The reference's multi-stage pruning is a
    # per-image tournament; over a batch the single-stage argmin keeps the
    # same winners at a fraction of the orchestration.)
    lmbda_b = (jnp.asarray([x for x in lmbdas_f], dtype=jnp.float32)
               if lmbdas is not None else None)

    # Per-slot λ-derived warm-up noise (reference training/presets.py:311):
    # in a mixed-λ chunk every slot warms up at the noise level its own λ
    # would give, not the level derived from the preset's placeholder λ.
    wu_noise_b = None
    if lmbdas is not None:
        rows = [preset.warmup_noise_parameter(lam) for lam in lmbdas_f]
        if all(r is not None for r in rows):
            wu_noise_b = np.asarray(rows, np.float32)

    if preset.warmup.phases and n_candidates > 1:
        wu_phase = preset.warmup.phases[0].training_phase
        cand_best = None
        cand_best_loss = None
        for c in range(n_candidates):
            key, sub = jax.random.split(key)
            init_keys = jax.random.split(sub, n)
            params_b = _stack([frame_encoder_init(init_keys[i], fcfg,
                                                  img_min_max(frames[i]))
                               for i in range(n)])
            key, sub = jax.random.split(key)
            params_b, loss_b = _batched_phase(params_b, targets_b, fcfg, wu_phase,
                                              sub, mesh, monitor, verbose=False,
                                              lmbda_b=lmbda_b, noise_b=wu_noise_b)
            if cand_best is None:
                cand_best, cand_best_loss = params_b, loss_b
            else:
                better = loss_b < cand_best_loss
                cand_best = _select(better, params_b, cand_best)
                cand_best_loss = jnp.where(better, loss_b, cand_best_loss)
            if verbose:
                ls = " ".join(f"{v * 1e3:.4f}" for v in np.asarray(loss_b))
                print(f"warm-up candidate {c}: losses(1e-3) [{ls}]", flush=True)
        params_b = cand_best
    else:
        key, sub = jax.random.split(key)
        init_keys = jax.random.split(sub, n)
        params_b = _stack([frame_encoder_init(init_keys[i], fcfg,
                                              img_min_max(frames[i]))
                           for i in range(n)])

    # --- Main phases, batched.
    for idx, phase in enumerate(preset.training_phases):
        key, sub = jax.random.split(key)
        t0 = time.time()
        with monitor.timed(f"train_phase{idx}"):
            params_b, _ = _batched_phase(params_b, targets_b, fcfg, phase, sub, mesh,
                                         monitor, verbose, lmbda_b=lmbda_b)
        if verbose:
            print(f"phase {idx} done in {time.time() - t0:.1f}s", flush=True)

    # --- Per-image: NN quantization + bitstream write + logs (host loop; the
    # jitted eval is compiled once and reused across images).
    phase0 = preset.training_phases[-1]
    n_pixels = frames[0].n_pixels
    results = []
    cs = CodingStructure(n_frames=1, intra_pos=[0])
    for i in range(n):
        if verbose:
            # heartbeat: the quantize+RDOQ tail is otherwise silent for
            # minutes, and the stall watchdog keys on log mtime
            print(f"image {i}: quantize+rdoq tail...", flush=True)
        params = _index(params_b, i)
        params = jax.tree_util.tree_map(np.asarray, params)
        target = _target_from_frame(frames[i])
        lam_i = lmbdas_f[i] if lmbdas_f[i] is not None else phase0.lmbda

        eval_fn = _make_fns(
            fcfg, "none", "hardround", tuple(sorted(phase0.dist_weight.items())),
            lam_i, (0.95, 0.95), (0.9, 0.999), 10, 1, False)["eval_fn"]
        nn_side_info = {}
        for cc_name in fcfg.cc_cfgs:
            def eval_loss(cc_params, total_nn_bits, _name=cc_name, _p=params, _t=target):
                trial = dict(_p)
                trial[_name] = cc_params
                lo = eval_fn(trial, _t, None, None)
                return float(lo.loss) + lam_i * total_nn_bits / n_pixels

            def eval_with_ctx(ctx, cc_trial, _name=cc_name):
                full, tgt = ctx
                trial = dict(full)
                trial[_name] = cc_trial
                return eval_fn(trial, tgt, None, None).loss

            with monitor.timed("nn_quantize"):
                q_params, q_shift, expgol, _ = quantize_coolchic(
                    params[cc_name], fcfg.cc_cfgs[cc_name], eval_loss, lam_i,
                    n_pixels, verbose=False, eval_with_ctx=eval_with_ctx,
                    eval_ctx=(params, target))
            if rdoq:
                from coolchic_tpu.nnquant.rdoq import rdoq_coolchic

                rdoq_target = (np.asarray(target)
                               if not isinstance(target, dict) else None)
                with monitor.timed("rdoq"):
                    q_params = rdoq_coolchic(q_params, fcfg.cc_cfgs[cc_name],
                                             q_shift, expgol, lam_i,
                                             target=rdoq_target,
                                             frame_type="I", verbose=verbose)
            params = dict(params)
            params[cc_name] = q_params
            nn_side_info[cc_name] = (q_shift, expgol)

        logs = test(params, fcfg, target, dist_weight=phase0.dist_weight,
                    lmbda=lam_i)
        payload = encode_frame(params, fcfg, cs, nn_side_info, is_first_frame=True,
                               profile=profile)
        with open(out_paths[i], "wb") as f:
            f.write(payload)
        results.append({
            "psnr_db": logs.psnr_db,
            "loss": logs.loss,
            "rate_bpp": 8 * len(payload) / n_pixels,
            "latent_rate_bpp": logs.total_rate_latent_bpp,
            "n_bytes": len(payload),
            "n_pixels": n_pixels,
        })
        if on_image is not None:
            on_image(i, results[-1])
        if verbose:
            print(f"image {i}: psnr {logs.psnr_db:.3f} dB, "
                  f"{results[-1]['rate_bpp']:.4f} bpp -> {out_paths[i]}", flush=True)

    if verbose:
        print(f"batch of {n} images done in {time.time() - t_start:.1f}s "
              f"({monitor.iterations_counter} candidate-iterations)", flush=True)
        print(monitor.report(), flush=True)
    return results
