"""Top-level per-frame encoding pipeline (the reference's encode_one_frame,
coolchic/component/video.py:33-342): warm-up tournament -> training phases ->
NN quantization -> bitstream write -> decode round-trip.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.bitstream.encode import encode_frame
from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.io.framedata import FrameData
from coolchic_tpu.models.frame import (
    FrameConfig,
    frame_cr_grids,
    frame_encoder_forward,
    frame_encoder_init,
)
from coolchic_tpu.nnquant.quantize import quantize_coolchic
from coolchic_tpu.train.loss import loss_function
from coolchic_tpu.train.presets import Preset
from coolchic_tpu.train.train import EncoderMonitor, _make_fns, logs_from_loss, test, train
from coolchic_tpu.train.warmup import warmup, warmup_batched
from coolchic_tpu.utils.codingstructure import CodingStructure


def _target_from_frame(frame: FrameData):
    if frame.frame_data_type == "yuv420":
        return {k: jnp.asarray(v) for k, v in frame.data.items()}
    return jnp.asarray(frame.data)


def img_min_max(frame: FrameData) -> Optional[jnp.ndarray]:
    """Per-channel (min, max) stats for the YUV output transform
    (reference component/video.py:93-101 initializes the synthesis output
    transform from image statistics for YUV content)."""
    if frame.frame_data_type == "rgb":
        return None
    if frame.frame_data_type == "yuv420":
        from coolchic_tpu.io.yuv import convert_420_to_444

        data = convert_420_to_444(frame.data)
    else:
        data = np.asarray(frame.data)
    mn = data.min(axis=(0, 2, 3))
    mx = data.max(axis=(0, 2, 3))
    return jnp.asarray(np.stack([mn, mx], axis=1), dtype=jnp.float32)


def encode_image(frame: FrameData, cfgs: dict[str, CoolChicConfig], preset: Preset,
                 *, seed: int = 0, verbose: bool = True, rdoq: bool = True
                 ) -> tuple[dict, FrameConfig, dict, dict]:
    """Overfit one I-frame. Returns (params, fcfg, nn_side_info, logs)."""
    fcfg = FrameConfig(
        coolchic_cfg=cfgs, frame_type="I", frame_data_type=frame.frame_data_type,
        bitdepth=frame.bitdepth)
    target = _target_from_frame(frame)
    cr = frame_cr_grids(fcfg)
    stats = img_min_max(frame)
    monitor = EncoderMonitor()

    key = jax.random.PRNGKey(seed)

    # --- Warm-up tournament over differently-seeded candidates.
    n_candidates = preset.warmup.phases[0].candidates if preset.warmup.phases else 1
    cand_keys = jax.random.split(key, n_candidates + 1)
    key = cand_keys[0]
    candidates = [frame_encoder_init(cand_keys[i + 1], fcfg, stats)
                  for i in range(n_candidates)]
    if preset.warmup.phases:
        t0 = time.time()
        import jax as _jax

        # On accelerators, run all candidates as one vmapped program; the
        # candidate batch is chunked to the COOLCHIC_WARMUP_BATCH_PX
        # activation budget inside warmup_batched, so any frame size runs
        # batched.
        wu = warmup_batched if (_jax.default_backend() != "cpu"
                                and len(candidates) > 1) else warmup
        params = wu(candidates, preset, fcfg, target, cr=cr, key=key,
                    monitor=monitor, verbose=verbose)
        if verbose:
            print(f"warm-up done in {time.time() - t0:.1f}s", flush=True)
    else:
        params = candidates[0]

    # --- Main training phases.
    for idx, phase in enumerate(preset.training_phases):
        key, sub = jax.random.split(key)
        t0 = time.time()
        params = train(params, fcfg, target, phase, cr=cr, key=sub,
                       monitor=monitor, verbose=verbose)
        if verbose:
            print(f"phase {idx} done in {time.time() - t0:.1f}s", flush=True)

    # --- NN quantization (greedy RD grid search per module).
    phase0 = preset.training_phases[-1]
    n_pixels = frame.n_pixels

    nn_side_info = {}
    for cc_name in fcfg.cc_cfgs:
        cfg = fcfg.cc_cfgs[cc_name]
        eval_fn = _make_fns(
            fcfg, "none", "hardround", tuple(sorted(phase0.dist_weight.items())),
            phase0.lmbda, (0.95, 0.95), (0.9, 0.999), 10, 1, False)["eval_fn"]

        def eval_loss(cc_params, total_nn_bits, _name=cc_name):
            trial = dict(params)
            trial[_name] = cc_params
            lo = eval_fn(trial, target, None, cr)
            return float(lo.loss) + phase0.lmbda * total_nn_bits / n_pixels

        t0 = time.time()
        q_params, q_shift, expgol, nn_bits = quantize_coolchic(
            params[cc_name], cfg, eval_loss, phase0.lmbda, n_pixels, verbose=verbose)
        if rdoq:
            from coolchic_tpu.nnquant.rdoq import rdoq_coolchic

            if isinstance(target, dict):
                from coolchic_tpu.io.yuv import convert_420_to_444

                rdoq_target = convert_420_to_444(
                    {k: np.asarray(v) for k, v in target.items()})
            else:
                rdoq_target = np.asarray(target)
            q_params = rdoq_coolchic(q_params, cfg, q_shift, expgol, phase0.lmbda,
                                     target=rdoq_target, frame_type="I",
                                     frame_data_type=frame.frame_data_type,
                                     bitdepth=frame.bitdepth, verbose=verbose)
        params = dict(params)
        params[cc_name] = q_params
        nn_side_info[cc_name] = (q_shift, expgol)
        if verbose:
            print(f"quantize_model({cc_name}) done in {time.time() - t0:.1f}s, "
                  f"nn rate {nn_bits / n_pixels:.5f} bpp", flush=True)

    logs = test(params, fcfg, target, cr=cr, dist_weight=phase0.dist_weight,
                lmbda=phase0.lmbda)
    if verbose:
        print(f"final: psnr {logs.psnr_db:.3f} dB, latent {logs.total_rate_latent_bpp:.4f} bpp, "
              f"training iters {monitor.iterations_counter}, "
              f"time {monitor.total_training_time_sec:.1f}s", flush=True)
    return params, fcfg, nn_side_info, logs


def encode_image_to_bitstream(frame: FrameData, cfgs: dict[str, CoolChicConfig],
                              preset: Preset, bitstream_path: str, *,
                              seed: int = 0, verbose: bool = True,
                              rdoq: bool = True, profile: str = "ref") -> dict:
    params, fcfg, nn_side_info, logs = encode_image(
        frame, cfgs, preset, seed=seed, verbose=verbose, rdoq=rdoq)
    cs = CodingStructure(n_frames=1, intra_pos=[0])
    payload = encode_frame(params, fcfg, cs, nn_side_info, is_first_frame=True,
                           profile=profile)
    with open(bitstream_path, "wb") as f:
        f.write(payload)
    n_pixels = frame.n_pixels
    return {
        "psnr_db": logs.psnr_db,
        "rate_bpp": 8 * len(payload) / n_pixels,
        "latent_rate_bpp": logs.total_rate_latent_bpp,
        "n_bytes": len(payload),
    }
