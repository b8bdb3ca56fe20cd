"""Video encoding: per-frame pipeline for I/P/B frames and the GOP driver.

Per-frame (reference component/video.py:33-342 + samples/encode.py):
  1. load the original frame + DECODED references (from the workdir);
  2. [inter] global translation search, flow-guided motion pretraining
     (pyramidal LK standing in for RAFT -- see models/flow.py);
  3. warm-up tournament (half the inter candidates preloaded with the
     pretrained motion decoder);
  4. training phases, NN quantization, bitstream write, decode round-trip;
  5. save the decoded frame so later frames can reference it.

The GOP driver walks frames in coding order with the reference's per-depth
rules: lambda * 1.5^depth and shrinking iteration budgets for B frames.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.bitstream.encode import encode_frame
from coolchic_tpu.io.framedata import FrameData
from coolchic_tpu.io.io import load_frame_data_from_file, save_frame_data_to_file
from coolchic_tpu.io.yuv import convert_420_to_444
from coolchic_tpu.models.flow import estimate_flow
from coolchic_tpu.models.frame import FrameConfig, frame_cr_grids, frame_encoder_init
from coolchic_tpu.models.globalmotion import get_global_translation
from coolchic_tpu.nnquant.quantize import quantize_coolchic
from coolchic_tpu.train.encode import _target_from_frame, img_min_max
from coolchic_tpu.train.presets import AVAILABLE_PRESETS, Preset
from coolchic_tpu.train.train import EncoderMonitor, _make_fns, test, train
from coolchic_tpu.train.warmup import warmup, warmup_batched
from coolchic_tpu.utils.codingstructure import CodingStructure, Frame
from coolchic_tpu.utils.parsecli import (
    INTRA_OPERATING_POINTS,
    MOTION_OPERATING_POINTS,
    RESIDUE_OPERATING_POINTS,
    coolchic_config_from_args,
    substitute_x_channels,
    synthesis_out_ft,
)


def intra_gain_for_lmbda(lmbda: float) -> int:
    """λ-adaptive intra encoder gain (reference video.py:80-91)."""
    if lmbda < 0.0002:
        return 24
    if lmbda < 0.0005:
        return 20
    return 16


def _decoded_name(display_idx: int, fdata: FrameData, is_image: bool) -> str:
    """Decoded-frame filename; yuv names carry the WxH / format convention
    required by the loader."""
    if is_image:
        return f"{display_idx:04d}-decoded.png"
    h, w = fdata.img_size
    return (f"{display_idx:04d}-decoded_{w}x{h}_{fdata.frame_data_type}_"
            f"{fdata.bitdepth}b.yuv")


def _dense(frame: FrameData) -> np.ndarray:
    if frame.frame_data_type == "yuv420":
        return convert_420_to_444(frame.data)
    return np.asarray(frame.data)


def guided_motion_pretraining(target_flows: list[np.ndarray], motion_cfg, preset: Preset,
                              key, monitor, verbose=False) -> dict:
    """Overfit the motion decoder to imitate the estimated flow(s) as a dense
    'flow image' (reference video.py:399-469)."""
    import dataclasses

    target = jnp.asarray(np.concatenate(target_flows, axis=1), dtype=jnp.float32)
    n_out = target.shape[1]
    layers = substitute_x_channels(list(motion_cfg.layers_synthesis), n_out)
    pre_cfg = dataclasses.replace(motion_cfg, layers_synthesis=tuple(layers),
                                  encoder_gain=16)
    fcfg = FrameConfig(coolchic_cfg={"residue": pre_cfg}, frame_type="I",
                       frame_data_type="flow", bitdepth=8)
    params = frame_encoder_init(key, fcfg)
    for phase in preset.motion_pretrain_phase:
        key, sub = jax.random.split(key)
        params = train(params, fcfg, target, phase, key=sub, monitor=monitor,
                       verbose=verbose)
    return params["residue"]


def encode_one_frame(frame: Frame, coding_structure: CodingStructure, video_path: str,
                     workdir: str, preset: Preset, cfg_args: dict[str, dict],
                     warp_filter_size: int = 8, seed: int = 0, verbose: bool = True,
                     rdoq: bool = True, tune: str = "mse",
                     profile: str = "ref", spatial_shard: int = 0) -> dict:
    """Encode one frame; returns {bitstream bytes, logs}. Decoded refs are
    read from (and this frame's decoded output written to) the workdir.

    `spatial_shard` > 1 shards THIS frame's training along image height over
    that many devices (parallel/spatial.py GSPMD halos) — for frames whose
    activations exceed one chip's HBM (2K/4K, SURVEY.md §7.8a). Warm-up
    falls back to the serial tournament (each candidate trains sharded)."""
    frame.set_frame_data(load_frame_data_from_file(
        video_path, frame.display_order + frame.frame_offset))
    fdata = frame.data
    h, w = fdata.img_size
    is_image = video_path.endswith((".png", ".ppm"))

    # Per-frame idempotence: resume from an existing checkpoint
    # (reference cc_encode.py:363-419 skips already-encoded frames).
    ckpt_path = os.path.join(workdir, f"{frame.display_order:04d}-frame_encoder.npz")
    if os.path.exists(ckpt_path):
        from coolchic_tpu.utils.checkpoint import load_frame_encoder

        if verbose:
            print(f"frame {frame.display_order}: resuming from {ckpt_path}", flush=True)
        params, fcfg, nn_side_info = load_frame_encoder(ckpt_path)
        return _finalize_frame(frame, coding_structure, params, fcfg, nn_side_info,
                               fdata, workdir, is_image, verbose, profile=profile,
                               lmbda=preset.lmbda)

    prep = _prep_frame(frame, fdata, is_image, workdir, preset, cfg_args,
                       warp_filter_size, seed, verbose, tune)
    cfgs, fcfg, target, cr = prep["cfgs"], prep["fcfg"], prep["target"], prep["cr"]
    monitor, key = prep["monitor"], prep["key"]
    refs_arg, candidates = prep["refs_arg"], prep["candidates"]

    sp_mesh = None
    if spatial_shard and spatial_shard > 1:
        from jax.sharding import Mesh as _Mesh

        devs = jax.devices()
        if len(devs) < spatial_shard:
            raise ValueError(f"--spatial_shard {spatial_shard} needs that many "
                             f"devices, have {len(devs)}")
        sp_mesh = _Mesh(np.asarray(devs[:spatial_shard]), ("space",))
        if verbose:
            print(f"spatial sharding: H over {spatial_shard} devices", flush=True)

    if preset.warmup.phases:
        # The vmapped warm-up multiplies every activation by the candidate
        # count; warmup_batched chunks the candidate batch to the
        # COOLCHIC_WARMUP_BATCH_PX activation budget (pixels x candidates),
        # so any frame size runs batched (the round-1 sequential fallback is
        # gone -- chunking replaces it). Spatially-sharded frames use the
        # serial tournament: each candidate trains sharded over the mesh.
        wu = warmup_batched if (jax.default_backend() != "cpu"
                                and len(candidates) > 1 and sp_mesh is None) \
            else warmup
        wu_kw = {"spatial_mesh": sp_mesh} if wu is warmup else {}
        with monitor.timed("warmup"):
            params = wu(candidates, preset, fcfg, target, refs=refs_arg, cr=cr,
                        key=key, monitor=monitor, verbose=verbose, **wu_kw)
    else:
        params = candidates[0]

    # The serial path runs the SAME batched window as the GOP wave path at
    # n=1 with the frame's own key stream (_frame_phase_key), so a frame
    # trains identically whether it rides a wave batch slot or is encoded
    # alone -- the wave feature's RD equivalence holds by construction
    # (tests/test_waves_e2e.py). train() remains for spatially-sharded
    # frames and common-randomness configs (the batched window carries no
    # cr), or COOLCHIC_SERIAL_TRAINER=train.
    use_batched = (sp_mesh is None
                   and (cr is None or all(v is None for v in cr.values()))
                   and os.environ.get("COOLCHIC_SERIAL_TRAINER",
                                      "batched") != "train")
    if use_batched:
        import dataclasses

        from coolchic_tpu.parallel.encode_batch import (_batched_phase,
                                                        _index, _stack)

        canon = dataclasses.replace(
            fcfg, frame_display_index=0,
            index_references=tuple(range(len(fcfg.index_references))))
        params_b = _stack([params])
        targets_b = _stack([target])
        refs_b = (None if refs_arg is None
                  else [jnp.stack([r]) for r in refs_arg])
        for idx, phase in enumerate(preset.training_phases):
            kb = _frame_phase_key(seed, frame.display_order, idx)[None]
            with monitor.timed(f"train_phase_{idx}"):
                params_b, _ = _batched_phase(
                    params_b, targets_b, canon, phase, jax.random.PRNGKey(0),
                    None, monitor, verbose, refs_b=refs_b, keys_b=kb)
        params = jax.tree_util.tree_map(np.asarray, _index(params_b, 0))
    else:
        for idx, phase in enumerate(preset.training_phases):
            key, sub = jax.random.split(key)
            with monitor.timed(f"train_phase_{idx}"):
                params = train(params, fcfg, target, phase, refs=refs_arg,
                               cr=cr, key=sub, monitor=monitor,
                               verbose=verbose, spatial_mesh=sp_mesh)

    if sp_mesh is not None:
        # gather the (tiny) trained pytree back to one device so the
        # quantize / RDOQ / bitstream host stages see plain arrays
        params = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), jax.devices()[0]), params)

    params, nn_side_info = _quantize_frame(params, fcfg, preset, target, refs_arg,
                                           cr, fdata, monitor, rdoq, verbose)

    if verbose:
        print(f"frame {frame.frame_type}{frame.display_order}: "
              f"{monitor.iterations_counter} iters, "
              f"{monitor.total_training_time_sec:.1f}s training\n"
              + monitor.report(), flush=True)

    from coolchic_tpu.utils.checkpoint import save_frame_encoder

    save_frame_encoder(ckpt_path, params, fcfg, nn_side_info)
    return _finalize_frame(frame, coding_structure, params, fcfg, nn_side_info,
                           fdata, workdir, is_image, verbose, profile=profile,
                           lmbda=preset.lmbda, monitor=monitor)


def _prep_frame(frame: Frame, fdata: FrameData, is_image: bool, workdir: str,
                preset: Preset, cfg_args: dict[str, dict], warp_filter_size: int,
                seed: int, verbose: bool, tune: str) -> dict:
    """Per-frame encode prep shared by the serial and wave-parallel paths:
    load decoded refs, build configs, global-translation + flow-guided motion
    pretraining, warm-up candidate construction."""
    h, w = fdata.img_size

    # Decoded references from the workdir.
    refs_data = []
    for ref_idx in frame.index_references:
        ref_path = os.path.join(workdir, _decoded_name(ref_idx, fdata, is_image))
        refs_data.append(load_frame_data_from_file(ref_path))
    frame.set_refs_data(refs_data)

    # Build per-coolchic configs (synthesis X substituted by frame type).
    cfgs = {}
    for name, args in cfg_args.items():
        if frame.frame_type == "I" and name == "motion":
            continue
        cfgs[name] = coolchic_config_from_args(args, (h, w), coolchic_name=name,
                                               frame_type=frame.frame_type, tune=tune)

    # lambda-adaptive encoder gain for intra (reference video.py:80-91).
    if frame.frame_type == "I":
        import dataclasses

        gain = intra_gain_for_lmbda(preset.lmbda)
        cfgs = {k: dataclasses.replace(v, encoder_gain=gain) for k, v in cfgs.items()}

    fcfg = FrameConfig(
        coolchic_cfg=cfgs, frame_type=frame.frame_type,
        frame_data_type=fdata.frame_data_type, bitdepth=fdata.bitdepth,
        index_references=tuple(frame.index_references),
        frame_display_index=frame.display_order,
        warp_filter_size=warp_filter_size)

    target = _target_from_frame(fdata)
    cr = frame_cr_grids(fcfg)
    monitor = EncoderMonitor()
    key = jax.random.PRNGKey(seed + 1000 * frame.display_order)

    # ----- Inter-only: global translation + guided motion pretraining.
    refs_dense = [jnp.asarray(_dense(r)) for r in refs_data]
    global_flows = [np.zeros(2, dtype=np.float32), np.zeros(2, dtype=np.float32)]
    pretrained_motion = None
    if frame.frame_type != "I":
        t0 = time.time()
        shifted_refs, flows = get_global_translation(_dense(fdata),
                                                     [_dense(r) for r in refs_data])
        for i, f in enumerate(flows):
            global_flows[i] = f
        if verbose:
            print(f"global translation {[f.tolist() for f in flows]} "
                  f"({time.time() - t0:.1f}s)", flush=True)

        t0 = time.time()
        target_dense = _dense(fdata)
        est_flows = [np.asarray(estimate_flow(target_dense, sref))
                     for sref in shifted_refs]
        key, sub = jax.random.split(key)
        if preset.motion_pretrain_phase and preset.motion_pretrain_phase[0].max_itr > 0:
            pretrained_motion = guided_motion_pretraining(
                est_flows, cfgs["motion"], preset, sub, monitor, verbose=False)
            # Rescale latents if the final motion gain differs from 16.
            ratio = cfgs["motion"].encoder_gain / 16.0
            if ratio != 1.0:
                pretrained_motion = dict(pretrained_motion)
                pretrained_motion["latents"] = [lat * ratio
                                                for lat in pretrained_motion["latents"]]
            if verbose:
                print(f"motion pretraining done ({time.time() - t0:.1f}s)", flush=True)

    # ----- Warm-up candidates (half preloaded with the pretrained motion).
    # Stats-based output transform only applies to intra frames
    # (reference video.py:84-101).
    stats = img_min_max(fdata) if frame.frame_type == "I" else None
    n_candidates = preset.warmup.phases[0].candidates if preset.warmup.phases else 1
    cand_keys = jax.random.split(key, n_candidates + 1)
    key = cand_keys[0]
    candidates = []
    for i in range(n_candidates):
        p = frame_encoder_init(cand_keys[i + 1], fcfg, stats)
        p["global_flow_1"] = jnp.asarray(global_flows[0])
        p["global_flow_2"] = jnp.asarray(global_flows[1])
        # odd candidates start from the pretrained motion (reference
        # video.py:179-212); with NO warm-up tournament the single candidate
        # takes it directly -- otherwise the pretraining would be dead code.
        if pretrained_motion is not None and (i % 2 or n_candidates == 1):
            p["motion"] = pretrained_motion
        candidates.append(p)

    return {"cfgs": cfgs, "fcfg": fcfg, "target": target, "cr": cr,
            "monitor": monitor, "key": key, "candidates": candidates,
            "refs_arg": refs_dense if frame.frame_type != "I" else None}


def _frame_phase_key(seed: int, display_order: int, phase_idx: int):
    """Per-(frame, phase) training key, independent of batch composition:
    the serial path and the GOP wave path both use it, so a frame's main
    training is the same computation either way."""
    return jax.random.fold_in(
        jax.random.PRNGKey(seed + 1000 * display_order), 7919 + phase_idx)


def _rdoq_frame_ctx(params: dict, fcfg: FrameConfig, cc_name: str,
                    refs_arg, cr) -> dict:
    """Fixed frame-level activations for RDOQ's P/B reconstruction scorers
    (nnquant/rdoq.py _make_full_scorer / the inter tile path). The other
    cool-chic is evaluated AS-IS at this point of the quantization walk
    (float if not yet quantized -- same interleave the nn-quantization grid
    search already uses via its eval ctx)."""
    from coolchic_tpu.models.coolchic import coolchic_forward
    from coolchic_tpu.models.warp import warp_fn

    # global flows shift the references as constant translations
    # (models/frame.py:121-129)
    refs = []
    for i, ref in enumerate(refs_arg):
        g = np.asarray(params[f"global_flow_{i + 1}"])
        h, w = ref.shape[-2:]
        jj = np.clip(np.arange(w) + int(round(float(g[0]))), 0, w - 1)
        ii = np.clip(np.arange(h) + int(round(float(g[1]))), 0, h - 1)
        refs.append(np.asarray(ref)[:, :, ii][:, :, :, jj])

    if cc_name == "residue":
        mo = coolchic_forward(params["motion"], fcfg.cc_cfgs["motion"],
                              training=False,
                              cr=None if cr is None else cr.get("motion"))
        motion = mo.raw_out
        warps = [np.asarray(warp_fn(jnp.asarray(refs[0]), motion[:, 0:2],
                                    fcfg.warp_filter_size, training=False))]
        if fcfg.frame_type == "B":
            warps.append(np.asarray(warp_fn(jnp.asarray(refs[1]),
                                            motion[:, 2:4],
                                            fcfg.warp_filter_size,
                                            training=False)))
        return {"role": "residue", "warps": tuple(warps)}
    res = coolchic_forward(params["residue"], fcfg.cc_cfgs["residue"],
                           training=False,
                           cr=None if cr is None else cr.get("residue"))
    return {"role": "motion", "other_raw": np.asarray(res.raw_out),
            "refs": tuple(refs),
            "warp_filter_size": fcfg.warp_filter_size}


def _quantize_frame(params: dict, fcfg: FrameConfig, preset: Preset, target,
                    refs_arg, cr, fdata: FrameData, monitor: EncoderMonitor,
                    rdoq: bool, verbose: bool) -> tuple[dict, dict]:
    """NN quantization (+RDOQ) of every cool-chic in `params`; returns the
    quantized params and the per-cc (q_shift, expgol) side info."""
    phase0 = preset.training_phases[-1]
    n_pixels = fdata.n_pixels
    nn_side_info = {}
    for cc_name in fcfg.cc_cfgs:
        eval_fn = _make_fns(
            fcfg, "none", "hardround", tuple(sorted(phase0.dist_weight.items())),
            phase0.lmbda, (0.95, 0.95), (0.9, 0.999), 10, 1, refs_arg is not None)["eval_fn"]

        def eval_loss(cc_params, total_nn_bits, _name=cc_name):
            trial = dict(params)
            trial[_name] = cc_params
            lo = eval_fn(trial, target, refs_arg, cr)
            return float(lo.loss) + phase0.lmbda * total_nn_bits / n_pixels

        def eval_with_ctx(ctx, cc_trial, _name=cc_name):
            # traceable grid scorer: all per-image data arrives via ctx (jit
            # ARGS, so one compile per (config, module) serves every image)
            full, tgt, refs_c, cr_c = ctx
            trial = dict(full)
            trial[_name] = cc_trial
            return eval_fn(trial, tgt, refs_c, cr_c).loss

        with monitor.timed("nn_quantize"):
            q_params, q_shift, expgol, nn_bits = quantize_coolchic(
                params[cc_name], fcfg.cc_cfgs[cc_name], eval_loss, phase0.lmbda,
                n_pixels, verbose=verbose, eval_with_ctx=eval_with_ctx,
                eval_ctx=(params, target, refs_arg, cr))
        if rdoq:
            from coolchic_tpu.nnquant.rdoq import rdoq_coolchic

            rdoq_target = None
            fctx = None
            if fcfg.frame_type == "I":
                if cc_name == "residue":
                    rdoq_target = _dense(fdata)
            else:
                # P/B: synthesis + upsampling of BOTH cool-chics are scored
                # against the full reconstruction (the reference runs these
                # through its test() fallback, reference nnquant/rdoq.py:
                # 131-137); the OTHER cool-chic's contribution is a fixed
                # activation computed here
                rdoq_target = _dense(fdata)
                fctx = _rdoq_frame_ctx(params, fcfg, cc_name, refs_arg, cr)
            with monitor.timed("rdoq"):
                q_params = rdoq_coolchic(q_params, fcfg.cc_cfgs[cc_name], q_shift,
                                         expgol, phase0.lmbda, target=rdoq_target,
                                         frame_type=fcfg.frame_type,
                                         frame_data_type=fdata.frame_data_type,
                                         bitdepth=fdata.bitdepth,
                                         frame_ctx=fctx, verbose=verbose)
        params = dict(params)
        params[cc_name] = q_params
        nn_side_info[cc_name] = (q_shift, expgol)

    return params, nn_side_info


def _finalize_frame(frame: Frame, coding_structure: CodingStructure, params: dict,
                    fcfg: FrameConfig, nn_side_info: dict, fdata: FrameData,
                    workdir: str, is_image: bool, verbose: bool,
                    profile: str = "ref", lmbda: float = 0.0,
                    monitor: Optional[EncoderMonitor] = None) -> dict:
    """Bitstream write + decoded-frame save + final logs (shared between the
    fresh-encode and resume-from-checkpoint paths)."""
    from coolchic_tpu.models.frame import frame_cr_grids as _cr, frame_encoder_forward

    refs_arg = None
    if fcfg.frame_type != "I":
        refs_arg = [jnp.asarray(_dense(load_frame_data_from_file(
            os.path.join(workdir, _decoded_name(ref_idx, fdata, is_image)))))
            for ref_idx in fcfg.index_references]
    cr = _cr(fcfg)
    target = _target_from_frame(fdata)
    n_pixels = fdata.n_pixels

    logs = test(params, fcfg, target, refs=refs_arg, cr=cr)

    payload = encode_frame(params, fcfg, coding_structure, nn_side_info,
                           is_first_frame=frame.coding_order == 0,
                           profile=profile)

    out = frame_encoder_forward(params, fcfg, reference_frames=refs_arg,
                                training=False, cr=cr)
    if fdata.frame_data_type == "yuv420":
        dec_data = {k: np.asarray(v) for k, v in out.decoded_image.items()}
    else:
        dec_data = np.asarray(out.decoded_image)
    decoded = FrameData(fdata.bitdepth, fdata.frame_data_type, dec_data)
    dec_path = os.path.join(workdir, _decoded_name(frame.display_order, fdata, is_image))
    save_frame_data_to_file(decoded, dec_path)

    from coolchic_tpu.utils.results import write_frame_results

    write_frame_results(
        os.path.join(workdir, f"{frame.display_order:04d}-results_encoder.tsv"),
        seq_name=frame.seq_name or os.path.basename(workdir), lmbda=lmbda,
        n_pixels=n_pixels, logs=logs, rate_bpp=8 * len(payload) / n_pixels,
        extra={"frame_type": fcfg.frame_type, "n_bytes": len(payload)})

    # Detailed per-frame logs (reference FrameEncoderLogs, training/test.py):
    # per-grid bpp, per-module NN bpp, MAC/px, alpha/beta stats, prediction
    # dB, per-feature rates -- one wide TSV row next to the summary TSV,
    # plus a column-identical reference-schema results_encoder.tsv.
    from coolchic_tpu.train.logs import detailed_test, write_reference_encoder_tsv

    detailed = detailed_test(
        params, fcfg, target, refs=refs_arg, cr=cr, lmbda=lmbda,
        nn_side_info=nn_side_info,
        encoding_time_second=(monitor.total_training_time_sec if monitor else 0.0),
        encoding_iterations_cnt=(monitor.iterations_counter if monitor else 0),
        display_order=frame.display_order, coding_order=frame.coding_order,
        frame_offset=frame.frame_offset,
        seq_name=frame.seq_name or os.path.basename(workdir))
    detailed["frame_type"] = fcfg.frame_type
    detailed["n_bytes"] = len(payload)
    write_reference_encoder_tsv(
        os.path.join(workdir, f"{frame.display_order:04d}-results_encoder_ref.tsv"),
        detailed)
    dpath = os.path.join(workdir, f"{frame.display_order:04d}-logs_detailed.tsv")
    with open(dpath, "w") as f:
        keys = list(detailed)
        f.write("\t".join(keys) + "\n")
        f.write("\t".join(f"{detailed[k]:.6f}" if isinstance(detailed[k], float)
                          else str(detailed[k]) for k in keys) + "\n")

    if verbose:
        print(f"frame {fcfg.frame_type}{frame.display_order}: "
              f"psnr {logs.psnr_db:.3f} dB, {8 * len(payload) / n_pixels:.4f} bpp "
              f"({len(payload)} bytes)", flush=True)

    return {"payload": payload, "logs": logs, "decoded": decoded,
            "n_bytes": len(payload), "fcfg": fcfg, "detailed": detailed}


def encode_wave_group(group: list[Frame], coding_structure: CodingStructure,
                      video_path: str, workdir: str, preset: Preset,
                      cfg_args: dict[str, dict], warp_filter_size: int = 8,
                      seed: int = 0, verbose: bool = True, rdoq: bool = True,
                      tune: str = "mse", profile: str = "ref") -> list[dict]:
    """Encode every frame of one GOP wave TOGETHER: per-frame prep (refs,
    global translation, motion pretraining, warm-up) stays per frame, then
    the main training phases run as ONE batched program with the frames as
    batch slots (each with its own decoded references riding the batch
    axis), then the per-frame quantize/bitstream tail. The TPU-native
    replacement for the reference's one-slurm-job-per-frame DAG (reference
    samples/encode.py:147-183): a wave's frames share every compile and the
    chip's idle lanes instead of queueing behind each other.

    All frames of `group` must share frame type / depth (the wave scheduler
    guarantees it) and therefore preset, operating point and image size."""
    import dataclasses

    from coolchic_tpu.parallel.encode_batch import _batched_phase, _index, _stack
    from coolchic_tpu.utils.checkpoint import save_frame_encoder

    results = []
    todo: list[tuple[Frame, dict]] = []
    for frame in group:
        frame.set_frame_data(load_frame_data_from_file(
            video_path, frame.display_order + frame.frame_offset))
        fdata = frame.data
        is_image = video_path.endswith((".png", ".ppm"))
        ckpt_path = os.path.join(workdir,
                                 f"{frame.display_order:04d}-frame_encoder.npz")
        if os.path.exists(ckpt_path):
            from coolchic_tpu.utils.checkpoint import load_frame_encoder

            params, fcfg, nn_side_info = load_frame_encoder(ckpt_path)
            results.append(_finalize_frame(frame, coding_structure, params, fcfg,
                                           nn_side_info, fdata, workdir, is_image,
                                           verbose, profile=profile,
                                           lmbda=preset.lmbda))
            continue
        prep = _prep_frame(frame, fdata, is_image, workdir, preset, cfg_args,
                           warp_filter_size, seed, verbose, tune)
        todo.append((frame, prep))

    if not todo:
        return results

    # --- Per-frame warm-up (candidates batch inside warmup_batched).
    warmed = []
    for frame, prep in todo:
        fcfg, target, cr = prep["fcfg"], prep["target"], prep["cr"]
        candidates, key = prep["candidates"], prep["key"]
        refs_arg, monitor = prep["refs_arg"], prep["monitor"]
        if preset.warmup.phases:
            wu = warmup_batched if (jax.default_backend() != "cpu"
                                    and len(candidates) > 1) else warmup
            with monitor.timed("warmup"):
                p0 = wu(candidates, preset, fcfg, target, refs=refs_arg, cr=cr,
                        key=key, monitor=monitor, verbose=False)
        else:
            p0 = candidates[0]
        warmed.append(p0)

    # --- Main phases: frames are batch slots of one jitted window. One
    # canonical fcfg (display index / ref ids are bitstream metadata, not
    # compute) so every frame of every same-shaped wave shares the compile.
    fcfg0 = todo[0][1]["fcfg"]
    canon = dataclasses.replace(
        fcfg0, frame_display_index=0,
        index_references=tuple(range(len(fcfg0.index_references))))
    monitor = todo[0][1]["monitor"]
    params_b = _stack(warmed)
    targets_b = _stack([prep["target"] for _, prep in todo])
    refs_b = None
    if canon.frame_type != "I":
        n_refs = len(todo[0][1]["refs_arg"])
        refs_b = [jnp.stack([prep["refs_arg"][j] for _, prep in todo])
                  for j in range(n_refs)]
    for idx, phase in enumerate(preset.training_phases):
        # per-FRAME keys (not a wave-level stream): slot i trains with the
        # same key it would get on the serial path (_frame_phase_key), so
        # wave batching does not change any frame's training
        keys_b = jnp.stack([_frame_phase_key(seed, frame.display_order, idx)
                            for frame, _ in todo])
        t0 = time.time()
        with monitor.timed(f"wave_train_phase_{idx}"):
            params_b, _ = _batched_phase(params_b, targets_b, canon, phase,
                                         jax.random.PRNGKey(0), None, monitor,
                                         verbose, refs_b=refs_b, keys_b=keys_b)
        if verbose:
            print(f"wave phase {idx} ({len(todo)} frames) done in "
                  f"{time.time() - t0:.1f}s", flush=True)

    # --- Per-frame tail: quantize + RDOQ + bitstream + decoded-frame save.
    for i, (frame, prep) in enumerate(todo):
        fdata = frame.data
        is_image = video_path.endswith((".png", ".ppm"))
        fcfg, target, cr = prep["fcfg"], prep["target"], prep["cr"]
        refs_arg = prep["refs_arg"]
        params = jax.tree_util.tree_map(np.asarray, _index(params_b, i))
        params, nn_side_info = _quantize_frame(params, fcfg, preset, target,
                                               refs_arg, cr, fdata,
                                               prep["monitor"], rdoq, verbose)
        ckpt_path = os.path.join(workdir,
                                 f"{frame.display_order:04d}-frame_encoder.npz")
        save_frame_encoder(ckpt_path, params, fcfg, nn_side_info)
        results.append(_finalize_frame(frame, coding_structure, params, fcfg,
                                       nn_side_info, fdata, workdir, is_image,
                                       verbose, profile=profile,
                                       lmbda=preset.lmbda,
                                       monitor=prep["monitor"]))
    return results


def frame_cfg_args(frame_type: str, depth: int) -> tuple[dict, dict]:
    """Per-depth operating points + schedule scaling (samples/encode.py:23-70)."""
    if frame_type == "I":
        return {"residue": INTRA_OPERATING_POINTS["hop"]}, dict(
            start_lr=1e-2, n_itr=10000, n_itr_motion=0, lmbda_scale=1.0)
    if frame_type == "P":
        return ({"residue": RESIDUE_OPERATING_POINTS["mop"],
                 "motion": MOTION_OPERATING_POINTS["mop"]},
                dict(start_lr=5e-3, n_itr=10000, n_itr_motion=3000, lmbda_scale=1.0))
    op = "mop" if depth == 1 else "lop"
    return ({"residue": RESIDUE_OPERATING_POINTS[op],
             "motion": MOTION_OPERATING_POINTS[op]},
            dict(start_lr=1e-2, n_itr=max(10000 - 2000 * depth, 1000),
                 n_itr_motion=max(5000 - 1000 * depth, 1000),
                 lmbda_scale=1.5**depth))


def _frame_preset(frame: Frame, lmbda: float, itr_scale: float) -> tuple:
    cfg_args, sched = frame_cfg_args(frame.frame_type, frame.depth)
    # COOLCHIC_ITR_FLOOR: smoke tests drop the production 2000-iter floor
    floor = int(os.environ.get("COOLCHIC_ITR_FLOOR", 2000))
    n_itr = max(int(sched["n_itr"] * itr_scale), floor)
    preset_name = "intra" if frame.frame_type == "I" else "inter"
    preset = AVAILABLE_PRESETS[preset_name](
        lmbda=lmbda * sched["lmbda_scale"], start_lr=sched["start_lr"],
        itr_main_training=n_itr,
        itr_motion_pretrain=max(int(sched["n_itr_motion"] * itr_scale), 0))
    return cfg_args, preset


def encode_video(video_path: str, bitstream_path: str, workdir: str, *,
                 n_frames: int, intra_pos: list[int], p_pos: list[int],
                 lmbda: float = 1e-3, itr_scale: float = 1.0, seed: int = 0,
                 verbose: bool = True, waves: bool = False) -> dict:
    """GOP driver: encode all frames in coding order (samples/encode.py).

    `waves=True` groups frames into dependency waves (parallel/gop.py) and
    encodes every same-(type, depth) group of a wave as ONE batched training
    program (encode_wave_group) — hierarchical-B GOPs train their widest
    levels in parallel instead of frame-by-frame."""
    os.makedirs(workdir, exist_ok=True)
    cs = CodingStructure(n_frames=n_frames, intra_pos=list(intra_pos),
                         p_pos=list(p_pos))
    if verbose:
        print(cs.pretty_string(), flush=True)

    by_coding: dict[int, dict] = {}
    if waves:
        from coolchic_tpu.parallel.gop import gop_waves

        for wave in gop_waves(cs):
            groups: dict[tuple, list[Frame]] = {}
            for frame in wave:
                groups.setdefault((frame.frame_type, frame.depth), []).append(frame)
            for (ftype, depth), members in sorted(groups.items()):
                cfg_args, preset = _frame_preset(members[0], lmbda, itr_scale)
                if verbose:
                    names = ", ".join(f"{f.frame_type}{f.display_order}"
                                      for f in members)
                    print(f"wave group ({ftype}, depth {depth}): {names}",
                          flush=True)
                res_list = encode_wave_group(members, cs, video_path, workdir,
                                             preset, cfg_args, seed=seed,
                                             verbose=verbose)
                for frame, res in zip(members, res_list):
                    by_coding[frame.coding_order] = res
    else:
        for coding_idx in range(cs.get_max_coding_order() + 1):
            frame = cs.get_frame_from_coding_order(coding_idx)
            cfg_args, preset = _frame_preset(frame, lmbda, itr_scale)
            by_coding[coding_idx] = encode_one_frame(
                frame, cs, video_path, workdir, preset, cfg_args,
                seed=seed, verbose=verbose)

    all_payload = b""
    results = []
    for coding_idx in sorted(by_coding):
        all_payload += by_coding[coding_idx]["payload"]
        results.append(by_coding[coding_idx])

    with open(bitstream_path, "wb") as f:
        f.write(all_payload)
    return {"n_bytes": len(all_payload), "results": results}
