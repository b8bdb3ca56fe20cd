"""Per-module RDOQ RD deltas, measured on real bitstreams.

VERDICT r4 item 4's bar: "all four modules refined in an e2e encode with a
measured RD delta per module". One training run per part, then the greedy
refinement is applied module-prefix by module-prefix to the SAME quantized
starting point; after each prefix the frame is written to a real bitstream
and scored dist + lmbda * 8*bytes / n_pixels (the true objective).

Part A (image): I-frame encode, prefixes arm -> +ifce -> +synthesis ->
+upsampling. Part B (video): 3-frame I/P clip; the P frame's residue AND
motion cool-chics are refined (the cases the reference routes through its
full-test() fallback, reference nnquant/rdoq.py:131-137).

Usage:
  python tools/ab_rdoq_modules.py --out results/round5/ab_rdoq_modules.json \
      [--cpu] [--n_itr 400] [--skip_video]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _nn_bytes_delta(msg):  # pragma: no cover - debug helper
    return msg


def _e2e(params, fcfg, nn_side_info, target_data, lmbda, is_first, cs):
    """True objective from a real bitstream: dist + lmbda * bits / n_pixels."""
    from coolchic_tpu.bitstream.encode import encode_frame
    from coolchic_tpu.models.frame import frame_encoder_forward
    import jax.numpy as jnp

    payload = encode_frame(params, fcfg, cs, nn_side_info,
                           is_first_frame=is_first)
    # distortion from the forward (decode-back equality is pinned by the
    # encoder's own decode gate / tests; here we need many cheap evals)
    refs = None
    if fcfg.frame_type != "I":
        refs = [jnp.asarray(r) for r in target_data["refs"]]
    out = frame_encoder_forward(params, fcfg, reference_frames=refs,
                                training=False)
    dec = out.decoded_image
    tgt = target_data["target"]
    if isinstance(dec, dict):
        sse = sum(float(np.sum((np.asarray(dec[k]) - np.asarray(tgt[k])) ** 2))
                  for k in ("y", "u", "v"))
        n = sum(np.asarray(tgt[k]).size for k in ("y", "u", "v"))
        dist = sse / n
    else:
        dist = float(np.mean((np.asarray(dec) - np.asarray(tgt)) ** 2))
    n_pixels = fcfg.cc_cfgs["residue"].img_size[0] * \
        fcfg.cc_cfgs["residue"].img_size[1]
    bits = 8 * len(payload)
    psnr = -10.0 * np.log10(max(dist, 1e-10))
    return {"loss": dist + lmbda * bits / n_pixels, "dist": dist,
            "psnr_db": float(psnr), "n_bytes": len(payload),
            "bpp": bits / n_pixels}


def _prefix_walk(params_all, cc_name, cfg, side, lmbda, target, frame_type,
                 frame_data_type, bitdepth, frame_ctx, fcfg, nn_side_info,
                 target_data, is_first, cs, rows, label):
    """Apply RDOQ module prefixes cumulatively; measure the true objective."""
    from coolchic_tpu.nnquant.rdoq import rdoq_coolchic

    q_shift, expgol = side
    prefixes = ["arm"]
    if cfg.flag_ifce:
        prefixes.append("ifce")
    prefixes += ["synthesis", "upsampling"]
    prev = _e2e(params_all, fcfg, nn_side_info, target_data, lmbda, is_first, cs)
    rows.append({"case": label, "modules": "none (quantized only)", **prev})
    for k in range(1, len(prefixes) + 1):
        mods = tuple(prefixes[:k])
        eg = dict(expgol)
        t0 = time.time()
        refined = rdoq_coolchic(params_all[cc_name], cfg, q_shift, eg, lmbda,
                                target=target, frame_type=frame_type,
                                frame_data_type=frame_data_type,
                                bitdepth=bitdepth, frame_ctx=frame_ctx,
                                modules=mods, seed=0, verbose=False)
        p2 = dict(params_all)
        p2[cc_name] = refined
        nsi2 = dict(nn_side_info)
        nsi2[cc_name] = (q_shift, eg)
        cur = _e2e(p2, fcfg, nsi2, target_data, lmbda, is_first, cs)
        rows.append({"case": label, "modules": "+".join(mods),
                     "added_module": prefixes[k - 1],
                     "delta_loss_vs_prev": cur["loss"] - prev["loss"],
                     "delta_bytes_vs_prev": cur["n_bytes"] - prev["n_bytes"],
                     "delta_psnr_vs_prev": cur["psnr_db"] - prev["psnr_db"],
                     "rdoq_s": round(time.time() - t0, 1), **cur})
        prev = cur
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/round5/ab_rdoq_modules.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n_itr", type=int, default=400)
    ap.add_argument("--lmbda", type=float, default=1e-3)
    ap.add_argument("--skip_video", action="store_true")
    ap.add_argument("--workdir", default="/tmp/ab_rdoq_modules")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        # the ambient axon sitecustomize pins jax_platforms through
        # jax.config; the env var alone does NOT stick (tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))

    from coolchic_tpu.io.images import read_png
    from coolchic_tpu.train.encode import encode_image
    from coolchic_tpu.train.presets import PresetDebug
    from coolchic_tpu.utils.codingstructure import CodingStructure
    from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args

    rows = []

    # ---- Part A: image (I frame), all four modules.
    frame = read_png(os.path.join(HERE, "tests/data/192x128_kodim15.png"))
    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], frame.img_size)}
    preset = PresetDebug(lmbda=args.lmbda, start_lr=1e-2,
                         itr_main_training=args.n_itr)
    # PresetDebug hardcodes a 50+10 schedule and ignores itr_main_training;
    # apply the requested budget to the first phase so --n_itr is honest
    preset.training_phases[0].max_itr = args.n_itr
    preset.training_phases[0].freq_valid = max(args.n_itr // 4, 10)
    t0 = time.time()
    params, fcfg, nn_side_info, _ = encode_image(
        frame, cfgs, preset, seed=0, verbose=False, rdoq=False)
    print(f"image encode (no rdoq): {time.time() - t0:.1f}s", flush=True)
    cs = CodingStructure(n_frames=1, intra_pos=[0])
    target = np.asarray(frame.data, np.float32)
    _prefix_walk(params, "residue", fcfg.cc_cfgs["residue"],
                 nn_side_info["residue"], args.lmbda, target, "I", "rgb", 8,
                 None, fcfg, nn_side_info,
                 {"target": frame.data}, True, cs, rows, "image_I_192x128")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:  # partial dump: part A survives a B crash
        json.dump({"n_itr": args.n_itr, "lmbda": args.lmbda, "rows": rows}, f,
                  indent=1)
    for r in rows:
        print(f"[partA] {r['modules']:34s} loss {r['loss']:.6f} "
              f"psnr {r['psnr_db']:.3f} bytes {r['n_bytes']}", flush=True)

    # ---- Part B: video P frame, residue AND motion cool-chics.
    if not args.skip_video:
        os.makedirs(args.workdir, exist_ok=True)
        from coolchic_tpu.train.video import (_dense, _rdoq_frame_ctx,
                                              encode_one_frame)
        from coolchic_tpu.models.frame import frame_cr_grids
        from coolchic_tpu.io.io import load_frame_data_from_file

        yuv = os.path.join(
            HERE, "tests/data/D-BQSquare-3frames_224x128_60p_yuv420_8b.yuv")
        from coolchic_tpu.utils.parsecli import parse_frame_positions

        cs3 = CodingStructure(n_frames=3, intra_pos=[0],
                              p_pos=parse_frame_positions("-1", 3),
                              seq_name="bq3")
        # frame 0 (I) then frame 1 in coding order (P) WITHOUT rdoq; the P
        # checkpoint is the starting point for the prefix walk
        from coolchic_tpu.utils.parsecli import MOTION_OPERATING_POINTS

        from coolchic_tpu.utils.parsecli import RESIDUE_OPERATING_POINTS

        cfg_args = {"residue": dict(RESIDUE_OPERATING_POINTS["lop"]),
                    "motion": dict(MOTION_OPERATING_POINTS["mop"])}
        for ci in range(2):
            fr = cs3.get_frame_from_coding_order(ci)
            t0 = time.time()
            ca = cfg_args if fr.frame_type != "I" else \
                {"residue": dict(INTRA_OPERATING_POINTS["lop"])}
            encode_one_frame(fr, cs3, yuv, args.workdir, preset, ca,
                             warp_filter_size=4, seed=0, verbose=False,
                             rdoq=False)
            print(f"video frame {ci} (no rdoq): {time.time() - t0:.1f}s",
                  flush=True)
        from coolchic_tpu.utils.checkpoint import load_frame_encoder

        frp = cs3.get_frame_from_coding_order(1)
        ck = os.path.join(args.workdir,
                          f"{frp.display_order:04d}-frame_encoder.npz")
        paramsP, fcfgP, nsiP = load_frame_encoder(ck)
        fdata = load_frame_data_from_file(yuv, frp.display_order)
        refs = []
        for ref_idx in frp.index_references:
            from coolchic_tpu.train.video import _decoded_name
            rp = os.path.join(args.workdir, _decoded_name(ref_idx, fdata, False))
            refs.append(np.asarray(_dense(load_frame_data_from_file(rp))))
        cr = frame_cr_grids(fcfgP)
        tgt_dense = _dense(fdata)
        tdata = {"target": fdata.data, "refs": refs}
        for cc_name in ("residue", "motion"):
            fctx = _rdoq_frame_ctx(paramsP, fcfgP, cc_name, refs, cr)
            _prefix_walk(paramsP, cc_name, fcfgP.cc_cfgs[cc_name],
                         nsiP[cc_name], args.lmbda, tgt_dense,
                         fcfgP.frame_type, fdata.frame_data_type,
                         fdata.bitdepth, fctx, fcfgP, nsiP, tdata, False, cs3,
                         rows, f"video_P_{cc_name}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"n_itr": args.n_itr, "lmbda": args.lmbda, "rows": rows}, f,
                  indent=1)
    for r in rows:
        d = (f"  dLoss {r['delta_loss_vs_prev']:+.3e} dBytes "
             f"{r['delta_bytes_vs_prev']:+5d} dPSNR {r['delta_psnr_vs_prev']:+.3f}"
             if "added_module" in r else "")
        print(f"{r['case']:20s} {r['modules']:40s} loss {r['loss']:.5f} "
              f"psnr {r['psnr_db']:.3f} bytes {r['n_bytes']}{d}", flush=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
