"""Detailed per-frame logs (the reference's FrameEncoderLogs,
coolchic/training/test.py:32-234): loss breakdown, per-grid and per-module
rates, alpha/beta statistics for inter frames, decoder complexity.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from coolchic_tpu.models.coolchic import latent_rate, quantize_latents
from coolchic_tpu.models.frame import FrameConfig, frame_encoder_forward
from coolchic_tpu.nnquant.quantize import exp_golomb_nbins
from coolchic_tpu.train.loss import compute_mse, dist_to_db, loss_function
from coolchic_tpu.utils.complexity import macs_per_module, total_mac_per_pixel


def detailed_test(params: dict, fcfg: FrameConfig, target, *, refs=None, cr=None,
                  dist_weight: Optional[dict] = None, lmbda: float = 1e-3,
                  nn_side_info: Optional[dict] = None) -> dict:
    """Hardround eval with an exhaustive log dictionary."""
    dist_weight = dist_weight or {"mse": 1.0}
    out = frame_encoder_forward(params, fcfg, reference_frames=refs, training=False,
                                cr=None if cr is None else cr)

    n_pixels = fcfg.cc_cfgs["residue"].img_size[0] * fcfg.cc_cfgs["residue"].img_size[1]

    # --- NN rate per module (from the chosen q-steps / exp-Golomb orders).
    total_nn_bits = 0.0
    nn_rates = {}
    if nn_side_info:
        from coolchic_tpu.bitstream.nncodec import flatten_module_params

        for cc_name, (q_shift, expgol) in nn_side_info.items():
            cfg = fcfg.cc_cfgs[cc_name]
            for module in ("arm", "ifce", "upsampling", "synthesis"):
                for wb in ("weight", "bias"):
                    arrays = flatten_module_params(params[cc_name], cfg, module, wb)
                    if not arrays:
                        continue
                    q = 2.0 ** q_shift[(module, wb)]
                    ints = np.concatenate([np.round(np.asarray(a) / q).reshape(-1)
                                           for a in arrays])
                    bits = exp_golomb_nbins(ints, expgol[(module, wb)])
                    nn_rates[f"{cc_name}_{module}_{wb}_bpp"] = bits / n_pixels
                    total_nn_bits += bits

    lo = loss_function(out.decoded_image, out.rate, target, dist_weight, lmbda,
                       total_rate_nn_bit=total_nn_bits)

    logs = {
        "loss": float(lo.loss),
        "psnr_db": dist_to_db(float(lo.mse)),
        "dist": float(lo.dist),
        "rate_bpp": float(lo.rate_bpp),
        "rate_latent_bpp": float(lo.total_rate_latent_bpp),
        "rate_nn_bpp": total_nn_bits / n_pixels,
        "n_pixels": n_pixels,
    }
    logs.update(nn_rates)

    # --- Per-cool-chic and per-grid latent rates + alpha/beta stats.
    for cc_name, cfg in fcfg.cc_cfgs.items():
        rate = np.asarray(out.rate[cc_name])
        logs[f"{cc_name}_rate_bpp"] = float(rate.sum()) / n_pixels
        ptr = 0
        for i, (h, w) in enumerate(cfg.size_per_latent):
            n = h * w
            logs[f"{cc_name}_grid{i}_bpp"] = float(rate[ptr:ptr + n].sum()) / n_pixels
            ptr += n
        logs[f"{cc_name}_mac_per_pixel"] = total_mac_per_pixel(cfg)
        for mod, macs in macs_per_module(cfg).items():
            logs[f"{cc_name}_{mod}_mac_per_pixel"] = macs

    if fcfg.frame_type in ("P", "B"):
        from coolchic_tpu.models.coolchic import coolchic_forward

        raw = coolchic_forward(params["residue"], fcfg.cc_cfgs["residue"],
                               training=False).raw_out
        alpha = np.clip(np.asarray(raw[:, 3:4]) + 0.5, 0.0, 1.0)
        logs["alpha_mean"] = float(alpha.mean())
        if fcfg.frame_type == "B":
            beta = np.clip(np.asarray(raw[:, 4:5]) + 0.5, 0.0, 1.0)
            logs["beta_mean"] = float(beta.mean())

    # YUV420 per-channel PSNR.
    if isinstance(out.decoded_image, dict):
        for k in ("y", "u", "v"):
            mse_k = float(compute_mse(jnp.asarray(out.decoded_image[k]),
                                      jnp.asarray(target[k])))
            logs[f"psnr_{k}_db"] = dist_to_db(mse_k)

    return logs


def pretty_logs(logs: dict) -> str:
    keys = ["loss", "psnr_db", "rate_bpp", "rate_latent_bpp", "rate_nn_bpp"]
    s = " | ".join(f"{k} {logs[k]:.5f}" for k in keys if k in logs)
    extras = {k: v for k, v in logs.items() if k.endswith("mac_per_pixel")}
    if extras:
        s += " | " + " ".join(f"{k}={v:.0f}" for k, v in extras.items())
    return s
