"""Frame / video level bitstream writing.

Reference parity: coolchic/bitstream/encode.py.
"""

from __future__ import annotations

import numpy as np

from coolchic_tpu.bitstream.codec import encode_coolchic_latents
from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader
from coolchic_tpu.bitstream.nncodec import encode_network, flatten_module_params
from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.core.constants import AC_MAX_VAL
from coolchic_tpu.models.frame import FrameConfig
from coolchic_tpu.utils.codingstructure import CodingStructure


def _int_arm_params(cc_params: dict, cfg: CoolChicConfig, q_shift: dict) -> dict:
    """Integer (round(param / q_step)) ARM + IFCE params for the fixed-point
    path, in the decode_network output layout."""
    out: dict = {}
    for module in ("arm", "ifce"):
        for wb in ("weight", "bias"):
            arrays = flatten_module_params(cc_params, cfg, module, wb)
            if not arrays:
                continue
            q = 2.0 ** q_shift[(module, wb)]
            ints = [np.round(np.asarray(a, dtype=np.float64) / q).astype(np.int64)
                    for a in arrays]
            from coolchic_tpu.bitstream.nncodec import unflatten_module_params

            unflatten_module_params(ints, cfg, module, wb, out)
    return out


# `tpu` bitstream profile container magic (see docs/tpu_profile.md). A
# reference-format stream is headerless, so profile detection is by prefix.
TPU_PROFILE_MAGIC = b"CCTP\x01"


def encode_coolchic(cc_params: dict, cfg: CoolChicConfig, q_shift: dict, expgol: dict,
                    profile: str = "ref") -> bytes:
    """One cool-chic decoder -> [CoolChicHeader || NN bytes || latent bytes]."""
    bytes_nn, n_pad = encode_network(cc_params, cfg, q_shift, expgol)

    # Hardround + gain + clamp, as written to the bitstream.
    quantized_latents = [
        np.clip(np.round(np.asarray(lat, dtype=np.float32) * cfg.encoder_gain),
                -AC_MAX_VAL, AC_MAX_VAL - 1).astype(np.int64)
        for lat in cc_params["latents"]
    ]

    header = CoolChicHeader.from_config(
        cfg, nn_q_step_shift=dict(q_shift), nn_expgol_cnt=dict(expgol),
        nn_n_bytes=len(bytes_nn), nn_n_bit_pad=n_pad, n_bytes_latent=0)

    nn_int = _int_arm_params(cc_params, cfg, q_shift)
    bytes_latent = encode_coolchic_latents(header, nn_int, quantized_latents,
                                           profile=profile)
    return header.to_bytes() + bytes_nn + bytes_latent


def encode_frame(frame_params: dict, fcfg: FrameConfig, coding_structure: CodingStructure,
                 nn_side_info: dict, is_first_frame: bool = True,
                 profile: str = "ref") -> bytes:
    """Serialize one frame.

    nn_side_info: {cc_name: (q_shift dict, expgol dict)} from quantize_model.
    profile: "ref" = reference bit-compatible; "tpu" = parallel-stream latent
    payloads inside a CCTP container (docs/tpu_profile.md).
    """
    out = b""
    if is_first_frame and profile == "tpu":
        out += TPU_PROFILE_MAGIC
    if is_first_frame:
        out += VideoHeader(
            n_frames=coding_structure.n_frames,
            intra_pos=tuple(coding_structure.intra_pos),
            p_pos=tuple(coding_structure.p_pos),
        ).to_bytes()

    gflow = []
    if fcfg.frame_type in ("P", "B"):
        gflow = [int(v) for v in np.asarray(frame_params["global_flow_1"]).round()]
        if fcfg.frame_type == "B":
            gflow += [int(v) for v in np.asarray(frame_params["global_flow_2"]).round()]

    out += FrameHeader(
        display_index=fcfg.frame_display_index,
        frame_type=fcfg.frame_type,
        frame_data_type=fcfg.frame_data_type,
        bitdepth=fcfg.bitdepth,
        index_references=tuple(fcfg.index_references),
        global_flow=tuple(gflow),
        warp_filter_size=fcfg.warp_filter_size if fcfg.frame_type != "I" else None,
    ).to_bytes()

    cc_names = ["residue"] + (["motion"] if fcfg.frame_type in ("P", "B") else [])
    for name in cc_names:
        q_shift, expgol = nn_side_info[name]
        out += encode_coolchic(frame_params[name], fcfg.cc_cfgs[name], q_shift, expgol,
                               profile=profile)
    return out
