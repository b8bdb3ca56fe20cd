"""Frame / video level bitstream decoding.

Reference parity: coolchic/bitstream/decode.py.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from coolchic_tpu.bitstream.codec import decode_coolchic
from coolchic_tpu.bitstream.headers import CoolChicHeader, FrameHeader, VideoHeader
from coolchic_tpu.io.framedata import FrameData
from coolchic_tpu.io.yuv import convert_420_to_444, convert_444_to_420, yuv_dict_clamp
from coolchic_tpu.utils.codingstructure import CodingStructure


def decode_frame(bitstream: bytes, reference_frames: list[FrameData] | None = None,
                 profile: str = "ref") -> tuple[FrameData, bytes]:
    frame_header, bitstream = FrameHeader.read(bitstream)
    frame_type = frame_header.frame_type
    bitdepth = frame_header.bitdepth
    frame_data_type = frame_header.frame_data_type

    cc_names = ["residue"] + (["motion"] if frame_type in ("P", "B") else [])
    cc_out = {}
    for name in cc_names:
        cc_header, bitstream = CoolChicHeader.read(bitstream)
        bytes_nn = bitstream[:cc_header.nn_n_bytes]
        bitstream = bitstream[cc_header.nn_n_bytes:]
        bytes_latent = bitstream[:cc_header.n_bytes_latent]
        bitstream = bitstream[cc_header.n_bytes_latent:]
        raw_out, _ = decode_coolchic(cc_header, bytes_nn, bytes_latent, profile=profile)
        cc_out[name] = raw_out

    if frame_type == "I":
        decoded = cc_out["residue"]
    else:
        from coolchic_tpu.models.warp import apply_global_translation, warp_fn

        if frame_data_type == "yuv420":
            raw_refs = [convert_420_to_444(r.data) for r in reference_frames]
        else:
            raw_refs = [np.asarray(r.data) for r in reference_frames]
        flows = np.asarray(frame_header.global_flow, dtype=np.float32)
        global_flows = [flows[2 * i:2 * i + 2].reshape(1, 2, 1, 1)
                        for i in range(frame_header.n_refs)]
        shifted = apply_global_translation(raw_refs, global_flows)

        residue = cc_out["residue"][:, :3]
        alpha = np.clip(cc_out["residue"][:, 3:4] + 0.5, 0.0, 1.0)
        flow_1 = cc_out["motion"][:, 0:2]
        fsize = frame_header.warp_filter_size
        if frame_type == "P":
            pred = warp_fn(shifted[0], flow_1, fsize)
        else:
            flow_2 = cc_out["motion"][:, 2:4]
            beta = np.clip(cc_out["residue"][:, 4:5] + 0.5, 0.0, 1.0)
            pred = beta * warp_fn(shifted[0], flow_1, fsize) \
                + (1 - beta) * warp_fn(shifted[1], flow_2, fsize)
        decoded = alpha * pred + residue

    return _finish_frame(decoded, bitdepth, frame_data_type), bitstream


def _finish_frame(decoded: np.ndarray, bitdepth: int,
                  frame_data_type: str) -> FrameData:
    """Bitdepth rounding + 444->420 tail shared by single and batched decode
    (reference coolchic/bitstream/decode.py:188-207 semantics)."""
    max_dyn = 2**bitdepth - 1
    decoded = np.round(max_dyn * decoded) / max_dyn

    if frame_data_type == "yuv420":
        decoded = yuv_dict_clamp(convert_444_to_420(decoded), 0.0, 1.0)
        decoded = {k: np.round(v * max_dyn) / max_dyn for k, v in decoded.items()}
    else:
        decoded = np.clip(decoded, 0.0, 1.0)
        decoded = np.round(decoded * max_dyn) / max_dyn

    return FrameData(bitdepth=bitdepth, frame_data_type=frame_data_type, data=decoded)


def _decode_items_batched(items: list) -> list:
    """Route a batch of tpu-profile cool-chic payloads to the fully
    on-device decoder (bitstream/device_decode.py -- one jitted program per
    architecture group, Pallas kernels + on-device IFCE + float tail), with
    the host-orchestrated path (codec.decode_coolchic_batched) as fallback
    for groups the device program does not cover (common randomness, mixed
    architectures within a group, very wide grids, certificate failures).
    Set COOLCHIC_DEVICE_DECODE=0 to force the host path."""
    from coolchic_tpu.bitstream.codec import decode_coolchic_batched
    from coolchic_tpu.bitstream.device_decode import (
        _group_key,
        decode_images_device,
    )

    if os.environ.get("COOLCHIC_DEVICE_DECODE", "1") == "0":
        return decode_coolchic_batched(items)

    groups: dict[tuple, list[int]] = {}
    for i, (header, _, _) in enumerate(items):
        groups.setdefault(_group_key(header.to_config()), []).append(i)

    outputs: list = [None] * len(items)
    for idxs in groups.values():
        sub = [items[i] for i in idxs]
        try:
            res = decode_images_device(sub)
        except ValueError:
            res = decode_coolchic_batched(sub)
        for i, r in zip(idxs, res):
            outputs[i] = r
    return outputs


def decode_images(bitstream_paths: list[str],
                  decoded_paths: Optional[list[str]] = None
                  ) -> list[FrameData]:
    """Batched decode of N single-frame intra `tpu`-profile bitstreams.

    Same-shape latent grids of DIFFERENT images decode together inside one
    grid-batched Pallas kernel call (up to 8 grids stacked on the sublane
    axis, codec.decode_coolchic_batched) -- the throughput path for decoding
    an image set (e.g. the 24-image Kodak sweep) on one chip. The reference
    has no equivalent; its decoder is strictly one process per bitstream.
    """
    from coolchic_tpu.bitstream.encode import TPU_PROFILE_MAGIC

    items, metas = [], []
    for path in bitstream_paths:
        with open(path, "rb") as f:
            bitstream = f.read()
        if not bitstream.startswith(TPU_PROFILE_MAGIC):
            raise ValueError(f"{path}: not a tpu-profile bitstream; batched "
                             "decode needs --profile tpu encodes")
        bitstream = bitstream[len(TPU_PROFILE_MAGIC):]
        video_header, bitstream = VideoHeader.read(bitstream)
        if video_header.n_frames != 1:
            raise ValueError(f"{path}: {video_header.n_frames} frames; "
                             "batched decode covers single-frame bitstreams")
        frame_header, bitstream = FrameHeader.read(bitstream)
        assert frame_header.frame_type == "I"
        cc_header, bitstream = CoolChicHeader.read(bitstream)
        bytes_nn = bitstream[:cc_header.nn_n_bytes]
        bitstream = bitstream[cc_header.nn_n_bytes:]
        bytes_latent = bitstream[:cc_header.n_bytes_latent]
        items.append((cc_header, bytes_nn, bytes_latent))
        metas.append(frame_header)

    outputs = _decode_items_batched(items)

    frames = []
    for i, (frame_header, (raw_out, _)) in enumerate(zip(metas, outputs)):
        frame_data = _finish_frame(raw_out, frame_header.bitdepth,
                                   frame_header.frame_data_type)
        frames.append(frame_data)
        if decoded_paths is not None:
            from coolchic_tpu.io.io import save_frame_data_to_file

            save_frame_data_to_file(frame_data, decoded_paths[i])
    return frames


def decode_video(bitstream_path: str, decoded_path: Optional[str] = None,
                 max_decoding_order: int = -1, verbosity: int = 0) -> dict[str, FrameData]:
    with open(bitstream_path, "rb") as f:
        bitstream = f.read()

    # Profile sniff: `tpu`-profile files carry a container magic; the
    # reference format is headerless (docs/tpu_profile.md).
    from coolchic_tpu.bitstream.encode import TPU_PROFILE_MAGIC

    profile = "ref"
    if bitstream.startswith(TPU_PROFILE_MAGIC):
        profile = "tpu"
        bitstream = bitstream[len(TPU_PROFILE_MAGIC):]

    video_header, bitstream = VideoHeader.read(bitstream)
    coding_structure = CodingStructure(
        n_frames=video_header.n_frames,
        intra_pos=list(video_header.intra_pos),
        p_pos=list(video_header.p_pos),
    )

    if max_decoding_order == -1:
        max_decoding_order = coding_structure.get_max_coding_order()

    for coding_idx in range(max_decoding_order + 1):
        frame = coding_structure.get_frame_from_coding_order(coding_idx)
        refs = [coding_structure.get_frame_from_display_order(i).data
                for i in frame.index_references]
        frame_data, bitstream = decode_frame(bitstream, refs, profile=profile)
        frame.data = frame_data

    all_frames: dict[str, FrameData] = {}
    for display_idx in range(coding_structure.get_max_display_order() + 1):
        frame = coding_structure.get_frame_from_display_order(display_idx)
        if frame.data is None:
            continue
        all_frames[str(display_idx)] = frame.data
        if decoded_path is not None:
            from coolchic_tpu.io.io import save_frame_data_to_file

            save_frame_data_to_file(frame.data, decoded_path, append=display_idx != 0)
    return all_frames
