"""Frame-level model: one or two Cool-Chic decoders + motion compensation.

For an I frame the decoded image is the residue decoder's output; for P/B
frames the motion decoder produces optical flow(s) and the residue decoder
produces (residue, alpha[, beta]) so that

    P: x = alpha * warp(ref1, flow1) + residue
    B: x = alpha * (beta * warp(ref1, flow1) + (1-beta) * warp(ref2, flow2))
           + residue         (alpha, beta = clamp(raw + 0.5, 0, 1))

Reference parity: coolchic/component/frame.py:96-352.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.models.coolchic import coolchic_forward, coolchic_init, make_cr_grids
from coolchic_tpu.models.warp import warp_fn


@dataclass(frozen=True)
class FrameConfig:
    """Static description of one frame-encoder (hashable; closed over by jit)."""

    coolchic_cfg: Dict[str, CoolChicConfig] | Tuple[Tuple[str, CoolChicConfig], ...]
    frame_type: str = "I"
    frame_data_type: str = "rgb"
    bitdepth: int = 8
    index_references: Tuple[int, ...] = ()
    frame_display_index: int = 0
    warp_filter_size: int = 8

    def __post_init__(self):
        if isinstance(self.coolchic_cfg, dict):
            object.__setattr__(self, "coolchic_cfg", tuple(self.coolchic_cfg.items()))

    @property
    def cc_cfgs(self) -> Dict[str, CoolChicConfig]:
        return dict(self.coolchic_cfg)

    @property
    def n_refs(self) -> int:
        return {"I": 0, "P": 1, "B": 2}[self.frame_type]


class FrameEncoderOutput(NamedTuple):
    decoded_image: jnp.ndarray | dict
    rate: Dict[str, jnp.ndarray]
    # inter-frame intermediates for the detailed logs (reference
    # FrameEncoderOutput.additional_data, training/test.py:160-235):
    # {"alpha", "beta", "pred", "residue", "flow_1", "flow_2"}; None for I
    # frames or when not requested.
    additional_data: Optional[dict] = None


def frame_encoder_init(key: jax.Array, fcfg: FrameConfig,
                       img_min_max: Optional[jnp.ndarray] = None) -> dict:
    """Params: {"residue": <coolchic params>[, "motion": ...],
    "global_flow_1": [2], "global_flow_2": [2]}."""
    params: dict = {}
    for name, cfg in fcfg.cc_cfgs.items():
        key, sub = jax.random.split(key)
        params[name] = coolchic_init(sub, cfg, img_min_max if name == "residue" else None)
    params["global_flow_1"] = jnp.zeros((2,), dtype=jnp.float32)
    params["global_flow_2"] = jnp.zeros((2,), dtype=jnp.float32)
    return params


def frame_cr_grids(fcfg: FrameConfig) -> dict:
    return {name: make_cr_grids(cfg) for name, cfg in fcfg.cc_cfgs.items()}


def _to_420(x: jnp.ndarray) -> dict:
    b, c, h, w = x.shape
    y = x[:, 0:1]
    uv = x[:, 1:3].reshape(b, 2, h // 2, 2, w // 2, 2).mean(axis=(3, 5))
    return {"y": y, "u": uv[:, 0:1], "v": uv[:, 1:2]}


def frame_encoder_forward(params: dict, fcfg: FrameConfig, *,
                          reference_frames: Optional[list] = None,
                          key: Optional[jax.Array] = None,
                          quantizer_noise_type: str = "kumaraswamy",
                          quantizer_type: str = "softround",
                          soft_round_temperature=0.3,
                          noise_parameter=1.0,
                          training: bool = True,
                          ac_max_val: int = -1,
                          cr: Optional[dict] = None) -> FrameEncoderOutput:
    additional: Optional[dict] = None
    cc_out = {}
    for name, cfg in fcfg.cc_cfgs.items():
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        cc_out[name] = coolchic_forward(
            params[name], cfg, key=sub,
            quantizer_noise_type=quantizer_noise_type, quantizer_type=quantizer_type,
            soft_round_temperature=soft_round_temperature, noise_parameter=noise_parameter,
            training=training, ac_max_val=ac_max_val,
            cr=None if cr is None else cr.get(name))

    rate = {name: out.rate for name, out in cc_out.items()}

    if fcfg.frame_type == "I":
        decoded = cc_out["residue"].raw_out
    else:
        raw = cc_out["residue"].raw_out
        residue = raw[:, :3]
        alpha = jnp.clip(raw[:, 3:4] + 0.5, 0.0, 1.0)
        motion = cc_out["motion"].raw_out
        flow_1 = motion[:, 0:2]

        # Global flows shift the references as constant translations.
        refs = []
        for i, ref in enumerate(reference_frames):
            gflow = params[f"global_flow_{i + 1}"]
            h, w = ref.shape[-2:]
            # nearest warp of a constant integer flow == clamped index shift
            jj = jnp.clip(jnp.arange(w) + jnp.round(gflow[0]).astype(jnp.int32), 0, w - 1)
            ii = jnp.clip(jnp.arange(h) + jnp.round(gflow[1]).astype(jnp.int32), 0, h - 1)
            refs.append(ref[:, :, ii][:, :, :, jj])

        if fcfg.frame_type == "P":
            pred = warp_fn(refs[0], flow_1, fcfg.warp_filter_size, training=training)
            beta = None
            flow_2 = None
        else:
            flow_2 = motion[:, 2:4]
            beta = jnp.clip(raw[:, 4:5] + 0.5, 0.0, 1.0)
            pred = beta * warp_fn(refs[0], flow_1, fcfg.warp_filter_size, training=training) \
                + (1.0 - beta) * warp_fn(refs[1], flow_2, fcfg.warp_filter_size,
                                         training=training)
        decoded = alpha * pred + residue
        additional = {"alpha": alpha, "beta": beta, "pred": pred,
                      "masked_pred": alpha * pred, "residue": residue,
                      "flow_1": flow_1, "flow_2": flow_2}

    if fcfg.frame_data_type == "yuv420":
        decoded = {k: jnp.clip(v, 0.0, 1.0) for k, v in _to_420(decoded).items()}
    elif fcfg.frame_data_type != "flow":
        decoded = jnp.clip(decoded, 0.0, 1.0)

    if not training:
        max_dyn = 2**fcfg.bitdepth - 1
        if fcfg.frame_data_type == "yuv420":
            decoded = {k: jnp.round(v * max_dyn) / max_dyn for k, v in decoded.items()}
        else:
            decoded = jnp.round(decoded * max_dyn) / max_dyn

    return FrameEncoderOutput(decoded_image=decoded, rate=rate,
                              additional_data=additional)
