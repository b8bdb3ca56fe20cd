"""Architecture DSL parsing + decoder operating points (vlop..vhop).

DSLs (reference coolchic/utils/parsecli.py):
  - synthesis: "48-1-linear-relu,3-1-linear-none,.../stabiliser"; the literal
    out-feature "X" is substituted per frame type (3 for I-residue, 4/5 for
    P/B-residue, 2/4 for motion);
  - ARM: "<n_ctx>,<n_hidden>[/stabiliser]";
  - latent / hyperlatent resolution: "lo-hi", "no", or "auto" (floor chosen
    from the pixel count: <1M -> 1/64, <3M -> 1/128, else 1/256);
  - ifce resolution: "lo-hi" or "no";
  - frame position DSL for --intra_pos/--p_pos: "0,4-7,-2".
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

from coolchic_tpu.core.arch import CoolChicConfig


def parse_synthesis_layers(layers: str) -> tuple[list[str], bool]:
    stabiliser = layers.endswith("/stabiliser")
    if stabiliser:
        layers = layers[: -len("/stabiliser")]
    return [x for x in layers.split(",") if x], stabiliser


def parse_arm(arm: str) -> dict:
    stabiliser = arm.endswith("/stabiliser")
    if stabiliser:
        arm = arm[: -len("/stabiliser")]
    n_ctx, n_hidden = [int(x) for x in arm.split(",")]
    return {"spatial_context_arm": n_ctx, "n_hidden_layers_arm": n_hidden,
            "linear_stabiliser_arm": stabiliser}


def _auto_floor(n_pixels: int) -> int:
    if n_pixels < 1_000_000:
        return 6
    if n_pixels < 3_000_000:
        return 7
    return 8


def parse_latent_resolution(s: str, n_pixels: int) -> Tuple[int, int]:
    if s == "auto":
        return (0, _auto_floor(n_pixels))
    return tuple(int(x) for x in s.split("-") if x != "")


def parse_hyperlatent_resolution(s: str, n_pixels: int) -> Optional[Tuple[int, int]]:
    if s == "no":
        return None
    if s == "auto":
        return (4, _auto_floor(n_pixels))
    return tuple(int(x) for x in s.split("-") if x != "")


def parse_ifce_resolution(s: str) -> Optional[Tuple[int, int]]:
    return None if s == "no" else tuple(int(x) for x in s.split("-") if x != "")


def parse_frame_positions(s: str, n_frames: int) -> list[int]:
    """"0,4-7,-2" -> [0, 4, 5, 6, 7, n_frames - 2]."""
    out: list[int] = []
    if not s:
        return out
    for tok in s.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "-" in tok.lstrip("-"):
            # range a-b (careful with a leading minus sign)
            neg = tok.startswith("-")
            body = tok[1:] if neg else tok
            a, b = body.split("-")
            a, b = int(a), int(b)
            if neg:
                a = -a
            out.extend(range(a, b + 1))
        else:
            v = int(tok)
            out.append(v if v >= 0 else n_frames + v)
    return sorted(dict.fromkeys(v if v >= 0 else n_frames + v for v in out))


def substitute_x_channels(layers: list[str], out_ft: int) -> list[str]:
    """Replace the literal 'X' output-feature with the frame-derived count
    (reference component/video.py:103-119)."""
    return [lay.replace("X", str(out_ft)) if lay.startswith("X") else lay for lay in layers]


def synthesis_out_ft(coolchic_name: str, frame_type: str) -> int:
    """Output channels: residue I->3, P->4 (+alpha), B->5 (+alpha,beta);
    motion P->2, B->4 (two flows)."""
    if coolchic_name == "residue":
        return {"I": 3, "P": 4, "B": 5}[frame_type]
    return {"P": 2, "B": 4}[frame_type]


# ---------------------------------------------------------------------------
# Decoder operating points (verbatim content of cfg/dec/*/*.cfg).
# ---------------------------------------------------------------------------
INTRA_OPERATING_POINTS: Dict[str, Dict[str, str]] = {
    "lop": dict(latent_resolution="auto", hyperlatent_resolution="auto",
                arm="6,2/stabiliser", output_feature_ifce="2", ifce_resolution="0-2",
                layers_synthesis="8-1-linear-relu,3-1-linear-none,3-3-residual-none/stabiliser",
                ups_k_size="8", ups_preconcat_k_size="7"),
    "mop": dict(latent_resolution="auto", hyperlatent_resolution="auto",
                arm="10,2/stabiliser", output_feature_ifce="4", ifce_resolution="0-2",
                layers_synthesis="16-1-linear-relu,3-1-linear-none,3-3-residual-relu,"
                                 "3-3-residual-none/stabiliser",
                ups_k_size="8", ups_preconcat_k_size="7"),
    "hop": dict(latent_resolution="auto", hyperlatent_resolution="auto",
                arm="14,2/stabiliser", output_feature_ifce="6", ifce_resolution="0-2",
                layers_synthesis="48-1-linear-relu,3-1-linear-none,3-3-residual-relu,"
                                 "3-3-residual-none/stabiliser",
                ups_k_size="8", ups_preconcat_k_size="7"),
    "vhop": dict(latent_resolution="auto", hyperlatent_resolution="auto",
                 arm="20,2/stabiliser", output_feature_ifce="6", ifce_resolution="0-2",
                 layers_synthesis="64-1-linear-relu,3-1-linear-none,3-3-residual-relu,"
                                  "3-3-residual-none/stabiliser",
                 ups_k_size="8", ups_preconcat_k_size="7"),
}

RESIDUE_OPERATING_POINTS: Dict[str, Dict[str, str]] = {
    "vlop": dict(latent_resolution="auto", hyperlatent_resolution="auto",
                 arm="6,1/stabiliser", output_feature_ifce="0", ifce_resolution="no",
                 layers_synthesis="8-1-linear-relu,X-1-linear-none,X-3-residual-none/stabiliser",
                 ups_k_size="8", ups_preconcat_k_size="7"),
    "lop": dict(latent_resolution="auto", hyperlatent_resolution="auto",
                arm="6,2/stabiliser", output_feature_ifce="0", ifce_resolution="no",
                layers_synthesis="16-1-linear-relu,X-1-linear-none,X-3-residual-none/stabiliser",
                ups_k_size="8", ups_preconcat_k_size="7"),
    "mop": dict(latent_resolution="auto", hyperlatent_resolution="auto",
                arm="10,2/stabiliser", output_feature_ifce="2", ifce_resolution="0-2",
                layers_synthesis="16-1-linear-relu,X-1-linear-none,X-3-residual-none/stabiliser",
                ups_k_size="8", ups_preconcat_k_size="7"),
    "hop": dict(latent_resolution="auto", hyperlatent_resolution="auto",
                arm="10,2/stabiliser", output_feature_ifce="4", ifce_resolution="0-2",
                layers_synthesis="48-1-linear-relu,X-1-linear-none,X-3-residual-none/stabiliser",
                ups_k_size="8", ups_preconcat_k_size="7"),
}

MOTION_OPERATING_POINTS: Dict[str, Dict[str, str]] = {
    "lop": dict(latent_resolution="2-6", hyperlatent_resolution="no",
                arm="6,1/stabiliser", output_feature_ifce="2", ifce_resolution="no",
                layers_synthesis="8-1-linear-relu,X-1-linear-none/stabiliser",
                ups_k_size="8", ups_preconcat_k_size="7", warp_filter_size="8"),
    "mop": dict(latent_resolution="2-6", hyperlatent_resolution="no",
                arm="6,2/stabiliser", output_feature_ifce="2", ifce_resolution="2-2",
                layers_synthesis="16-1-linear-relu,X-1-linear-none/stabiliser",
                ups_k_size="8", ups_preconcat_k_size="7", warp_filter_size="8"),
}


def coolchic_config_from_args(cfg_args: Dict[str, str], img_size: Tuple[int, int],
                              coolchic_name: str = "residue", frame_type: str = "I",
                              tune: str = "mse") -> CoolChicConfig:
    """Build a CoolChicConfig from a cfg-style string dict (an operating point
    or user overrides)."""
    n_pixels = img_size[0] * img_size[1]
    layers, stab_synth = parse_synthesis_layers(cfg_args["layers_synthesis"])
    layers = substitute_x_channels(layers, synthesis_out_ft(coolchic_name, frame_type))
    arm = parse_arm(cfg_args["arm"])

    output_feature_ifce = int(cfg_args["output_feature_ifce"])
    ifce_resolution = parse_ifce_resolution(cfg_args["ifce_resolution"])
    if ifce_resolution is None:
        output_feature_ifce = 0

    flag_cr = coolchic_name == "residue" and tune == "wasserstein"
    final_ups = "nearest" if coolchic_name == "motion" else "bicubic"

    return CoolChicConfig(
        layers_synthesis=tuple(layers),
        linear_stabiliser_synth=stab_synth,
        ups_k_size=int(cfg_args["ups_k_size"]),
        ups_preconcat_k_size=int(cfg_args["ups_preconcat_k_size"]),
        ifce_resolution=ifce_resolution,
        output_feature_ifce=output_feature_ifce,
        latent_resolution=parse_latent_resolution(cfg_args["latent_resolution"], n_pixels),
        hyperlatent_resolution=parse_hyperlatent_resolution(
            cfg_args["hyperlatent_resolution"], n_pixels),
        flag_common_randomness=flag_cr,
        img_size=img_size,
        final_upsampling_type=final_ups,
        **arm,
    )
