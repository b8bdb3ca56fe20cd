"""Shared encode/decode core for one cool-chic decoder.

Decode pipeline (all integer up to the synthesis):
  header -> NN params (exp-Golomb) -> fixed-point ARM -> per-grid IFCE
  context (int64, computed on the already-decoded coarser grids) -> native
  wavefront range decode (C++, one call per grid) -> float upsampling +
  synthesis + final rescale on the accelerator.

Reference parity: coolchic/bitstream/component/coolchic.py:29-207.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from coolchic_tpu.bitstream import rangecoder as rc
from coolchic_tpu.bitstream.fixedpoint import (
    IFCE_OUTPUT_SHIFT,
    arm_to_fixed_point,
)
from coolchic_tpu.bitstream.headers import CoolChicHeader
from coolchic_tpu.bitstream.nncodec import decode_network
from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.core.constants import non_zero_pixel_ctx_index
from coolchic_tpu.core.noise import common_randomness_grids
from coolchic_tpu.models.arm import ifce_arm_index
from coolchic_tpu.models.synthesis import synthesis_apply
from coolchic_tpu.models.upsampling import fixed_upsampling, upsampling_apply
from coolchic_tpu.ops.resize import interpolate


def _nearest_x2_int(x: np.ndarray) -> np.ndarray:
    return np.repeat(np.repeat(x, 2, axis=-2), 2, axis=-1)


def _fixed_upsampling_nearest_int(grids: list[np.ndarray]) -> np.ndarray:
    """Dense [C, h, w] nearest-upsampled stack of already-decoded int grids
    (largest grid first in `grids`)."""
    rev = list(reversed(grids))
    acc = rev[0][None]
    for target in rev[1:]:
        if acc.shape[-2:] != target.shape[-2:]:
            x = _nearest_x2_int(acc)[:, : target.shape[-2], : target.shape[-1]]
        else:
            x = acc
        acc = np.concatenate([target[None], x], axis=0)
    return acc


def _ifce_fixed_params(nn_params: dict, cfg: CoolChicConfig, header: CoolChicHeader,
                       idx_latent: int, model: int = 0) -> dict:
    arm_idx = ifce_arm_index(cfg.input_features_ifce)[idx_latent]
    ifce_arm = nn_params["ifce"]["arms"][arm_idx]
    kw = dict(stabiliser=None, subtract_last_layer=False, n_inter_ft_ctx=0,
              no_residual_layer=True)
    if model == 1:
        from coolchic_tpu.bitstream.tpu_cdf import arm8_from_int_layers

        return arm8_from_int_layers(
            ifce_arm["layers"],
            header.nn_q_step_shift[("ifce", "weight")],
            header.nn_q_step_shift[("ifce", "bias")], **kw)
    return arm_to_fixed_point(
        ifce_arm["layers"],
        header.nn_q_step_shift[("ifce", "weight")],
        header.nn_q_step_shift[("ifce", "bias")], **kw)


def _ifce_context_for_grid(nn_params: dict, cfg: CoolChicConfig, header: CoolChicHeader,
                           idx_latent: int, decoded: list[np.ndarray],
                           h_i: int, w_i: int, model: int = 0) -> Optional[np.ndarray]:
    """int64 [h_i * w_i, C_f] IFCE context (X.8) for the grid being
    (de)coded, or None when the architecture has no IFCE at all. model 1 =
    tpu-profile X.8 int32 pipeline (tpu_cdf.py), model 0 = reference X.16."""
    if not cfg.flag_ifce:
        return None

    if idx_latent == cfg.n_latent_grids - 1:
        ups = np.zeros((1, h_i, w_i), dtype=np.int64)
    else:
        ups = _fixed_upsampling_nearest_int(decoded)

    c, h, w = ups.shape
    if cfg.input_features_ifce[idx_latent] == 0:
        ctx = np.zeros((h * w, cfg.output_feature_ifce), dtype=np.int64)
    else:
        flat = ups.reshape(c, h * w).T  # [(h w), c]
        fp = _ifce_fixed_params(nn_params, cfg, header, idx_latent, model=model)
        out_shift, act_shift = (8, 8) if model == 1 else (IFCE_OUTPUT_SHIFT, 16)
        ctx = rc.arm_forward_native(flat, fp, out_shift, act_shift=act_shift)

    ctx = ctx.T.reshape(-1, h, w)
    ctx = _nearest_x2_int(ctx)[:, :h_i, :w_i]
    return ctx.reshape(-1, h_i * w_i).T.copy()


def _decoded_nn_to_jax(nn_params: dict) -> dict:
    """Upsampling / synthesis float params -> jnp arrays in the model layout."""
    ups = {k: [jnp.asarray(v) for v in vs] for k, vs in nn_params["upsampling"].items()}
    syn_src = nn_params["synthesis"]
    syn = {
        "output_transform": {k: jnp.asarray(v) for k, v in syn_src["output_transform"].items()},
        "layers": [{k: jnp.asarray(v) for k, v in lay.items()} for lay in syn_src["layers"]],
    }
    if "stabiliser" in syn_src:
        syn["stabiliser"] = {k: jnp.asarray(v) for k, v in syn_src["stabiliser"].items()}
    return {"upsampling": ups, "synthesis": syn}


from functools import lru_cache


@lru_cache(maxsize=32)
def _synthesize_fn(cfg: CoolChicConfig):
    import jax

    def fn(jparams, grids, cr):
        # The reference decoder leaves modules in train mode, so the
        # upsampling runs its 2-D (kron) variant; mirror that for closest
        # float parity.
        dense = upsampling_apply(jparams["upsampling"], list(grids), cfg.ups_k_size,
                                 cfg.ups_preconcat_k_size, training=True)
        syn_in = dense[None]
        if cfg.flag_common_randomness:
            ups_noise, _ = fixed_upsampling(list(cr), mode="bicubic")
            ups_noise = interpolate(ups_noise, cfg.img_size, "bicubic")[None]
            syn_in = jnp.concatenate([syn_in, ups_noise], axis=1)
        syn_out = synthesis_apply(jparams["synthesis"], cfg, syn_in)
        return interpolate(syn_out, cfg.img_size, cfg.final_upsampling_type)

    return jax.jit(fn)


def synthesize(nn_params: dict, cfg: CoolChicConfig, latent_grids: list[np.ndarray]
               ) -> np.ndarray:
    """Float decode tail: learned upsampling + synthesis + final rescale.

    latent_grids: decoded integer grids (largest first), all of them
    (hyperlatents are filtered here). Returns [1, C_out, H, W] float32.
    """
    jparams = _decoded_nn_to_jax(nn_params)
    grids = tuple(jnp.asarray(g, dtype=jnp.float32) for g, hyper
                  in zip(latent_grids, cfg.flag_is_hyperlatent) if not hyper)
    if cfg.flag_common_randomness:
        cr = tuple(jnp.asarray(g) for g in common_randomness_grids(list(cfg.size_per_latent_cr)))
    else:
        cr = ()
    return np.asarray(_synthesize_fn(cfg)(jparams, grids, cr))


def _main_arm_params(nn_params: dict, header: CoolChicHeader, cfg: CoolChicConfig,
                     model: int) -> dict:
    kw = dict(stabiliser=nn_params["arm"].get("stabiliser"),
              subtract_last_layer=True, n_inter_ft_ctx=cfg.output_feature_ifce)
    if model == 1:
        from coolchic_tpu.bitstream.tpu_cdf import arm8_from_int_layers

        return arm8_from_int_layers(
            nn_params["arm"]["layers"],
            header.nn_q_step_shift[("arm", "weight")],
            header.nn_q_step_shift[("arm", "bias")], **kw)
    return arm_to_fixed_point(
        nn_params["arm"]["layers"],
        header.nn_q_step_shift[("arm", "weight")],
        header.nn_q_step_shift[("arm", "bias")], **kw)


def _arm8_in_bound(arm_fp: dict, ifce_ctx: Optional[np.ndarray]) -> np.ndarray:
    """Per-column input bound (X.8) for the int32 ARM certificate: spatial
    columns are symbols in [-64, 63] shifted to X.8 (<= 64 * 2^8); IFCE
    columns are UNCLAMPED network outputs, so their bound is the actual
    per-column max |ifce_ctx| of the grid being coded."""
    dim = arm_fp["trunk_weights"][0].shape[0]
    n_ifce = 0 if ifce_ctx is None else int(ifce_ctx.shape[-1])
    in_bound = np.full(dim, 64.0 * 256.0)
    if n_ifce:
        in_bound[dim - n_ifce:] = np.abs(
            ifce_ctx.reshape(-1, n_ifce)).max(axis=0).astype(np.float64)
    return in_bound


def _check_arm8_certificate(arm_fp: dict, ifce_ctx: Optional[np.ndarray]) -> None:
    """The tpu profile requires every int32 X.8 ARM intermediate to stay in
    range (it is what lets the Pallas kernel run pure int32). Checked per
    grid against the actual IFCE context magnitudes (they are unclamped
    network outputs with no a-priori bound)."""
    from coolchic_tpu.bitstream.tpu_cdf import arm8_bounds_ok

    if not arm8_bounds_ok(arm_fp, _arm8_in_bound(arm_fp, ifce_ctx)):
        raise RuntimeError(
            "tpu-profile int32 ARM certificate failed (pathological quantized "
            "weights or IFCE magnitudes); re-encode with --profile ref")


def grid_n_streams(h: int, w: int) -> int:
    """`tpu`-profile stream count per grid: enough lanes to keep a chip busy
    on big grids, minimal sealing overhead on small ones."""
    n = h * w
    if n >= 1 << 16:
        return 128
    if n >= 1 << 10:
        return 8
    return 1


def decode_coolchic(header: CoolChicHeader, bytes_nn: bytes, bytes_latent: bytes,
                    profile: str = "ref") -> tuple[np.ndarray, list[np.ndarray]]:
    """Returns (raw synthesis output [1, C, H, W], decoded integer grids)."""
    if profile == "tpu":
        return decode_coolchic_batched([(header, bytes_nn, bytes_latent)])[0]

    cfg = header.to_config()
    nn_params = decode_network(bytes_nn, cfg, header.nn_q_step_shift,
                               header.nn_expgol_cnt, header.nn_n_bit_pad)

    arm_fp = _main_arm_params(nn_params, header, cfg, 0)
    ctx_idx = non_zero_pixel_ctx_index(cfg.spatial_context_arm)

    decoder = rc.RangeDecoder(bytes_latent)
    decoded: list[np.ndarray] = []  # largest first
    for idx_latent in range(cfg.n_latent_grids - 1, -1, -1):
        h_i, w_i = cfg.size_per_latent[idx_latent]
        ifce_ctx = _ifce_context_for_grid(nn_params, cfg, header, idx_latent, decoded,
                                          h_i, w_i, model=0)
        grid = rc.code_grid(decoder, False, h_i, w_i, cfg.spatial_context_arm,
                            ifce_ctx, arm_fp, ctx_idx)
        decoded.insert(0, grid)

    raw_out = synthesize(nn_params, cfg, decoded)
    return raw_out, decoded


def decode_coolchic_batched(items: list[tuple[CoolChicHeader, bytes, bytes]]
                            ) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """Decode several `tpu`-profile cool-chic payloads together, staged per
    pyramid level so that same-shape grids of DIFFERENT images share one
    grid-batched Pallas kernel call (the kernel stacks up to 8 grids on the
    sublane axis -- ops/pallas_decode.decode_grids_pallas). Grids the kernel
    does not cover (n_streams != 128, tiny/very wide grids, or
    COOLCHIC_PALLAS_DECODE unset) take the host C++ path.

    items: (header, bytes_nn, bytes_latent) per image. Returns
    [(raw_out, decoded_grids), ...] in item order.
    """
    use_pallas = os.environ.get("COOLCHIC_PALLAS_DECODE") == "1"

    st = []
    for header, bytes_nn, bytes_latent in items:
        cfg = header.to_config()
        nn_params = decode_network(bytes_nn, cfg, header.nn_q_step_shift,
                                   header.nn_expgol_cnt, header.nn_n_bit_pad)
        st.append({"cfg": cfg, "header": header, "nn": nn_params,
                   "arm": _main_arm_params(nn_params, header, cfg, 1),
                   "ctx_idx": non_zero_pixel_ctx_index(cfg.spatial_context_arm),
                   "lat": bytes_latent, "cursor": 0, "decoded": []})

    max_levels = max(s["cfg"].n_latent_grids for s in st)
    for level in range(max_levels - 1, -1, -1):
        # parse this level's stream block + IFCE context, image by image
        # (the byte cursor within an image payload is strictly sequential)
        jobs_by_key: dict[tuple, list] = {}
        for s in st:
            if level >= s["cfg"].n_latent_grids:
                continue
            cfg, lat = s["cfg"], s["lat"]
            h_i, w_i = cfg.size_per_latent[level]
            ifce_ctx = _ifce_context_for_grid(s["nn"], cfg, s["header"], level,
                                              s["decoded"], h_i, w_i, model=1)
            cursor = s["cursor"]
            n_streams = lat[cursor]
            cursor += 1
            counts = np.frombuffer(lat, dtype="<u4", offset=cursor,
                                   count=n_streams)
            cursor += 4 * n_streams
            stream_bytes = []
            for c in counts:
                stream_bytes.append(lat[cursor:cursor + 4 * int(c)])
                cursor += 4 * int(c)
            s["cursor"] = cursor

            # Pallas routing requires the int32 certificate to hold for THIS
            # grid's actual IFCE magnitudes (the host path measures bounds
            # itself and falls back to exact int64 arithmetic).
            from coolchic_tpu.bitstream.tpu_cdf import arm8_bounds_ok

            int32_ok = arm8_bounds_ok(s["arm"],
                                      _arm8_in_bound(s["arm"], ifce_ctx))
            n_ifce_route = 0 if ifce_ctx is None else int(ifce_ctx.shape[-1])
            from coolchic_tpu.ops.pallas_decode import kernel_eligible
            if use_pallas and int32_ok and n_streams == 128 \
                    and kernel_eligible(h_i, w_i, n_ifce_route):
                dims = tuple((int(wm.shape[0]), int(wm.shape[1]))
                             for wm in s["arm"]["trunk_weights"])
                n_ifce = 0 if ifce_ctx is None else int(ifce_ctx.shape[-1])
                key = (h_i, w_i, cfg.spatial_context_arm, n_ifce, dims)
                words = [np.frombuffer(b, dtype=np.uint32)
                         for b in stream_bytes]
                jobs_by_key.setdefault(key, []).append(
                    (s, {"words": words, "arm8": s["arm"], "ifce": ifce_ctx}))
            else:
                decoders = [rc.RangeDecoder(b) for b in stream_bytes]
                grid = rc.code_grid_streams(decoders, False, h_i, w_i,
                                            cfg.spatial_context_arm, ifce_ctx,
                                            s["arm"], s["ctx_idx"], model=1)
                s["decoded"].insert(0, grid)

        # one batched kernel call per (shape, arch) group, chunked to the
        # VMEM-fit batch size
        for (h_i, w_i, n_spatial, n_ifce, _dims), pairs in jobs_by_key.items():
            from coolchic_tpu.ops.pallas_decode import (decode_grids_pallas,
                                                        grid_batch_limit)

            max_words = max(max(len(ws) for ws in j["words"])
                            for _, j in pairs)
            limit = grid_batch_limit(h_i, w_i, n_ifce, max_words)
            ctx_idx = non_zero_pixel_ctx_index(n_spatial)
            for i in range(0, len(pairs), limit):
                chunk = pairs[i:i + limit]
                grids = decode_grids_pallas([j for _, j in chunk], h_i, w_i,
                                            ctx_idx, n_ifce)
                for (s, _), grid in zip(chunk, grids):
                    s["decoded"].insert(0, grid)

    return [(synthesize(s["nn"], s["cfg"], s["decoded"]), s["decoded"])
            for s in st]


def encode_coolchic_latents(header: CoolChicHeader, nn_params_int: dict,
                            quantized_latents: list[np.ndarray],
                            profile: str = "ref") -> bytes:
    """Range-encode the quantized latent grids (coarse to fine) given the
    already-quantized integer NN params. Returns the latent byte payload and
    sets header.n_bytes_latent.

    profile "ref": one constriction stream for the whole payload (reference
    bit-compatible). profile "tpu": per grid, [u8 n_streams][n x u32 word
    counts][stream words...] with wavefront-interleaved streams (see
    docs/tpu_profile.md)."""
    cfg = header.to_config()
    model = 1 if profile == "tpu" else 0
    arm_fp = _main_arm_params(nn_params_int, header, cfg, model)
    ctx_idx = non_zero_pixel_ctx_index(cfg.spatial_context_arm)

    encoder = rc.RangeEncoder() if profile == "ref" else None
    chunks: list[bytes] = []
    coded: list[np.ndarray] = []
    for idx_latent in range(cfg.n_latent_grids - 1, -1, -1):
        h_i, w_i = cfg.size_per_latent[idx_latent]
        ifce_ctx = _ifce_context_for_grid(nn_params_int, cfg, header, idx_latent, coded,
                                          h_i, w_i, model=model)
        if model == 1:
            _check_arm8_certificate(arm_fp, ifce_ctx)
        data = np.ascontiguousarray(quantized_latents[idx_latent], dtype=np.int64)
        if profile == "ref":
            out = rc.code_grid(encoder, True, h_i, w_i, cfg.spatial_context_arm,
                               ifce_ctx, arm_fp, ctx_idx, data=data)
        else:
            n_streams = grid_n_streams(h_i, w_i)
            encoders = [rc.RangeEncoder() for _ in range(n_streams)]
            out = rc.code_grid_streams(encoders, True, h_i, w_i,
                                       cfg.spatial_context_arm, ifce_ctx, arm_fp,
                                       ctx_idx, data=data, model=model)
            streams = [e.get_bytes() for e in encoders]
            counts = np.array([len(s) // 4 for s in streams], dtype="<u4")
            chunks.append(bytes([n_streams]) + counts.tobytes() + b"".join(streams))
        coded.insert(0, out)

    payload = encoder.get_bytes() if profile == "ref" else b"".join(chunks)
    header.n_bytes_latent = len(payload)
    return payload
