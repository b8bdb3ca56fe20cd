"""RDOQ: greedy rate-distortion refinement of the quantized NN parameters.

Coverage mirrors the reference (coolchic/nnquant/rdoq.py:28-462): ARM and
IFCE are scored by pure rate (latent rate + module NN rate -- distortion is
untouched by entropy-model edits), synthesis by distortion-after-rounding +
NN rate for I frames of any data type (RGB and YUV420; the reference's
score_syn_image, rdoq.py:388-462). The cases the reference handles with its
slow full-test() fallback (rdoq.py:131-137) -- the UPSAMPLING module on any
frame type, synthesis on P/B frames, every module of the motion cool-chic,
and the size_per_latent[0] != img_size rescale -- are covered by dedicated
reconstruction scorers (_make_syn_scorer's inter tile path and
_make_full_scorer) that hold the other cool-chic's contribution as a fixed
activation instead of re-running a complete forward per probe.

Orchestration is TPU-shaped instead of the reference's one-forward-per-probe
loop: scalars are processed in CHUNKS -- every (scalar, candidate-shift)
pair of a chunk is scored in ONE jitted, vmapped device call, per-scalar
argmins are applied jointly, and the next chunk's free base-loss column
verifies the joint step (rare regressions roll back to the chunk's single
best edit, whose gain was measured exactly). Device memory is bounded by a
lax.scan over latent-chunks (ARM/IFCE) or over image row-tiles with a
receptive-field halo (synthesis), so a chunk of hundreds of candidate
forwards fits HBM.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.bitstream.nncodec import flatten_module_params, unflatten_module_params
from coolchic_tpu.core.arch import CoolChicConfig
from coolchic_tpu.core.laplace import rate_bits
from coolchic_tpu.models.arm import arm_apply, arm_reparameterize
from coolchic_tpu.models.coolchic import ifce_context, synthesis_input
from coolchic_tpu.models.synthesis import synthesis_apply
from coolchic_tpu.ops.context import spatial_context
from coolchic_tpu.ops.resize import interpolate

N_SHIFTS = 15
# ARM/IFCE probes are cheap (rate only) on small images: sweep every shift.
ARM_SHIFTS = tuple(range(-N_SHIFTS, N_SHIFTS + 1))
# Synthesis probes run a conv stack per candidate; the reference's early
# stop almost never walks past +-3, so probe a sparse ladder beyond it.
SYN_SHIFTS = (-15, -7, -3, -2, -1, 0, 1, 2, 3, 7, 15)
# Above _BIG_N_LAT the ARM/IFCE rate probes dominate the per-image RDOQ tail
# (ARM 98 s + IFCE 51 s of a ~5 min tail at 512x768, docs/tpu_rdoq_issue.md);
# the same sparse ladder cuts the probe count 31 -> 11 (~3x) while keeping
# the far shifts reachable. Opt out with COOLCHIC_RDOQ_ARM_SHIFTS=full.
ARM_SHIFTS_BIG = SYN_SHIFTS

# Total probe-activation budget (bytes) for sizing the latent scan slabs:
# the vmapped probe holds lanes x (n_lat/n_chunks x dim) context slabs, and
# the ARM body's hidden layers multiply that by ~5x. 2 GiB here crashed the
# remote v5e worker on 512x768 hop (n_lat ~ 524k: 8x31 lanes x 65k-row
# slabs ~ 10+ GiB peak) -- the round-3 "TPU RDOQ issue" at full size.
_LANE_BUDGET_BYTES = 256 * 1024 ** 2

# Above this latent count the per-probe scalar counts shrink (fewer lanes):
# the IFCE scorer materializes a full [n_lat, Cf] context per lane and the
# synthesis scorer a conv tile stack per lane, neither of which the latent
# scan slabs bound.
_BIG_N_LAT = 200_000


def _arm_shifts(n_lat: int) -> tuple:
    import os

    mode = os.environ.get("COOLCHIC_RDOQ_ARM_SHIFTS", "auto")
    if mode == "full" or (mode == "auto" and n_lat <= _BIG_N_LAT):
        return ARM_SHIFTS
    return ARM_SHIFTS_BIG


def _expgol_rate_bits(v: jnp.ndarray, count: int) -> jnp.ndarray:
    x = jnp.abs(v)
    return jnp.sum(2.0 * jnp.floor(jnp.log2(2.0 * x / (2.0**count) + 1.0)) + count
                   + (v != 0))


def _module_shapes(cc_params: dict, cfg: CoolChicConfig, module: str, wb: str):
    return [np.asarray(a).shape for a in flatten_module_params(cc_params, cfg, module, wb)]


def _flat(cc_params: dict, cfg: CoolChicConfig, module: str, wb: str) -> np.ndarray:
    arrays = flatten_module_params(cc_params, cfg, module, wb)
    if not arrays:
        return np.zeros((0,), np.float32)
    return np.concatenate([np.asarray(a, np.float32).reshape(-1) for a in arrays])


def _rebuild(flat: jnp.ndarray, shapes: list) -> list[jnp.ndarray]:
    arrays, ptr = [], 0
    for s in shapes:
        n = int(np.prod(s))
        arrays.append(flat[ptr:ptr + n].reshape(s))
        ptr += n
    return arrays


def _set_flat(cc_params: dict, cfg: CoolChicConfig, module: str, wb: str,
              flat: np.ndarray) -> dict:
    import copy

    shapes = _module_shapes(cc_params, cfg, module, wb)
    out = copy.deepcopy(cc_params)
    unflatten_module_params([jnp.asarray(a) for a in _rebuild(jnp.asarray(flat), shapes)],
                            cfg, module, wb, out)
    return out


def _arm_from_flat(flat_w, flat_b, cfg: CoolChicConfig, shapes_w, shapes_b) -> dict:
    ws = _rebuild(flat_w, shapes_w)
    bs = _rebuild(flat_b, shapes_b)
    n_trunk = cfg.n_hidden_layers_arm + 1
    params = {"layers": [{"weight": w, "bias": b}
                         for w, b in zip(ws[:n_trunk], bs[:n_trunk])]}
    if cfg.linear_stabiliser_arm:
        params["stabiliser"] = {"weight": ws[n_trunk], "bias": bs[n_trunk]}
    return params


def _ifce_from_flat(flat_w, flat_b, shapes_w, shapes_b) -> dict:
    ws = _rebuild(flat_w, shapes_w)
    bs = _rebuild(flat_b, shapes_b)
    return {"arms": [{"layers": [{"weight": w, "bias": b}]}
                     for w, b in zip(ws, bs)]}


def _ups_from_flat(flat_w, flat_b, shapes_w, shapes_b) -> dict:
    ws = _rebuild(flat_w, shapes_w)
    bs = _rebuild(flat_b, shapes_b)
    n_ups = len(ws) // 2
    return {"tconv_half": ws[:n_ups], "conv_half": ws[n_ups:],
            "tconv_bias": bs[:n_ups], "conv_bias": bs[n_ups:]}


def _syn_from_flat(flat_w, flat_b, cfg: CoolChicConfig, shapes_w, shapes_b) -> dict:
    ws = _rebuild(flat_w, shapes_w)
    bs = _rebuild(flat_b, shapes_b)
    i = 0
    params = {"output_transform": {"weight": ws[0], "bias": bs[0]}}
    i = 1
    if cfg.linear_stabiliser_synth:
        params["stabiliser"] = {"weight": ws[1], "bias": bs[1]}
        i = 2
    params["layers"] = [{"weight": w, "bias": b} for w, b in zip(ws[i:], bs[i:])]
    return params


def _pad_chunks(x: np.ndarray, n_chunks: int) -> np.ndarray:
    """[N, ...] -> [n_chunks, N/n_chunks, ...] zero-padded."""
    n = x.shape[0]
    per = -(-n // n_chunks)
    pad = n_chunks * per - n
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x.reshape((n_chunks, per) + x.shape[1:])


# ---------------------------------------------------------------------------
# Scorers: fn(flat_w, flat_b, idxs [S], vals [S, C], *activations) -> [S, C]
# ---------------------------------------------------------------------------
@lru_cache(maxsize=32)
def _make_rate_scorer(cfg: CoolChicConfig, module: str, wb: str, q: float,
                      cnt: int, shapes_w: tuple, shapes_b: tuple,
                      arm_shapes_w: tuple, arm_shapes_b: tuple, n_chunks: int):
    """ARM / IFCE scorer: latent rate (in bits, via the main ARM) + module NN
    rate. Latents are scanned in n_chunks slabs to bound activation memory.
    Activations: (lat_c [T, n], ctx_or_spatial_c [T, n, d], mask_c [T, n],
    and for IFCE additionally the tuple of latent grids)."""

    def rate_scan(arm, lat_c, ctx_c, mask_c):
        def body(acc, xs):
            lat, ctx, m = xs
            mu, scale = arm_reparameterize(arm_apply(arm, ctx))
            return acc + jnp.sum(rate_bits(lat, mu, scale) * m), None
        total, _ = jax.lax.scan(body, jnp.float32(0.0), (lat_c, ctx_c, mask_c))
        return total

    if module == "arm":
        def score_one(flat_w, flat_b, idx, val, lat_c, ctx_c, mask_c):
            fw = flat_w.at[idx].set(val) if wb == "weight" else flat_w
            fb = flat_b.at[idx].set(val) if wb == "bias" else flat_b
            arm = _arm_from_flat(fw, fb, cfg, list(shapes_w), list(shapes_b))
            edited = fw if wb == "weight" else fb
            nn_bits = _expgol_rate_bits(jnp.round(edited / q), cnt)
            return rate_scan(arm, lat_c, ctx_c, mask_c) + nn_bits
    else:  # ifce: edits change the context itself
        def score_one(flat_w, flat_b, idx, val, lat_c, sp_c, mask_c,
                      arm_flat_w, arm_flat_b, *latents):
            fw = flat_w.at[idx].set(val) if wb == "weight" else flat_w
            fb = flat_b.at[idx].set(val) if wb == "bias" else flat_b
            trial = {"ifce": _ifce_from_flat(fw, fb, list(shapes_w), list(shapes_b))}
            ctx_if = ifce_context(trial, cfg, list(latents))  # [N, Cf]
            ctx_if_c = _pad_chunks_jnp(ctx_if, n_chunks)
            ctx_c = jnp.concatenate([sp_c, ctx_if_c], axis=2)
            arm = _arm_from_flat(arm_flat_w, arm_flat_b, cfg,
                                 list(arm_shapes_w), list(arm_shapes_b))
            edited = fw if wb == "weight" else fb
            nn_bits = _expgol_rate_bits(jnp.round(edited / q), cnt)
            return rate_scan(arm, lat_c, ctx_c, mask_c) + nn_bits

    @lru_cache(maxsize=4)
    def build(n_acts: int):
        inner = jax.vmap(score_one, in_axes=(None, None, None, 0)
                         + (None,) * n_acts)
        return jax.jit(jax.vmap(inner, in_axes=(None, None, 0, 0)
                                + (None,) * n_acts))

    return lambda fw, fb, idxs, vals, *acts: build(len(acts))(
        fw, fb, idxs, vals, *acts)


def _pad_chunks_jnp(x: jnp.ndarray, n_chunks: int) -> jnp.ndarray:
    n = x.shape[0]
    per = -(-n // n_chunks)
    pad = n_chunks * per - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x.reshape((n_chunks, per) + x.shape[1:])


@lru_cache(maxsize=16)
def _make_syn_scorer(cfg: CoolChicConfig, wb: str, lmbda: float, q: float,
                     cnt: int, shapes_w: tuple, shapes_b: tuple,
                     frame_data_type: str, bitdepth: int, n_tiles: int,
                     frame_type: str = "I", n_warp: int = 0):
    """Synthesis scorer (residue cool-chic, any frame type): distortion after
    bitdepth rounding (and 444->420 conversion for YUV) + lmbda * NN rate /
    n_pixels. The conv stack runs tile-by-tile over image rows with a
    receptive-field halo (row indices are clamped, which reproduces
    replicate padding at image borders exactly), so hundreds of candidate
    lanes fit in HBM.

    For P/B frames (reference nnquant/rdoq.py:131-137 scores these with a
    full test() fallback) the fixed warped references ride along as `n_warp`
    extra activations, sliced per tile: the synthesis raw output supplies
    residue / alpha (/ beta), and the tile reconstruction is
    alpha * pred + residue exactly as models/frame.py:112-144."""
    h, w = cfg.img_size
    halo = sum((k - 1) // 2 for _, k, _, _ in cfg.parsed_synthesis)
    max_dyn = float(2 ** bitdepth - 1)
    n_pixels = h * w

    rows_per = -(-h // n_tiles)
    if frame_data_type == "yuv420":
        rows_per += rows_per % 2  # keep 420 2x2 blocks intact
    starts = [min(i * rows_per, max(h - rows_per, 0)) for i in range(n_tiles)]
    # tiles can overlap at the bottom edge; weight rows so each image row
    # counts exactly once
    out_rows = np.stack([np.arange(s, s + rows_per) for s in starts])
    row_seen = np.zeros(h, np.int64)
    row_w = []
    for r in out_rows:
        w_t = (row_seen[r] == 0).astype(np.float32)
        row_seen[r] += 1
        row_w.append(w_t)
    row_w = np.stack(row_w)  # [T, rows_per]

    def score_one(flat_w, flat_b, idx, val, syn_in, target, *warps):
        fw = flat_w.at[idx].set(val) if wb == "weight" else flat_w
        fb = flat_b.at[idx].set(val) if wb == "bias" else flat_b
        syn = _syn_from_flat(fw, fb, cfg, list(shapes_w), list(shapes_b))

        # replicate-pad H once; tiles become plain dynamic slices (the
        # row-gather variant of this body faulted the TPU kernel at
        # 512x768 -- docs/tpu_rdoq_issue.md)
        syn_pad = jnp.pad(syn_in, ((0, 0), (0, 0), (halo, halo), (0, 0)),
                          mode="edge")

        def body(acc, xs):
            start, w_t = xs
            tile_in = jax.lax.dynamic_slice_in_dim(
                syn_pad, start, rows_per + 2 * halo, axis=2)  # [1, C, rh, W]
            raw = synthesis_apply(syn, cfg, tile_in)[:, :, halo:halo + rows_per]
            tgt = jax.lax.dynamic_slice_in_dim(target, start, rows_per, axis=2)
            if frame_type == "I":
                out = raw
            else:
                residue = raw[:, :3]
                alpha = jnp.clip(raw[:, 3:4] + 0.5, 0.0, 1.0)
                w_tiles = [jax.lax.dynamic_slice_in_dim(wp, start, rows_per,
                                                        axis=2) for wp in warps]
                if frame_type == "P":
                    pred = w_tiles[0]
                else:
                    beta = jnp.clip(raw[:, 4:5] + 0.5, 0.0, 1.0)
                    pred = beta * w_tiles[0] + (1.0 - beta) * w_tiles[1]
                out = alpha * pred + residue
            if frame_data_type == "yuv420":
                from coolchic_tpu.models.frame import _to_420

                dec = {k: jnp.clip(v, 0.0, 1.0)
                       for k, v in _to_420(out).items()}
                dec = {k: jnp.round(v * max_dyn) / max_dyn
                       for k, v in dec.items()}
                tgt420 = _to_420(tgt)
                wy = w_t[None, None, :, None]
                wu = w_t[0::2][None, None, :, None]
                sse = (jnp.sum(jnp.square(dec["y"] - tgt420["y"]) * wy)
                       + jnp.sum(jnp.square(dec["u"] - tgt420["u"]) * wu)
                       + jnp.sum(jnp.square(dec["v"] - tgt420["v"]) * wu))
                npx = (jnp.sum(wy) * out.shape[-1]
                       + 2 * jnp.sum(wu) * out.shape[-1] / 2)
            else:
                dec = out if frame_data_type == "flow" else jnp.clip(out, 0.0, 1.0)
                dec = jnp.round(dec * max_dyn) / max_dyn
                wr = w_t[None, None, :, None]
                sse = jnp.sum(jnp.square(dec - tgt) * wr)
                npx = jnp.sum(w_t) * out.shape[1] * out.shape[-1]
            return (acc[0] + sse, acc[1] + npx), None

        (sse, npx), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)),
            (jnp.asarray(starts, jnp.int32), jnp.asarray(row_w)))
        dist = sse / npx
        edited = fw if wb == "weight" else fb
        nn_bits = _expgol_rate_bits(jnp.round(edited / q), cnt)
        return dist + lmbda * nn_bits / n_pixels

    n_acts = 2 + n_warp
    inner = jax.vmap(score_one, in_axes=(None, None, None, 0) + (None,) * n_acts)
    return jax.jit(jax.vmap(inner, in_axes=(None, None, 0, 0) + (None,) * n_acts))


def _full_dist(dec_raw: jnp.ndarray, target: jnp.ndarray, frame_data_type: str,
               max_dyn: float) -> jnp.ndarray:
    """Full-resolution distortion after bitdepth rounding, same weighting as
    the tile scorer (every decoded SAMPLE counts once; yuv420 therefore
    weights Y 4x vs each chroma by pixel count)."""
    if frame_data_type == "yuv420":
        from coolchic_tpu.models.frame import _to_420

        dec = {k: jnp.round(jnp.clip(v, 0.0, 1.0) * max_dyn) / max_dyn
               for k, v in _to_420(dec_raw).items()}
        tgt = _to_420(target)
        sse = sum(jnp.sum(jnp.square(dec[k] - tgt[k])) for k in ("y", "u", "v"))
        npx = sum(dec[k].size for k in ("y", "u", "v"))
        return sse / npx
    dec = dec_raw if frame_data_type == "flow" else jnp.clip(dec_raw, 0.0, 1.0)
    dec = jnp.round(dec * max_dyn) / max_dyn
    return jnp.mean(jnp.square(dec - target))


@lru_cache(maxsize=16)
def _make_full_scorer(cfg: CoolChicConfig, module: str, wb: str, lmbda: float,
                      q: float, cnt: int, shapes_w: tuple, shapes_b: tuple,
                      syn_shapes_w: tuple, syn_shapes_b: tuple,
                      frame_data_type: str, bitdepth: int, frame_type: str,
                      role: str, n_grids: int, has_cr: bool, n_aux: int,
                      warp_filter_size: int):
    """Full-resolution reconstruction scorer: the cases the reference handles
    with its slow full-test() fallback (reference nnquant/rdoq.py:131-137) --
    the UPSAMPLING module (any frame type: edits move the dense stack, which
    is global, so row tiles do not apply), the synthesis rescale case
    (size_per_latent[0] != img_size: the synthesis output is interpolated to
    the image size, reference component/core/coolchic.py forward), and every
    module of the MOTION cool-chic (edits move the flow, hence the warped
    prediction). Latent rate is constant under these edits, so the score is
    distortion(decoded) + lmbda * module NN bits / n_pixels.

    Activation layout (in order):
      module == "synthesis":  (syn_in, target, *aux)
      module == "upsampling": (syn_w, syn_b, target, *grids, [cr_extra], *aux)
    aux for P/B frames:
      role == "residue": the fixed warped reference(s) (1 for P, 2 for B)
      role == "motion":  (residue_raw, *globally-shifted refs) -- the flow is
        re-derived per candidate and the references re-warped in-lane
        (models/frame.py:112-144, models/warp.py).
    """
    from coolchic_tpu.models.upsampling import upsampling_apply
    from coolchic_tpu.models.warp import warp_fn
    from coolchic_tpu.ops.resize import interpolate as _interp

    h, w = cfg.img_size
    n_pixels = h * w
    max_dyn = float(2 ** bitdepth - 1)

    def score_one(flat_w, flat_b, idx, val, *acts):
        fw = flat_w.at[idx].set(val) if wb == "weight" else flat_w
        fb = flat_b.at[idx].set(val) if wb == "bias" else flat_b
        if module == "synthesis":
            syn_in, target = acts[0], acts[1]
            aux = acts[2:]
            syn = _syn_from_flat(fw, fb, cfg, list(shapes_w), list(shapes_b))
            x = syn_in
        else:
            syn_w, syn_b, target = acts[0], acts[1], acts[2]
            rest = list(acts[3:])
            grids = rest[:n_grids]
            rest = rest[n_grids:]
            if has_cr:
                cr_extra, rest = rest[0], rest[1:]
            aux = tuple(rest)
            ups = _ups_from_flat(fw, fb, list(shapes_w), list(shapes_b))
            dense = upsampling_apply(ups, grids, cfg.ups_k_size,
                                     cfg.ups_preconcat_k_size, training=False)
            x = dense[None]
            if has_cr:
                x = jnp.concatenate([x, cr_extra], axis=1)
            syn = _syn_from_flat(syn_w, syn_b, cfg, list(syn_shapes_w),
                                 list(syn_shapes_b))
        raw = _interp(synthesis_apply(syn, cfg, x), cfg.img_size,
                      cfg.final_upsampling_type)
        if frame_type == "I":
            dec_raw = raw
        elif role == "residue":
            residue = raw[:, :3]
            alpha = jnp.clip(raw[:, 3:4] + 0.5, 0.0, 1.0)
            if frame_type == "P":
                pred = aux[0]
            else:
                beta = jnp.clip(raw[:, 4:5] + 0.5, 0.0, 1.0)
                pred = beta * aux[0] + (1.0 - beta) * aux[1]
            dec_raw = alpha * pred + residue
        else:  # motion: raw is the flow field(s)
            residue_raw, refs = aux[0], aux[1:]
            residue = residue_raw[:, :3]
            alpha = jnp.clip(residue_raw[:, 3:4] + 0.5, 0.0, 1.0)
            if frame_type == "P":
                pred = warp_fn(refs[0], raw[:, 0:2], warp_filter_size,
                               training=False)
            else:
                beta = jnp.clip(residue_raw[:, 4:5] + 0.5, 0.0, 1.0)
                pred = (beta * warp_fn(refs[0], raw[:, 0:2], warp_filter_size,
                                       training=False)
                        + (1.0 - beta) * warp_fn(refs[1], raw[:, 2:4],
                                                 warp_filter_size,
                                                 training=False))
            dec_raw = alpha * pred + residue
        dist = _full_dist(dec_raw, target, frame_data_type, max_dyn)
        edited = fw if wb == "weight" else fb
        nn_bits = _expgol_rate_bits(jnp.round(edited / q), cnt)
        return dist + lmbda * nn_bits / n_pixels

    @lru_cache(maxsize=4)
    def build(n_acts: int):
        inner = jax.vmap(score_one, in_axes=(None, None, None, 0)
                         + (None,) * n_acts)
        return jax.jit(jax.vmap(inner, in_axes=(None, None, 0, 0)
                                + (None,) * n_acts))

    return lambda fw, fb, idxs, vals, *acts: build(len(acts))(
        fw, fb, idxs, vals, *acts)


# ---------------------------------------------------------------------------
# Chunked parallel-greedy sweep.
# ---------------------------------------------------------------------------
def _sweep_device(scorer, flat_w: np.ndarray, flat_b: np.ndarray, wb: str,
                  shifts: tuple, q: float, acts: tuple, chunk: int, rng,
                  verbose: bool, tag: str) -> tuple[np.ndarray, np.ndarray]:
    """The whole greedy sweep as ONE device program: a lax.scan over chunks
    carrying the edited flat vector, with the host loop's joint-apply /
    regression-rollback semantics reproduced in-graph. On a remote TPU this
    replaces ~n/chunk host round-trips (each ~0.3-0.5 s) with one call.

    Differences vs the host loop (_sweep_host): comparisons run in f32 on
    device (the host loop casts the same f32 scores to f64 and adds a 1e-9
    epsilon to the rollback check -- sub-ulp at typical loss magnitudes, so
    decisions agree except on exact ties)."""
    import functools

    flat = (flat_w if wb == "weight" else flat_b).copy()
    n = flat.size
    if n == 0:
        return flat_w, flat_b
    order = rng.permutation(n)
    shifts_np = np.asarray(shifts, np.float32) * np.float32(q)
    zero_col = int(np.argwhere(np.asarray(shifts) == 0)[0, 0])
    C = len(shifts)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    # padded rows point OUT OF BOUNDS (index n): their probe lanes are
    # masked and their scatter writes dropped (mode="drop"), so they can
    # never collide with a real scalar's edit
    idxs_all = np.concatenate([order, np.full(pad, n, order.dtype)]
                              ).reshape(n_chunks, chunk).astype(np.int32)
    valid_all = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)]
                               ).reshape(n_chunks, chunk)
    max_q = np.float32(65535)

    fixed = jnp.asarray(flat_b if wb == "weight" else flat_w)

    @functools.partial(jax.jit, static_argnames=("_scorer",))
    def run_all(_scorer, flat0, idxs_a, valid_a, shifts_a, *acts_a):
        def probe(f, idxs):
            vals = f.at[idxs].get(mode="clip")[:, None] + shifts_a[None, :]
            fw = f if wb == "weight" else fixed
            fb = fixed if wb == "weight" else f
            losses = _scorer(fw, fb, idxs, vals, *acts_a)
            losses = jnp.where(jnp.abs(jnp.round(vals / q)) > max_q,
                               jnp.inf, losses)
            return losses, vals

        def step(carry, xs):
            idxs, valid = xs
            (f, have_prev, p_f, p_losses, p_idxs, p_vals, p_base,
             n_changed) = carry
            losses, vals = probe(f, idxs)
            cur_base = losses[0, zero_col]
            regressed = have_prev & (cur_base > p_base)

            def rollback(_):
                k = jnp.argmin(p_losses)
                r, c = k // C, k % C
                better = p_losses[r, c] < p_base
                f2 = jnp.where(
                    better,
                    p_f.at[p_idxs[r]].set(p_vals[r, c]), p_f)
                l2, v2 = probe(f2, idxs)
                return f2, l2, v2, l2[0, zero_col]

            def keep(_):
                return f, losses, vals, cur_base

            f, losses, vals, base = jax.lax.cond(regressed, rollback, keep, None)
            losses_m = jnp.where(valid[:, None], losses, jnp.inf)

            best_c = jnp.argmin(losses_m, axis=1)
            row_best = jnp.take_along_axis(losses_m, best_c[:, None], axis=1)[:, 0]
            improve = (row_best < base) & (best_c != zero_col) & valid
            any_improve = jnp.any(improve)
            picked = jnp.take_along_axis(vals, best_c[:, None], axis=1)[:, 0]
            f_before = f
            f = f.at[idxs].set(jnp.where(improve, picked, f.at[idxs].get(mode="clip")),
                               mode="drop")
            n_changed = n_changed + jnp.sum(improve.astype(jnp.int32))

            sel = lambda a, b: jnp.where(any_improve, a, b)
            carry = (f, any_improve,
                     sel(f_before, p_f), sel(losses_m, p_losses),
                     jnp.where(any_improve, idxs, p_idxs),
                     sel(vals, p_vals), jnp.where(any_improve, base, p_base),
                     n_changed)
            return carry, None

        carry0 = (flat0, jnp.asarray(False),
                  flat0, jnp.full((chunk, C), jnp.inf, jnp.float32),
                  jnp.zeros(chunk, jnp.int32),
                  jnp.zeros((chunk, C), jnp.float32), jnp.float32(jnp.inf),
                  jnp.int32(0))
        carry, _ = jax.lax.scan(step, carry0, (idxs_a, valid_a))
        (f, have_prev, p_f, p_losses, p_idxs, p_vals, p_base, n_changed) = carry

        # final verification probe (host loop's trailing base check)
        losses, _ = probe(f, idxs_a[0])
        regressed = have_prev & (losses[0, zero_col] > p_base)

        def rollback(_):
            k = jnp.argmin(p_losses)
            r, c = k // C, k % C
            return jnp.where(p_losses[r, c] < p_base,
                             p_f.at[p_idxs[r]].set(p_vals[r, c]), p_f)

        f = jax.lax.cond(regressed, rollback, lambda _: f, None)
        return f, n_changed

    out, n_changed = run_all(scorer, jnp.asarray(flat), jnp.asarray(idxs_all),
                             jnp.asarray(valid_all), jnp.asarray(shifts_np),
                             *acts)
    flat = np.asarray(out)
    if verbose:
        print(f"  rdoq {tag}: {int(n_changed)}/{n} scalars adjusted", flush=True)
    if wb == "weight":
        return flat, flat_b
    return flat_w, flat


def _sweep(scorer, flat_w, flat_b, wb, shifts, q, acts, chunk, rng,
           verbose, tag, force_host: bool = False):
    import os

    if force_host or os.environ.get("COOLCHIC_RDOQ_HOST", "0") == "1":
        return _sweep_host(scorer, flat_w, flat_b, wb, shifts, q, acts, chunk,
                           rng, verbose, tag)
    return _sweep_device(scorer, flat_w, flat_b, wb, shifts, q, acts, chunk,
                         rng, verbose, tag)


def _sweep_host(scorer, flat_w: np.ndarray, flat_b: np.ndarray, wb: str,
                shifts: tuple, q: float, acts: tuple, chunk: int, rng,
                verbose: bool, tag: str) -> tuple[np.ndarray, np.ndarray]:
    """Greedy coordinate refinement of flat_<wb>: chunks of `chunk` scalars,
    every (scalar, shift) scored in one device call, per-scalar argmins
    applied jointly, regression (checked against the next chunk's free
    cand==0 column) rolls back to the chunk's single best edit."""
    flat = (flat_w if wb == "weight" else flat_b).copy()
    n = flat.size
    if n == 0:
        return flat_w, flat_b
    order = rng.permutation(n)
    shifts_np = np.asarray(shifts, np.float32) * np.float32(q)
    zero_col = int(np.argwhere(np.asarray(shifts) == 0)[0, 0])

    def run(chunk_idx):
        fw = jnp.asarray(flat) if wb == "weight" else jnp.asarray(flat_w)
        fb = jnp.asarray(flat) if wb == "bias" else jnp.asarray(flat_b)
        vals = flat[chunk_idx][:, None] + shifts_np[None, :]
        losses = np.asarray(scorer(fw, fb, jnp.asarray(chunk_idx),
                                   jnp.asarray(vals), *acts), np.float64)
        losses[np.abs(np.round(vals / q)) > 65535] = np.inf
        return losses, vals

    prev = None  # (flat_before, idxs, vals, losses) of the last applied chunk
    base = None
    n_changed = 0
    for c0 in range(0, n, chunk):
        idxs = order[c0:c0 + chunk]
        losses, vals = run(idxs)
        cur_base = float(losses[0, zero_col])
        if base is None:
            base = cur_base
        elif prev is not None and cur_base > prev[3] + 1e-9:
            # joint apply regressed: roll back to the single best edit of
            # the previous chunk (its gain was measured exactly)
            p_flat, p_idxs, p_vals, p_base, p_losses = prev
            flat = p_flat
            r, c = np.unravel_index(np.argmin(p_losses), p_losses.shape)
            if p_losses[r, c] < p_base:
                flat[p_idxs[r]] = p_vals[r, c]
                base = float(p_losses[r, c])
            else:
                base = p_base
            losses, vals = run(idxs)
            cur_base = float(losses[0, zero_col])
        base = cur_base

        best_c = np.argmin(losses, axis=1)
        improve = losses[np.arange(len(idxs)), best_c] < base - 0.0
        improve &= best_c != zero_col
        if improve.any():
            prev = (flat.copy(), idxs, vals, base, losses)
            flat[idxs[improve]] = vals[np.arange(len(idxs))[improve],
                                       best_c[improve]]
            n_changed += int(improve.sum())
        else:
            prev = None

    # verify the last applied chunk with one extra base probe
    if prev is not None:
        losses, _ = run(order[:1])
        if float(losses[0, zero_col]) > prev[3] + 1e-9:
            p_flat, p_idxs, p_vals, p_base, p_losses = prev
            flat = p_flat
            r, c = np.unravel_index(np.argmin(p_losses), p_losses.shape)
            if p_losses[r, c] < p_base:
                flat[p_idxs[r]] = p_vals[r, c]

    if verbose:
        print(f"  rdoq {tag}: {n_changed}/{n} scalars adjusted", flush=True)
    if wb == "weight":
        return flat, flat_b
    return flat_w, flat


def rdoq_coolchic(cc_params: dict, cfg: CoolChicConfig, q_shift: dict, expgol: dict,
                  lmbda: float, target=None, frame_type: str = "I",
                  frame_data_type: str = "rgb", bitdepth: int = 8,
                  seed: int = 0, modules: tuple = None,
                  frame_ctx: dict = None, verbose: bool = False) -> dict:
    """Refine the quantized NN params of one cool-chic decoder.

    target: dense [1, C, H, W] array (RGB / flow / YUV444-as-444) for the
    reconstruction scorers; pass the 444 representation for yuv420 content
    (the scorer converts tiles to 420 and weights channels by pixel count,
    mirroring the reference's score_syn_image).

    frame_ctx: fixed frame-level activations that let synthesis + upsampling
    be scored on P/B frames and on the motion cool-chic -- the cases the
    reference routes through its full-test() fallback (reference
    nnquant/rdoq.py:131-137). Keys:
      role: "residue" (default) or "motion" -- which cool-chic this is.
      warps: for role=residue on P/B, the warped (and globally-shifted)
        reference(s) [1,3,H,W] under the CURRENT motion, 1 for P / 2 for B.
      other_raw: for role=motion, the fixed residue cool-chic raw output
        [1,4|5,H,W] (residue + alpha (+ beta)).
      refs: for role=motion, the globally-shifted reference frames.
      warp_filter_size: for role=motion, the frame's warp filter taps.
    With frame_ctx=None and frame_type != "I" only ARM + IFCE are refined
    (the pre-round-5 behavior)."""
    role = (frame_ctx or {}).get("role", "residue")
    has_recon = target is not None and (
        frame_type == "I"
        or (frame_ctx is not None
            and (("warps" in frame_ctx) if role == "residue"
                 else ("refs" in frame_ctx and "other_raw" in frame_ctx))))
    if modules is None:
        # reference order: sorted(modules_to_send) = arm, ifce?, synthesis,
        # upsampling (reference nnquant/rdoq.py:68)
        modules = ("arm",) + (("ifce",) if cfg.flag_ifce else ()) + \
            (("synthesis", "upsampling") if has_recon else ())
    rng = np.random.default_rng(seed)
    params = cc_params

    latents = [jnp.round(jnp.asarray(lat) * cfg.encoder_gain)
               for lat in cc_params["latents"]]
    flat_latent = np.concatenate([np.asarray(g).reshape(-1) for g in latents])
    n_lat = flat_latent.size

    # shared chunked activations for the rate scorers: bound the vmapped
    # scan slab so (lanes x slab) stays within the per-lane budget
    # (lanes <= 8 scalars x 31 shifts = 248)
    dim = cfg.total_context_arm
    n_chunks = int(np.clip(
        -(-248 * n_lat * dim * 4 // _LANE_BUDGET_BYTES), 1, 1024))
    lat_c = jnp.asarray(_pad_chunks(flat_latent.astype(np.float32), n_chunks))
    mask = np.ones(n_lat, np.float32)
    mask_c = jnp.asarray(_pad_chunks(mask, n_chunks))

    for module in modules:
        if module in ("synthesis", "upsampling") and not has_recon:
            continue
        if module == "ifce" and not cfg.flag_ifce:
            continue

        shapes_w = tuple(_module_shapes(params, cfg, module, "weight"))
        shapes_b = tuple(_module_shapes(params, cfg, module, "bias"))
        flat_w = _flat(params, cfg, module, "weight")
        flat_b = _flat(params, cfg, module, "bias")
        if flat_w.size == 0 and flat_b.size == 0:
            continue

        if module == "arm":
            ctx_sp = jnp.concatenate(
                [spatial_context(g, cfg.spatial_context_arm) for g in latents], axis=0)
            if cfg.flag_ifce:
                full_ctx = jnp.concatenate(
                    [ctx_sp, ifce_context(params, cfg, latents)], axis=1)
            else:
                full_ctx = ctx_sp
            acts = (lat_c, _pad_chunks_jnp(full_ctx, n_chunks), mask_c)
            shifts, chunk = _arm_shifts(n_lat), (4 if n_lat > _BIG_N_LAT else 8)
        elif module == "ifce":
            arm_shapes_w = tuple(_module_shapes(params, cfg, "arm", "weight"))
            arm_shapes_b = tuple(_module_shapes(params, cfg, "arm", "bias"))
            ctx_sp = jnp.concatenate(
                [spatial_context(g, cfg.spatial_context_arm) for g in latents], axis=0)
            acts = (lat_c, _pad_chunks_jnp(ctx_sp, n_chunks), mask_c,
                    jnp.asarray(_flat(params, cfg, "arm", "weight")),
                    jnp.asarray(_flat(params, cfg, "arm", "bias")),
                    *latents)
            shifts, chunk = _arm_shifts(n_lat), (1 if n_lat > _BIG_N_LAT else 2)
        else:
            syn_grids = [g for g, hyper in zip(latents, cfg.flag_is_hyperlatent)
                         if not hyper]
            from coolchic_tpu.models.upsampling import upsampling_apply

            cr = None
            cr_extra = None
            if cfg.flag_common_randomness:
                from coolchic_tpu.core.noise import common_randomness_grids
                from coolchic_tpu.models.upsampling import fixed_upsampling
                from coolchic_tpu.ops.resize import interpolate as _interp

                cr = [jnp.asarray(g) for g in
                      common_randomness_grids(list(cfg.size_per_latent_cr))]
                ups_noise, _ = fixed_upsampling(cr, mode="bicubic")
                cr_extra = _interp(ups_noise, cfg.img_size, "bicubic")[None]
            rescale = cfg.size_per_latent[0] != cfg.img_size
            aux = ()
            if frame_type != "I":
                if role == "residue":
                    aux = tuple(jnp.asarray(np.asarray(wp, np.float32))
                                for wp in frame_ctx["warps"])
                else:
                    aux = ((jnp.asarray(np.asarray(frame_ctx["other_raw"],
                                                   np.float32)),)
                           + tuple(jnp.asarray(np.asarray(r, np.float32))
                                   for r in frame_ctx["refs"]))
            tgt = jnp.asarray(np.asarray(target, np.float32))
            use_tiles = (module == "synthesis" and role == "residue"
                         and not rescale)
            if module == "synthesis":
                dense = upsampling_apply(params["upsampling"], syn_grids,
                                         cfg.ups_k_size,
                                         cfg.ups_preconcat_k_size,
                                         training=False)
                # rescale + CR cannot coexist (synthesis_input concatenates
                # at img_size); dense[None] is the rescale-case input
                syn_in = (dense[None] if rescale
                          else synthesis_input(cfg, dense, cr))
                acts = (syn_in, tgt) + aux
            else:  # upsampling: dense recomputed per candidate
                acts = ((jnp.asarray(_flat(params, cfg, "synthesis", "weight")),
                         jnp.asarray(_flat(params, cfg, "synthesis", "bias")),
                         tgt)
                        + tuple(syn_grids)
                        + ((cr_extra,) if cr_extra is not None else ())
                        + aux)
            import os as _os

            if use_tiles:
                chunk = int(_os.environ.get(
                    "COOLCHIC_RDOQ_SYN_CHUNK", 8 if n_lat > _BIG_N_LAT else 16))
            else:
                # full-resolution lanes (upsampling / rescale / motion):
                # each lane holds a dense stack + synthesis activations (+
                # warps for motion), so keep chunks small on big images
                chunk = int(_os.environ.get(
                    "COOLCHIC_RDOQ_FULL_CHUNK", 2 if n_lat > _BIG_N_LAT else 8))
            shifts = SYN_SHIFTS

        for wb in ("weight", "bias"):
            qv = float(2.0 ** q_shift[(module, wb)])
            cnt = int(expgol[(module, wb)])
            if (flat_w if wb == "weight" else flat_b).size == 0:
                continue
            if module == "upsampling" and wb == "bias":
                # upsampling biases are zero-initialized and UNUSED by the
                # forward (models/upsampling.py upsampling_apply) -- kept
                # only for descriptor parity. An edit can only add NN rate,
                # so the sweep would always re-pick 0; skip the probes.
                continue
            if module in ("synthesis", "upsampling"):
                if use_tiles:
                    n_tiles = max(1, min(16, cfg.img_size[0] // 32))
                    scorer = _make_syn_scorer(cfg, wb, float(lmbda), qv, cnt,
                                              shapes_w, shapes_b,
                                              frame_data_type, bitdepth,
                                              n_tiles, frame_type, len(aux))
                else:
                    syn_sw = tuple(_module_shapes(params, cfg, "synthesis",
                                                  "weight"))
                    syn_sb = tuple(_module_shapes(params, cfg, "synthesis",
                                                  "bias"))
                    scorer = _make_full_scorer(
                        cfg, module, wb, float(lmbda), qv, cnt, shapes_w,
                        shapes_b, syn_sw, syn_sb, frame_data_type, bitdepth,
                        frame_type, role, len(syn_grids),
                        cr_extra is not None, len(aux),
                        int((frame_ctx or {}).get("warp_filter_size", 4)))
            else:
                arm_sw = shapes_w if module == "arm" else arm_shapes_w
                arm_sb = shapes_b if module == "arm" else arm_shapes_b
                scorer = _make_rate_scorer(cfg, module, wb, qv, cnt, shapes_w,
                                           shapes_b, arm_sw, arm_sb, n_chunks)
            # The reconstruction sweeps (synthesis / upsampling) run the
            # HOST chunk loop: one probe program (conv tile scan or full
            # reconstruction x lanes) compiles and runs fine, but the
            # all-chunks device program (lax.scan + rollback lax.cond
            # embedding THREE copies of it) OOM-kills the remote TPU
            # compiler at full image sizes (docs/tpu_rdoq_issue.md). The
            # rate-only ARM/IFCE sweeps keep the single-program device path.
            flat_w, flat_b = _sweep(scorer, flat_w, flat_b, wb, shifts, qv,
                                    acts, chunk, rng, verbose,
                                    f"{module}.{wb}",
                                    force_host=module in ("synthesis",
                                                          "upsampling"))

        params = _set_flat(params, cfg, module, "weight", flat_w)
        params = _set_flat(params, cfg, module, "bias", flat_b)

    # Post-RDOQ exp-Golomb re-search: the greedy edits change the integer
    # histogram, so the per-tensor order chosen BEFORE RDOQ (nnquant/
    # quantize.py) can be stale. Re-picking is a pure host histogram scan
    # and strictly reduces the written NN bytes. (The reference keeps the
    # pre-RDOQ orders, reference nnquant/rdoq.py:28-215 — this is a free
    # improvement, largest at high λ where NN rate dominates.)
    if expgol is not None:
        from coolchic_tpu.nnquant.quantize import best_expgol

        for module in modules:
            for wb in ("weight", "bias"):
                flat = _flat(params, cfg, module, wb)
                if flat.size == 0:
                    continue
                q = float(2.0 ** q_shift[(module, wb)])
                ints = np.round(flat / q)
                cnt_new, _ = best_expgol(ints)
                expgol[(module, wb)] = int(cnt_new)

    return params
