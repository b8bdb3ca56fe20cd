"""Encoder-side neural-network quantization: greedy per-module RD search over
(q_step_weight, q_step_bias) grids, picking the best exp-Golomb order per
parameter group.

Modules are processed in sorted name order (arm, ifce, synthesis,
upsampling), matching the reference (coolchic/nnquant/quantizemodel.py:60).
"""

from __future__ import annotations

import itertools
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

from coolchic_tpu.bitstream.headers import EXPGOL_COUNTS, MODULE_ORDER, Q_STEP_SHIFTS
from coolchic_tpu.bitstream.nncodec import flatten_module_params, unflatten_module_params
from coolchic_tpu.core.arch import CoolChicConfig

MAX_Q_VALUE = 65535  # 16-bit magnitude cap on quantized params


def exp_golomb_nbins(symbols: np.ndarray, count: int) -> float:
    """Rate estimate of a signed exp-Golomb code of order `count`
    (reference coolchic.py:1166-1181; <0.5% off the true bit count)."""
    x = np.abs(symbols.astype(np.float64))
    nbins = 2.0 * np.floor(np.log2(2.0 * x / (2.0**count) + 1.0)) + count + (symbols != 0)
    return float(nbins.sum())


def best_expgol(symbols: np.ndarray) -> tuple[int, float]:
    best_cnt, best_rate = 0, float("inf")
    for cnt in EXPGOL_COUNTS:
        r = exp_golomb_nbins(symbols, cnt)
        if r < best_rate:
            best_rate, best_cnt = r, cnt
    return best_cnt, best_rate


def _structure_copy(x):
    """Copy the dict/list CONTAINERS of a pytree, sharing the leaves --
    tracer-safe (no deepcopy of arrays), so a trial tree can be built inside
    a traced function."""
    if isinstance(x, dict):
        return {k: _structure_copy(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_structure_copy(v) for v in x]
    return x


def _set_module_params(params: dict, cfg: CoolChicConfig, module: str,
                       new_w: list, new_b: list) -> dict:
    """Return a copy of `params` with one module's arrays replaced
    (leaves shared with the input except the replaced module's)."""
    out = _structure_copy(params)
    unflatten_module_params([jnp.asarray(a) for a in new_w], cfg, module, "weight", out)
    unflatten_module_params([jnp.asarray(a) for a in new_b], cfg, module, "bias", out)
    return out


def _grid_losses(eval_with_ctx, cfg, module, ctx, cc_params, fpw, fpb, qs):
    """Score a module's whole q-step grid as ONE jitted lax.map program.

    Everything per-image (ctx, cc_params, float leaves) is an ARGUMENT, not a
    trace-time closure constant, so the compiled program contains no
    per-image literals: one XLA compile per (config, module) serves every
    image of the sweep."""
    import jax
    from functools import partial

    @partial(jax.jit, static_argnames=("_fn", "_cfg", "_mod"))
    def run(_fn, _cfg, _mod, _ctx, _cc, _fw, _fb, _qs):
        def body(q):
            w_q = [jnp.round(a / q[0]) * q[0] for a in _fw]
            b_q = [jnp.round(a / q[1]) * q[1] for a in _fb]
            return _fn(_ctx, _set_module_params(_cc, _cfg, _mod, w_q, b_q))

        return jax.lax.map(body, _qs)

    return run(eval_with_ctx, cfg, module, ctx, cc_params, fpw, fpb, qs)


def quantize_coolchic(cc_params: dict, cfg: CoolChicConfig,
                      eval_loss: Callable[[dict, float], float],
                      lmbda: float, n_pixels: int, verbose: bool = False,
                      eval_with_ctx=None, eval_ctx=None
                      ) -> tuple[dict, Dict[tuple, int], Dict[tuple, int], float]:
    """Quantize one cool-chic decoder's four modules.

    eval_loss(cc_params, total_rate_nn_bit) -> scalar RD loss (host float).

    eval_with_ctx (optional): TRACEABLE (ctx_pytree, cc_params_tree) -> RD
    loss WITHOUT the nn rate term, where ctx is the per-image data pytree
    passed via eval_ctx. When given, each module's whole (q_w x q_b) grid is
    scored as ONE device program (~4 device calls per decoder instead of
    ~650 host round-trips -- the round-trips dominate on a remote TPU).

    Returns (quantized params, q_step_shift dict, expgol dict, nn rate bits).
    """

    q_shift: Dict[tuple, int] = {}
    expgol: Dict[tuple, int] = {}
    nn_rate_bits: Dict[str, float] = {m: 0.0 for m in MODULE_ORDER}
    params = cc_params

    for module in sorted(MODULE_ORDER):
        fp_w = [np.asarray(a, dtype=np.float32)
                for a in flatten_module_params(params, cfg, module, "weight")]
        fp_b = [np.asarray(a, dtype=np.float32)
                for a in flatten_module_params(params, cfg, module, "bias")]
        if not fp_w:  # absent module (e.g. no IFCE)
            q_shift[(module, "weight")] = Q_STEP_SHIFTS[(module, "weight")][0]
            q_shift[(module, "bias")] = Q_STEP_SHIFTS[(module, "bias")][0]
            expgol[(module, "weight")] = 0
            expgol[(module, "bias")] = 0
            continue

        # Host side per combo: validity (16-bit magnitude cap) + exp-Golomb
        # rate of the integerized params.
        combos = []  # (shift_w, shift_b, (eg_w, eg_b), module_rate, total_nn_rate)
        for shift_w, shift_b in itertools.product(
                Q_STEP_SHIFTS[(module, "weight")], Q_STEP_SHIFTS[(module, "bias")]):
            qs_w, qs_b = 2.0**shift_w, 2.0**shift_b
            int_w = [np.round(a / qs_w) for a in fp_w]
            int_b = [np.round(a / qs_b) for a in fp_b]
            if any(np.abs(a).max(initial=0) > MAX_Q_VALUE for a in int_w + int_b):
                continue
            eg_w, rate_w = best_expgol(np.concatenate([a.ravel() for a in int_w]))
            eg_b, rate_b = best_expgol(np.concatenate([a.ravel() for a in int_b]))
            module_rate = rate_w + rate_b
            total_nn_rate = sum(nn_rate_bits.values()) - nn_rate_bits[module] + module_rate
            combos.append((shift_w, shift_b, (eg_w, eg_b), module_rate, total_nn_rate))
        assert combos, f"no valid q-step for module {module}"

        if eval_with_ctx is not None:
            fpw_j = tuple(jnp.asarray(a) for a in fp_w)
            fpb_j = tuple(jnp.asarray(a) for a in fp_b)
            qs = jnp.asarray([[2.0**c[0], 2.0**c[1]] for c in combos], jnp.float32)
            losses = np.asarray(_grid_losses(eval_with_ctx, cfg, module, eval_ctx,
                                             params, fpw_j, fpb_j, qs), np.float64)
            totals = losses + lmbda * np.asarray(
                [c[4] for c in combos], np.float64) / n_pixels
            k = int(np.argmin(totals))
            best = (totals[k], combos[k][0], combos[k][1], combos[k][2], combos[k][3])
        else:
            best = (float("inf"), None, None, None, None)  # loss, sw, sb, eg, rate
            for shift_w, shift_b, eg, module_rate, total_nn_rate in combos:
                qs_w, qs_b = 2.0**shift_w, 2.0**shift_b
                q_w = [np.round(a / qs_w) * qs_w for a in fp_w]
                q_b = [np.round(a / qs_b) * qs_b for a in fp_b]
                cand = _set_module_params(params, cfg, module, q_w, q_b)
                loss = eval_loss(cand, total_nn_rate)
                if loss < best[0]:
                    best = (loss, shift_w, shift_b, eg, module_rate)

        assert best[1] is not None, f"no valid q-step for module {module}"
        _, shift_w, shift_b, (eg_w, eg_b), module_rate = best
        qs_w, qs_b = 2.0**shift_w, 2.0**shift_b
        q_w = [np.round(a / qs_w) * qs_w for a in fp_w]
        q_b = [np.round(a / qs_b) * qs_b for a in fp_b]
        params = _set_module_params(params, cfg, module, q_w, q_b)
        q_shift[(module, "weight")] = shift_w
        q_shift[(module, "bias")] = shift_b
        expgol[(module, "weight")] = eg_w
        expgol[(module, "bias")] = eg_b
        nn_rate_bits[module] = module_rate
        if verbose:
            print(f"  quantize {module:<10} q_step 2^{shift_w}/2^{shift_b} "
                  f"expgol {eg_w}/{eg_b} rate {module_rate / n_pixels:.5f} bpp", flush=True)

    return params, q_shift, expgol, sum(nn_rate_bits.values())
