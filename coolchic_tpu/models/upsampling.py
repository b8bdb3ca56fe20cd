"""Learned pyramid upsampling with symmetric separable kernels.

Each x2 step applies (a) a transposed conv with an even symmetric separable
kernel to the accumulated coarse stack and (b) an odd symmetric separable
residual pre-filter to the higher-resolution grid before concatenation.
Kernels are parameterized by their half (symmetry is structural, so the
bitstream only carries (k+1)//2 taps per filter).

Reference parity: coolchic/component/core/upsampling.py:19-595. The
reference's train (2-D kron conv) and eval (two 1-D passes) variants are the
same linear operator; here both run as the MXU matmul formulation (see the
"Matmul formulation" section below).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from coolchic_tpu.ops.resize import interpolate_x2

# Half of the symmetric bicubic x2 kernel used as the >=8 taps init
# (normative init constant, upsampling.py:266).
_BICUBIC_HALF = np.array([0.0351562, 0.1054687, -0.2617187, -0.8789063], dtype=np.float32)
_BILINEAR_HALF = np.array([0.25, 0.75], dtype=np.float32)


def half_param_size(target_k_size: int) -> int:
    return (target_k_size + 1) // 2


def symmetric_kernel_1d(half: jnp.ndarray, target_k_size: int) -> jnp.ndarray:
    """(a b c), k=5 -> (a b c b a); (a b c), k=6 -> (a b c c b a)."""
    reversed_ = jnp.flip(half)
    return jnp.concatenate([half, reversed_[target_k_size % 2:]])


def tconv_half_init(k_size: int) -> jnp.ndarray:
    assert k_size >= 4 and k_size % 2 == 0, f"ups kernel must be even >= 4, got {k_size}"
    core = _BILINEAR_HALF if k_size < 8 else _BICUBIC_HALF
    half = np.zeros((half_param_size(k_size),), dtype=np.float32)
    half[len(half) - len(core):] = core
    return jnp.asarray(half)


def preconcat_half_init(k_size: int) -> jnp.ndarray:
    assert k_size % 2 == 1, f"preconcat kernel must be odd, got {k_size}"
    half = np.zeros((half_param_size(k_size),), dtype=np.float32)
    half[-1] = 1.0  # Dirac after symmetrization
    return jnp.asarray(half)


def upsampling_init(ups_k_size: int, ups_preconcat_k_size: int, n_ups: int) -> dict:
    return {
        "tconv_half": [tconv_half_init(ups_k_size) for _ in range(n_ups)],
        "tconv_bias": [jnp.zeros((1,), dtype=jnp.float32) for _ in range(n_ups)],
        "conv_half": [preconcat_half_init(ups_preconcat_k_size) for _ in range(n_ups)],
        "conv_bias": [jnp.zeros((1,), dtype=jnp.float32) for _ in range(n_ups)],
    }


# ---------------------------------------------------------------------------
# Matmul (MXU) formulation of the separable chains.
#
# A 1-channel conv / transposed conv with lhs_dilation is the single worst
# op class for XLA-TPU (no MXU use, dilated sliding windows on the VPU):
# measured 27 ms of a 31 ms forward at 256x384. Each 1-D chain
# (replicate-pad -> stride-2 tconv -> crop, or zero-pad -> stride-1 conv) is
# linear in the input AND linear in the symmetric half-kernel, so it is
# exactly  y = (sum_t half[t] * B_t) @ x  with constant 0/1-ish basis
# matrices B_t -- two dense matmuls per 2-D op, fully on the MXU, still
# differentiable w.r.t. the half taps.
# ---------------------------------------------------------------------------
@lru_cache(maxsize=None)
def _tconv_mm_basis(n_in: int, k: int) -> np.ndarray:
    """[hk, 2*n_in, n_in] basis of the 1-D replicate-pad/x2-tconv/crop chain.

    Chain semantics (torch parity, reference upsampling.py:287-345):
    pad p0=k//2 replicate; y[m] = sum_u w[k-1-u] * dilated(x_pad)[m+u-(k-1)];
    crop 2*p0-1+k//2 per side. w is the symmetrized half kernel.
    """
    p0 = k // 2
    crop = 2 * p0 - 1 + k // 2
    hk = (k + 1) // 2
    n_pad = n_in + 2 * p0
    out = np.zeros((hk, 2 * n_in, n_in), dtype=np.float32)
    for m_f in range(2 * n_in):
        m = m_f + crop
        for u in range(k):
            v = m + u - (k - 1)
            if v < 0 or v >= 2 * n_pad - 1 or v % 2:
                continue
            src = min(max(v // 2 - p0, 0), n_in - 1)
            w_idx = k - 1 - u
            t = w_idx if w_idx < hk else k - 1 - w_idx
            out[t, m_f, src] += 1.0
    return out


@lru_cache(maxsize=None)
def _conv_mm_basis(n_in: int, k: int) -> np.ndarray:
    """[hk, n_in, n_in] basis of 1-D zero-padded stride-1 cross-correlation."""
    pad = k // 2
    hk = (k + 1) // 2
    out = np.zeros((hk, n_in, n_in), dtype=np.float32)
    for i in range(n_in):
        for u in range(k):
            j = i + u - pad
            if j < 0 or j >= n_in:
                continue
            t = u if u < hk else k - 1 - u
            out[t, i, j] += 1.0
    return out


def _sep_matrices(half: jnp.ndarray, basis_fn, sizes: tuple[int, int], k: int):
    bh = jnp.asarray(basis_fn(sizes[0], k))
    bw = jnp.asarray(basis_fn(sizes[1], k))
    return jnp.einsum("t,tij->ij", half, bh), jnp.einsum("t,tij->ij", half, bw)


def _tconv_x2(x: jnp.ndarray, half: jnp.ndarray, k: int, training: bool) -> jnp.ndarray:
    """Upsample [B, 1, H, W] -> [B, 1, 2H, 2W] with the symmetric kernel.

    `training` kept for signature parity: train (2-D kron conv) and eval
    (two separable 1-D passes) are the same linear operator; both run as the
    matmul formulation here.
    """
    th, tw = _sep_matrices(half, _tconv_mm_basis, x.shape[-2:], k)
    y = jnp.einsum("oh,bchw->bcow", th, x)
    return jnp.einsum("ow,bchw->bcho", tw, y)


def _preconcat(x: jnp.ndarray, half: jnp.ndarray, k: int, training: bool) -> jnp.ndarray:
    """Residual symmetric filtering of [B, 1, H, W] (zero padding), as two
    dense matmuls (see _tconv_x2)."""
    if x.shape[1] == 0:
        return x
    ch, cw = _sep_matrices(half, _conv_mm_basis, x.shape[-2:], k)
    y = jnp.einsum("oh,bchw->bcow", ch, x)
    y = jnp.einsum("ow,bchw->bcho", cw, y)
    return y + x


def _pin_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """Under an ambient mesh with a "space" axis (jax.set_mesh in
    parallel/spatial.py), pin every pyramid intermediate to REPLICATED. The
    pyramid's per-level matmuls are tiny next to the synthesis convs, but
    the deep levels' backward tensors otherwise inherit degenerate
    H-shardings that drive GSPMD into "involuntary full rematerialization"
    on the einsum transposes; the dense stack is resharded to H-split right
    after upsampling (models/coolchic.py), so the expensive stages still run
    spatially sharded. No-op when no mesh is set (single chip, shard_map
    bodies)."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or list(getattr(mesh, "shape", {})) != ["space"]:
            return x
        import jax as _jax
        from jax.sharding import PartitionSpec as P

        return _jax.lax.with_sharding_constraint(x, P())
    except Exception:
        return x


def respread_spatial(x: jnp.ndarray) -> jnp.ndarray:
    """Reshard a dense [.., H, W] stack back onto the "space" axis after the
    replicated upsampling pyramid (see _pin_spatial); identity without an
    ambient spatial mesh or an indivisible H."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is None or list(getattr(mesh, "shape", {})) != ["space"]:
            return x
        n = mesh.shape["space"]
        if x.shape[-2] % n != 0:
            return x
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, P(*([None] * (x.ndim - 2)), "space", None))
    except Exception:
        return x


def upsampling_apply(params: dict, grids: list[jnp.ndarray], ups_k_size: int,
                     ups_preconcat_k_size: int, training: bool) -> jnp.ndarray:
    """Latent grids (largest first, each [H_i, W_i]) -> dense [C, H, W] stack.

    Output channel c corresponds to input grid c (reference ordering).
    """
    n_ups = len(params["tconv_half"])
    rev = list(reversed(grids))
    acc = rev[0][None, None]  # [1(batch=channels), 1, h, w]
    for idx, target in enumerate(rev[1:]):
        x = acc.reshape(-1, 1, acc.shape[-2], acc.shape[-1])
        x = _tconv_x2(x, params["tconv_half"][idx % n_ups], ups_k_size, training)
        x = x[:, :, : target.shape[-2], : target.shape[-1]]
        high = _preconcat(target[None, None], params["conv_half"][idx % n_ups],
                          ups_preconcat_k_size, training)
        acc = jnp.concatenate([high, x.reshape(1, -1, *x.shape[-2:])], axis=1)
        acc = _pin_spatial(acc)
    # acc: [1, C, H, W] with channel 0 = largest grid ... channel C-1 = smallest
    return acc[0]


def fixed_upsampling(grids: list[jnp.ndarray], mode: str = "bicubic"
                     ) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """Non-learned pyramid upsampling (reference upsampling.py:556-595).

    grids: largest first, each [H_i, W_i].
    Returns (dense [C, H, W] stack, intermediates) where intermediates[j] is
    the [j, h, w]-shaped stack of the j smallest grids at the resolution of
    the j-th smallest grid (intermediates[0] is a zeros placeholder).
    """
    rev = list(reversed(grids))
    acc = rev[0][None]  # [1, h, w]
    intermediates: list[jnp.ndarray] = [jnp.zeros_like(acc)]
    for target in rev[1:]:
        intermediates.append(acc)
        if acc.shape[-2:] != target.shape[-2:]:
            x = interpolate_x2(acc, mode)
            x = x[..., : target.shape[-2], : target.shape[-1]]
        else:
            x = acc
        # same degenerate-sharding guard as the learned pyramid (the IFCE
        # context path runs this chain on the tiniest grids)
        acc = _pin_spatial(jnp.concatenate([target[None], x], axis=0))
    return acc, intermediates
