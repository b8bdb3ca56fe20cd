"""SOAP optimizer (Shampoo-eigenbasis Adam, arXiv:2409.11321) in JAX.

Semantics follow the implementation the reference vendors
(coolchic/training/soap.py, MIT, Nikhil Vyas): Adam runs in the eigenbasis of
per-dimension gradient-covariance (GG) matrices; the eigenbasis is refreshed
every `precondition_frequency` steps with one power-iteration + QR; the very
first step only initializes the preconditioner (no parameter update).

With max_precond_dim=0 every dimension is excluded and the transform reduces
to plain AdamW-style Adam -- exactly how the reference trains the latent
grids (betas (0.9, 0.999), wd 0) next to the SOAP'd network weights
(betas (0.95, 0.95), wd 0.01).

Everything is jit-friendly: static shapes, lax.cond for the init/refresh
branches, one state pytree per parameter leaf.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SoapHyperParams:
    b1: float = 0.95
    b2: float = 0.95
    shampoo_beta: float = -1.0  # < 0 -> use b2
    eps: float = 1e-8
    weight_decay: float = 0.01
    precondition_frequency: int = 10
    max_precond_dim: int = 10000
    precondition_1d: bool = False
    correct_bias: bool = True

    @property
    def effective_shampoo_beta(self) -> float:
        return self.shampoo_beta if self.shampoo_beta >= 0 else self.b2


def _precond_dims(shape: tuple[int, ...], hp: SoapHyperParams) -> tuple[bool, ...]:
    """Which dimensions get a GG/Q matrix."""
    if len(shape) == 1:
        return (hp.precondition_1d and shape[0] <= hp.max_precond_dim,)
    return tuple(s <= hp.max_precond_dim for s in shape)


def _project(x: jnp.ndarray, qs: tuple, active: tuple[bool, ...]) -> jnp.ndarray:
    """tensordot x with Q along each active dim (cyclic permute otherwise)."""
    for q, a in zip(qs, active):
        if a:
            x = jnp.tensordot(x, q, axes=[[0], [0]])
        else:
            x = jnp.moveaxis(x, 0, -1)
    return x


def _project_back(x: jnp.ndarray, qs: tuple, active: tuple[bool, ...]) -> jnp.ndarray:
    for q, a in zip(qs, active):
        if a:
            x = jnp.tensordot(x, q, axes=[[0], [1]])
        else:
            x = jnp.moveaxis(x, 0, -1)
    return x


def _outer_along(g: jnp.ndarray, idx: int) -> jnp.ndarray:
    axes = list(range(g.ndim))
    axes.remove(idx)
    return jnp.tensordot(g, g, axes=(axes, axes))


def soap_init_leaf(param: jnp.ndarray, hp: SoapHyperParams) -> dict[str, Any]:
    active = _precond_dims(param.shape, hp)
    return {
        "step": jnp.zeros((), dtype=jnp.int32),
        "initialized": jnp.zeros((), dtype=jnp.bool_),
        "exp_avg": jnp.zeros_like(param),
        "exp_avg_sq": jnp.zeros_like(param),
        "GG": [jnp.zeros((param.shape[i], param.shape[i]), dtype=param.dtype)
               if a else jnp.zeros((0,), dtype=param.dtype)
               for i, a in enumerate(active)],
        "Q": [jnp.eye(param.shape[i], dtype=param.dtype)
              if a else jnp.zeros((0,), dtype=param.dtype)
              for i, a in enumerate(active)],
    }


def _update_gg(gg_list, grad: jnp.ndarray, active, shampoo_beta: float):
    out = []
    for i, (gg, a) in enumerate(zip(gg_list, active)):
        if a:
            outer = _outer_along(grad, i)
            out.append(gg + (1.0 - shampoo_beta) * (outer - gg))
        else:
            out.append(gg)
    return out


def _eigh_qs(gg_list, active):
    qs = []
    for gg, a in zip(gg_list, active):
        if a:
            n = gg.shape[0]
            _, q = jnp.linalg.eigh(gg + 1e-30 * jnp.eye(n, dtype=gg.dtype))
            qs.append(jnp.flip(q, axis=1))
        else:
            qs.append(gg)  # empty placeholder
    return qs


def _qr_refresh(gg_list, q_list, exp_avg_sq, active):
    """One power iteration + QR, sorting by estimated eigenvalues (and
    permuting exp_avg_sq accordingly, as the reference does)."""
    new_qs = []
    for ind, (m, o, a) in enumerate(zip(gg_list, q_list, active)):
        if not a:
            new_qs.append(o)
            continue
        est_eig = jnp.diagonal(o.T @ m @ o)
        sort_idx = jnp.argsort(-est_eig)
        exp_avg_sq = jnp.take(exp_avg_sq, sort_idx, axis=ind)
        o = o[:, sort_idx]
        q, _ = jnp.linalg.qr(m @ o)
        new_qs.append(q)
    return new_qs, exp_avg_sq


def soap_init_from_grad_leaf(grad, state: dict, hp: SoapHyperParams) -> dict:
    """The reference's first step (soap.py:254-297, step:163-182): seed GG
    with the first gradient's covariances, set Q to their eigh eigenbasis
    (eigenvalues descending), make NO parameter update.

    Runs ONCE per phase on the HOST (numpy eigh on a handful of <= 256
    matrices) -- this keeps eigh out of every jitted graph, where its TPU
    compile is pathologically slow. grad may be a host array (fetch only
    the small weight-leaf gradients, never the latent grads)."""
    import numpy as np

    g = np.asarray(grad, dtype=np.float32)
    active = _precond_dims(g.shape, hp)
    beta = hp.effective_shampoo_beta
    new_gg, new_q = [], []
    for i, (gg, a) in enumerate(zip(state["GG"], active)):
        if not a:
            new_gg.append(gg)
            new_q.append(state["Q"][i])
            continue
        axes = list(range(g.ndim))
        axes.remove(i)
        outer = np.tensordot(g, g, axes=(axes, axes))
        gg_np = np.asarray(gg, np.float32) * beta + (1.0 - beta) * outer
        _, q = np.linalg.eigh(gg_np + 1e-30 * np.eye(gg_np.shape[0],
                                                     dtype=np.float32))
        new_gg.append(jnp.asarray(gg_np))
        new_q.append(jnp.asarray(np.flip(q, axis=1).copy()))
    new_state = dict(state)
    new_state["GG"] = new_gg
    new_state["Q"] = new_q
    new_state["initialized"] = jnp.ones((), dtype=jnp.bool_)
    return new_state


def soap_step_leaf(grad: jnp.ndarray, state: dict, param: jnp.ndarray,
                   lr: jnp.ndarray | float, hp: SoapHyperParams, *,
                   refresh: bool) -> tuple[jnp.ndarray, dict]:
    """One (initialized) SOAP step for one leaf. `refresh` is STATIC: the
    caller schedules the QR eigenbasis refresh every
    `hp.precondition_frequency` steps, so the hot graph carries no lax.cond."""
    active = _precond_dims(param.shape, hp)
    any_active = any(active)

    qs = state["Q"]
    grad_proj = _project(grad, qs, active)
    step = state["step"] + 1
    exp_avg = state["exp_avg"] * hp.b1 + grad_proj * (1.0 - hp.b1)
    exp_avg_sq = state["exp_avg_sq"] * hp.b2 + jnp.square(grad_proj) * (1.0 - hp.b2)
    denom = jnp.sqrt(exp_avg_sq) + hp.eps

    step_size = lr
    if hp.correct_bias:
        bc1 = 1.0 - hp.b1 ** step.astype(jnp.float32)
        bc2 = 1.0 - hp.b2 ** step.astype(jnp.float32)
        step_size = step_size * jnp.sqrt(bc2) / bc1

    norm_grad = _project_back(exp_avg / denom, qs, active)
    new_param = param - step_size * norm_grad
    if hp.weight_decay > 0:
        new_param = new_param - lr * hp.weight_decay * new_param

    gg = _update_gg(state["GG"], grad, active, hp.effective_shampoo_beta)
    if refresh and any_active:
        exp_avg_back = _project_back(exp_avg, qs, active)
        new_qs, exp_avg_sq = _qr_refresh(gg, qs, exp_avg_sq, active)
        exp_avg = _project(exp_avg_back, new_qs, active)
    else:
        new_qs = list(qs)

    new_state = {
        "step": step,
        "initialized": state["initialized"],
        "exp_avg": exp_avg,
        "exp_avg_sq": exp_avg_sq,
        "GG": gg,
        "Q": new_qs,
    }
    return new_param, new_state


def soap_init(params, hp: SoapHyperParams):
    return jax.tree_util.tree_map(partial(soap_init_leaf, hp=hp), params)
