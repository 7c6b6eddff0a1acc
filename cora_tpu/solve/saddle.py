"""Saddle escape along a negative-curvature direction.

Parity with `saddleEscape` (reference `src/CORA.cpp:245-350`, implementing
Theorem 3.9 of "A Riemannian Low-Rank Method for Optimization over
Semidefinite Matrices with Block-Diagonal Constraints"): after the rank
is incremented r → r+1, the uncertified solution Y is lifted by a zero
column and a descent step is taken along Ẏ = e_{r+1} vᵀ, where v is the
negative-curvature eigenvector from certification, with a backtracking
line search requiring both objective decrease and gradient norms above
the stopping tolerances. Falls back to the best objective decrease seen,
or the lifted saddle itself.

TPU-native twist: the whole ±α ladder is evaluated in ONE jitted,
vmapped device call (the reference evaluates trial points one by one —
through the tunneled TPU each eager dispatch costs ~20 ms, so a
40-trial sequential search would dominate the staircase). Deviations
from the reference recorded in PARITY.md: both signs of v are tried
(eigenvector sign is arbitrary after an inexact eigensolve), and the
ladder starts no lower than α = 1 (the reference's α₀ = 100·tol/|θ|
makes the decrease numerically invisible at strongly negative θ).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cora_tpu.graph.data import ProblemData
from cora_tpu.ops.riemannian import (
    retract,
    riemannian_gradient,
    tangent_space_projection,
)

N_ALPHAS = 24  # α ladder: alpha0 / 2^k, k = 0..N_ALPHAS-1


@partial(jax.jit, static_argnames=("precon", "op"))
def _trial_ladder(pd, Y_aug, Ydot, alphas, pfac, precon, op):
    """Evaluate all ±α trial points in one device program.

    Returns (f, grad_norm, pgrad_norm) for each signed trial, shaped
    (2·N_ALPHAS,): index 2k is +α_k, 2k+1 is −α_k (preserving the
    reference's preference for larger steps first). `precon` is the
    static (pd, fac, V) apply-function with its factor `pfac` passed as
    an operand (`cora_tpu.precond.PrecondOp`).
    """

    def fval(Z):
        QZ = op(Z) if op is not None else None
        if QZ is None:
            from cora_tpu.ops.quadratic import data_matrix_product

            QZ = data_matrix_product(pd, Z)
        return 0.5 * jnp.sum(Z * QZ), QZ

    def one_trial(signed_alpha):
        Y_test = retract(pd, Y_aug, signed_alpha * Ydot)
        f_test, QZ = fval(Y_test)
        grad = tangent_space_projection(pd, Y_test, QZ)
        grad_norm = jnp.linalg.norm(grad)
        pgrad = tangent_space_projection(pd, Y_test, precon(pd, pfac, grad))
        pgrad_norm = jnp.linalg.norm(pgrad)
        return f_test, grad_norm, pgrad_norm

    signed = jnp.stack([alphas, -alphas], axis=1).reshape(-1)
    f, gn, pgn = jax.lax.map(one_trial, signed)  # sequential map: bounded memory
    return signed, f, gn, pgn


def saddle_escape(
    pd: ProblemData,
    Y: jnp.ndarray,
    theta: float,
    v: np.ndarray,
    precon,
    gradient_tolerance: float = 1e-4,
    preconditioned_gradient_tolerance: float = 1e-4,
    alpha_min: float = 1e-6,
    verbose: bool = False,
    op=None,
):
    """Escape the rank-r saddle Y into rank r+1. Returns the new iterate
    (shape (N, r+1))."""
    N, r = Y.shape
    Y_aug = jnp.concatenate([Y, jnp.zeros((N, 1), Y.dtype)], axis=1)

    def fval(Z):
        if op is None:
            from cora_tpu.ops.quadratic import evaluate_objective

            return float(evaluate_objective(pd, Z))
        return 0.5 * float(jnp.sum(Z * op(Z)))

    f_saddle = fval(Y_aug)

    v = jnp.asarray(v, dtype=Y.dtype).reshape(N)
    Ydot = jnp.zeros_like(Y_aug).at[:, -1].set(v)

    alpha0 = max(16 * alpha_min, 100 * gradient_tolerance / abs(theta), 1.0)
    alphas = jnp.asarray(
        alpha0 * 0.5 ** np.arange(N_ALPHAS), dtype=Y.dtype
    )

    from cora_tpu.solve.tnt import _normalize_precon

    pfn, pfac = _normalize_precon(precon)
    signed, f, gn, pgn = _trial_ladder(pd, Y_aug, Ydot, alphas, pfac, pfn, op)
    f = np.asarray(f)
    gn = np.asarray(gn)
    pgn = np.asarray(pgn)
    signed = np.asarray(signed)

    ok = (
        (f < f_saddle)
        & (gn > gradient_tolerance)
        & (pgn > preconditioned_gradient_tolerance)
    )
    if ok.any():
        # first acceptable trial in ladder order = largest acceptable step
        best = int(np.argmax(ok))
        return retract(pd, Y_aug, float(signed[best]) * Ydot)

    # fallback: the trial point with the best strict decrease
    best = int(np.argmin(f))
    if f[best] < f_saddle:
        return retract(pd, Y_aug, float(signed[best]) * Ydot)

    if verbose:
        print(
            "WARNING: saddle-escape line search failed to escape the "
            "saddle point"
        )
    return Y_aug
