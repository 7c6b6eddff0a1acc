"""Saddle escape along a negative-curvature direction.

Parity with `saddleEscape` (reference `src/CORA.cpp:245-350`, implementing
Theorem 3.9 of "A Riemannian Low-Rank Method for Optimization over
Semidefinite Matrices with Block-Diagonal Constraints"): after the rank
is incremented r → r+1, the uncertified solution Y is lifted by a zero
column and a descent step is taken along Ẏ = e_{r+1} vᵀ, where v is the
negative-curvature eigenvector from certification, with a backtracking
line search that halves α from max(16·α_min, 100·tol/|θ|) and requires
both objective decrease and gradient norms above the stopping tolerances
(so the next TNT run does not terminate immediately). Falls back to the
best objective decrease seen, or the lifted saddle itself.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cora_tpu.graph.data import ProblemData
from cora_tpu.ops.quadratic import evaluate_objective
from cora_tpu.ops.riemannian import (
    retract,
    riemannian_gradient,
    tangent_space_projection,
)


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

    def fval(Z):
        if op is None:
            return float(evaluate_objective(pd, Z))
        return 0.5 * float(jnp.vdot(Z, op(Z)))

    N, r = Y.shape
    Y_aug = jnp.concatenate([Y, jnp.zeros((N, 1), Y.dtype)], axis=1)
    f_saddle = fval(Y_aug)

    v = jnp.asarray(v, dtype=Y.dtype).reshape(N)
    Ydot = jnp.zeros_like(Y_aug).at[:, -1].set(v)

    # The reference starts at max(16·α_min, 100·tol/|θ|) (`CORA.cpp:286-288`)
    # which collapses to ~1e-5 for strongly-negative θ — there the quadratic
    # decrease ≈ ½|θ|α² drowns in float rounding of f and the search can
    # fail at a genuine saddle. Starting no lower than 1 and backtracking
    # subsumes the reference's range.
    alpha = max(16 * alpha_min, 100 * gradient_tolerance / abs(theta), 1.0)

    trials = []  # (signed alpha, f) for the fallback
    # v's sign is arbitrary (eigenvector); for a true negative-curvature
    # direction both signs descend to second order, but after an inexact
    # eigensolve one sign can be much better — try both.
    while alpha >= alpha_min:
        for sign in (1.0, -1.0):
            Y_test = retract(pd, Y_aug, sign * alpha * Ydot)
            f_test = fval(Y_test)
            grad = riemannian_gradient(pd, Y_test, op=op)
            grad_norm = float(jnp.linalg.norm(grad))
            pgrad = tangent_space_projection(pd, Y_test, precon(grad))
            pgrad_norm = float(jnp.linalg.norm(pgrad))
            trials.append((sign * alpha, f_test))

            if (
                f_test < f_saddle
                and grad_norm > gradient_tolerance
                and pgrad_norm > preconditioned_gradient_tolerance
            ):
                return Y_test
        alpha /= 2

    # fallback: the trial point with the best strict decrease
    alphas, fvals = zip(*trials)
    best = int(np.argmin(fvals))
    if fvals[best] < f_saddle:
        return retract(pd, Y_aug, alphas[best] * Ydot)

    if verbose:
        print(
            "WARNING: saddle-escape backtracking line search failed to "
            "escape the saddle point"
        )
    return Y_aug
