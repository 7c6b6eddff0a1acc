"""Blocked LOBPCG for minimum eigenpairs of a symmetric linear operator.

Replaces the reference's vendored `Optimization::LinearAlgebra::LOBPCG`
(call sites `src/CORA_utils.cpp:90-176`, `src/CORA_problem.cpp:567-575`).
TPU-first design: the operator is applied to the whole 3k-column search
basis at once (batched columns are nearly free in the factored Q
operator), the Rayleigh–Ritz is a 3k×3k `eigh`, and the basis is kept
orthonormal with a tall-skinny QR — all MXU-shaped dense ops inside one
`lax.while_loop`.

Supports the reference's early-stop user function (terminate as soon as
the Rayleigh quotient of the leading vector drops below a threshold —
used to abort certification once sufficiently negative curvature is
found, `CORA_utils.cpp:90-99`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def lobpcg_min(
    operator: Callable,
    X0: jax.Array,
    max_iters: int,
    tol: float = 1e-6,
    nev: int = 1,
    precon: Optional[Callable] = None,
    early_stop_below: Optional[float] = None,
):
    """Compute the `nev` algebraically-smallest eigenpairs of `operator`.

    Args:
      operator: symmetric linear map V (N,c) → (N,c).
      X0: (N,k) initial block, k ≥ nev.
      max_iters: iteration cap.
      tol: relative residual tolerance for convergence of the nev pairs.
      precon: optional SPD preconditioner map V → TV.
      early_stop_below: if set, stop as soon as the leading Rayleigh
        quotient is < this value (reference stopfun, `CORA_utils.cpp:90-99`).

    Returns: (theta (k,), X (N,k), num_iters, num_converged)
    """
    N, k = X0.shape
    dtype = X0.dtype
    eps = jnp.finfo(dtype).eps

    def _qr(Z):
        Q, _ = jnp.linalg.qr(Z)
        return Q

    HI = jax.lax.Precision.HIGHEST

    def rayleigh_ritz(Z):
        SZ = operator(Z)
        A = jnp.matmul(Z.T, SZ, precision=HI)
        A = 0.5 * (A + A.T)
        theta, C = jnp.linalg.eigh(A)
        return theta, C, SZ

    X = _qr(X0)
    theta0, C, SX = rayleigh_ritz(X)
    X = jnp.matmul(X, C, precision=HI)
    SX = jnp.matmul(SX, C, precision=HI)
    P = jnp.zeros_like(X)

    def cond(c):
        return jnp.logical_and(c["k"] < max_iters, jnp.logical_not(c["done"]))

    def body(c):
        X, SX, P, theta = c["X"], c["SX"], c["P"], c["theta"]
        R = SX - X * theta[None, :]
        resnorm = jnp.linalg.norm(R, axis=0)
        scale = jnp.maximum(jnp.abs(theta), 1.0)
        n_conv = jnp.sum(
            (resnorm[:nev] <= tol * scale[:nev]).astype(jnp.int32)
        ).astype(jnp.int32)
        W = precon(R) if precon is not None else R

        Z = jnp.concatenate([X, W, P], axis=1)  # (N, 3k)
        Q = _qr(Z)
        theta_all, C, SQ = rayleigh_ritz(Q)
        Cx = C[:, :k]
        X_new = jnp.matmul(Q, Cx, precision=HI)
        SX_new = jnp.matmul(SQ, Cx, precision=HI)
        # search-direction memory: contribution of the (W, P) part
        Cp = Cx.at[:k, :].set(0.0)
        P_new = jnp.matmul(Q, Cp, precision=HI)
        theta_new = theta_all[:k]

        done = n_conv >= nev
        if early_stop_below is not None:
            done = jnp.logical_or(done, theta_new[0] < early_stop_below)
        return dict(
            X=X_new, SX=SX_new, P=P_new, theta=theta_new,
            k=c["k"] + 1, done=done, n_conv=n_conv,
        )

    init = dict(
        X=X, SX=SX, P=P, theta=theta0[:k],
        k=jnp.zeros((), jnp.int32), done=jnp.zeros((), jnp.bool_),
        n_conv=jnp.zeros((), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out["theta"], out["X"], out["k"], out["n_conv"]
