"""Host float64 endgame polish: drive the Riemannian gradient to ~1e-6
before certification.

The device staircase runs in float32 for raw TPU speed and stalls at the
dtype's precision floor (|grad| ~ 1e-2..1 at plaza2 scale) — but the
certificate S = Q − Λ(Y) proves optimality only together with
(near-)stationarity of Y, and the reference certifies TNT output
converged to its 1e-6 gradient tolerance in double precision
(`src/CORA.cpp:98-109,139-171`). This module is the handoff: a compact
float64 Riemannian trust-region Newton (Steihaug–Toint tCG) polish on
the host, preconditioned by an exact sparse factorization of Q + λI —
the same regularized-Cholesky scheme as the device preconditioner
(`src/CORA_problem.cpp:544-614`), realized with SuperLU.

Why the host CPU instead of the device TNT in float64: the single-chip
TPU (v5e) has no native f64, and this is a handful of Newton iterations
on an already-near-critical point. The hot path (the whole damped-Newton
CG solve and the Armijo probes) runs as jitted XLA:CPU float64 programs
over the same `cora_tpu.ops.riemannian` kernels the device solver uses
(reference math `src/CORA_problem.cpp:742-938`), so the polished point
is a stationary point of the same objective the device solver optimized;
a numpy mirror of the manifold calculus is kept below as the
specification and golden-test oracle.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


# fixed rank width the polish pads to (zero columns are exactly invariant
# under the whole polish; one width = one XLA:CPU compile per problem)
POLISH_PAD_RANK = 6


@dataclasses.dataclass
class PolishResult:
    Y: np.ndarray
    f: float
    grad_norm: float  # float64 Riemannian gradient norm at Y
    iterations: int
    status: str


# ---------------------------------------------------------------------------
# float64 manifold calculus (numpy mirror of cora_tpu.ops.riemannian)
# ---------------------------------------------------------------------------

def _split(pd, Y):
    nd = pd.rot_size
    r = Y.shape[1]
    return (
        Y[:nd].reshape(pd.n, pd.d, r),
        Y[nd:nd + pd.m],
        Y[nd + pd.m:],
    )


def _join(pd, Yrot, Ysph, Ytr):
    r = Yrot.shape[-1]
    return np.concatenate([Yrot.reshape(pd.rot_size, r), Ysph, Ytr], axis=0)


def _sym(M):
    return 0.5 * (M + np.swapaxes(M, -1, -2))


def _bT(A):
    return np.swapaxes(A, -1, -2)


def tangent_project(pd, Y, V):
    Yrot, Ysph, Ytr = _split(pd, Y)
    Vrot, Vsph, Vtr = _split(pd, V)
    YVt = np.matmul(Yrot, _bT(Vrot))
    Prot = Vrot - np.matmul(_sym(YVt), Yrot)
    inner = np.sum(Ysph * Vsph, axis=-1, keepdims=True)
    Psph = Vsph - inner * Ysph
    return _join(pd, Prot, Psph, Vtr)


def hessian_vector_product(pd, Q, Y, nablaF, dotY):
    """Riemannian Hv (reference `CORA_problem.cpp:822-867`) in float64."""
    H = Q @ dotY
    Yrot, Ysph, _ = _split(pd, Y)
    Grot, Gsph, _ = _split(pd, nablaF)
    Hrot, Hsph, Htr = _split(pd, H)
    drot, dsph, _ = _split(pd, dotY)

    YGt = np.matmul(Yrot, _bT(Grot))
    Hrot = Hrot - np.matmul(_sym(YGt), drot)
    YVt = np.matmul(Yrot, _bT(Hrot))
    Hrot = Hrot - np.matmul(_sym(YVt), Yrot)

    inner = np.sum(Gsph * Ysph, axis=-1, keepdims=True)
    Hsph = Hsph - inner * dsph
    hi = np.sum(Ysph * Hsph, axis=-1, keepdims=True)
    Hsph = Hsph - hi * Ysph

    return _join(pd, Hrot, Hsph, Htr)


def _invsqrt_spd(M):
    """Batched (…,d,d) SPD inverse square root; closed form for d ≤ 2
    (M^{1/2} = (M + √det·I)/√(tr + 2√det)), eigh otherwise."""
    d = M.shape[-1]
    if d == 1:
        return 1.0 / np.sqrt(np.maximum(M, np.finfo(np.float64).tiny))
    if d == 2:
        a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 1, 1]
        s = np.sqrt(np.maximum(a * c - b * b, np.finfo(np.float64).tiny))
        t = np.sqrt(np.maximum(a + c + 2.0 * s, np.finfo(np.float64).tiny))
        # (M + sI)^{-1} · t  ==  M^{-1/2}
        det = (a + s) * (c + s) - b * b
        f = t / np.maximum(det, np.finfo(np.float64).tiny)
        out = np.empty_like(M)
        out[..., 0, 0] = f * (c + s)
        out[..., 1, 1] = f * (a + s)
        out[..., 0, 1] = -f * b
        out[..., 1, 0] = -f * b
        return out
    w, V = np.linalg.eigh(M)
    w = np.maximum(w, np.finfo(np.float64).tiny)
    return np.matmul(V * (1.0 / np.sqrt(w))[..., None, :], _bT(V))


def project_to_manifold(pd, A):
    """Polar projection per block: A_i ↦ (A_i A_iᵀ)^{-1/2} A_i; rows
    normalized on the oblique block (reference `CORA_problem.cpp:905-934`)."""
    Arot, Asph, Atr = _split(pd, A)
    if pd.n:
        AAT = np.matmul(Arot, _bT(Arot))
        Arot = np.matmul(_invsqrt_spd(AAT), Arot)
    if pd.m:
        nrm = np.linalg.norm(Asph, axis=-1, keepdims=True)
        Asph = Asph / np.maximum(nrm, np.finfo(np.float64).tiny)
    return _join(pd, Arot, Asph, Atr)


# ---------------------------------------------------------------------------
# preconditioner: (Q + λI)^{-1} — banded+Woodbury fast path (LAPACK
# triangular solves, ~1 ms/apply), SuperLU fallback for non-banded graphs
# ---------------------------------------------------------------------------

def _q_norm(problem) -> float:
    """Cached ‖Q‖₂ estimate."""
    cached = getattr(problem, "_polish_qnorm", None)
    if cached is None:
        from cora_tpu.precond.banded import estimate_spectral_norm

        cached = problem._polish_qnorm = float(
            estimate_spectral_norm(problem.data_matrix())
        )
    return cached


def _regularized_lu(problem, max_cond: float = 1e6):
    cache = getattr(problem, "_polish_lu_cache", None)
    if cache is not None and cache[0] == max_cond:
        return cache[1]
    Q = problem.data_matrix()
    lam = _q_norm(problem) / (max_cond - 1.0)
    lu = spla.splu((Q + lam * sp.eye(Q.shape[0])).tocsc())
    problem._polish_lu_cache = (max_cond, lu)
    return lu


def _host_precon(problem, pd, max_cond: float = 1e6):
    """V ↦ (Q+λI)⁻¹V on host: banded factor when the graph permits
    (exact for every reference dataset), SuperLU otherwise."""
    cache = getattr(problem, "_polish_precon_cache", None)
    if cache is not None and cache[0] == max_cond:
        return cache[1]
    try:
        from cora_tpu.precond.banded import factor_banded, host_banded_solve

        lam = _q_norm(problem) / (max_cond - 1.0)
        F = factor_banded(problem, pd, problem.data_matrix(), lam,
                          require_exact=True)

        def solve(V, _F=F, _pd=pd):
            return host_banded_solve(_pd, _F, V)
    except (np.linalg.LinAlgError, ValueError):
        lu = _regularized_lu(problem, max_cond)

        def solve(V, _lu=lu):
            return _lu.solve(V)
    problem._polish_precon_cache = (max_cond, solve)
    return solve


# ---------------------------------------------------------------------------
# trust-region Newton polish
# ---------------------------------------------------------------------------

def _newton_cg(grad, hess, precon, max_iters, kappa=0.25, theta=1.0):
    """Unconstrained preconditioned CG for H s = −grad, truncated at
    negative curvature (returns the accumulated iterate; the steepest
    direction if curvature is negative immediately). Inexact-Newton
    forcing term: stop at ‖r‖_P ≤ ‖r₀‖_P·min(κ, ‖r₀‖_P^θ) for
    superlinear convergence."""
    s = np.zeros_like(grad)
    r = grad.copy()
    z = precon(r)
    d = -z
    rz = float(np.vdot(r, z))
    if rz <= 0:
        return -grad, 0
    rz_stop = rz * min(kappa, (np.sqrt(rz)) ** theta) ** 2
    tiny = np.finfo(np.float64).tiny
    for k in range(max_iters):
        Hd = hess(d)
        dHd = float(np.vdot(d, Hd))
        if dHd <= 0:
            return (d if k == 0 else s), k + 1
        alpha = rz / max(dHd, tiny)
        s = s + alpha * d
        r = r + alpha * Hd
        z = precon(r)
        rz_new = float(np.vdot(r, z))
        if rz_new <= rz_stop:
            return s, k + 1
        d = -z + (rz_new / max(rz, tiny)) * d
        rz = rz_new
    return s, max_iters


# ---------------------------------------------------------------------------
# jitted float64 CPU kernels: the whole Newton-CG inner solve and the
# line-search probes run as XLA:CPU programs (the numpy mirror above is
# kept for golden tests and as the math specification; per-call numpy
# dispatch on batched (n,d,r) ops costs ~1-2 ms each, which dominated the
# polish at ~1.3 s/solve — the jitted path runs the same math in ~0.1 ms)
# ---------------------------------------------------------------------------

def _cpu_device():
    import jax

    return jax.devices("cpu")[0]


def _jax_polish_kernels(problem, max_cond: float):
    """(pd64, newton_step, probe) jitted on the host CPU backend; cached
    on the problem (jit specializes on closure identity)."""
    cache = getattr(problem, "_polish_jax_cache", None)
    if cache is not None and cache[0] == max_cond:
        return cache[1]

    import jax
    import jax.numpy as jnp
    from functools import partial

    from cora_tpu.ops.quadratic import data_matrix_product
    from cora_tpu.ops.riemannian import (
        project_to_manifold as jproj,
        riemannian_hvp,
        tangent_space_projection,
    )
    from cora_tpu.types import Preconditioner

    cpu = _cpu_device()
    pd64 = problem.device_data(dtype=np.float64, device=cpu)
    precon_raw = problem.preconditioner_fn(
        Preconditioner.REGULARIZED_CHOLESKY, dtype=np.float64,
        max_cond=max_cond, device=cpu,
    )
    # sequential-scan preconditioner apply: the associative scan's
    # unrolled graph costs ~90 s of XLA:CPU compile per rank shape
    from cora_tpu.precond import PrecondOp
    from cora_tpu.precond.banded import banded_apply_seq

    precon_raw = PrecondOp(banded_apply_seq, precon_raw.fac, precon_raw.pd)

    @jax.jit
    def newton_step(Y, tau, max_cg):
        """f/grad at Y plus the damped-Newton direction s from a
        preconditioned-CG solve of (Hess + τI)s = −grad (negative
        curvature truncation, superlinear forcing term)."""
        nablaF = data_matrix_product(pd64, Y)
        f = 0.5 * jnp.vdot(Y, nablaF)
        grad = tangent_space_projection(pd64, Y, nablaF)
        gn = jnp.linalg.norm(grad)

        def hess(v):
            return riemannian_hvp(pd64, Y, nablaF, v) + tau * v

        def prec(v):
            return tangent_space_projection(pd64, Y, precon_raw(v))

        z0 = prec(grad)
        rz0 = jnp.vdot(grad, z0)
        rz_stop = rz0 * jnp.minimum(0.25, jnp.sqrt(rz0)) ** 2
        tiny = jnp.finfo(jnp.float64).tiny

        def cond(c):
            s, r, z, d, rz, k, done = c
            return jnp.logical_and(k < max_cg, jnp.logical_not(done))

        def body(c):
            s, r, z, d, rz, k, done = c
            Hd = hess(d)
            dHd = jnp.vdot(d, Hd)
            neg = dHd <= 0
            alpha = rz / jnp.where(dHd == 0, tiny, dHd)
            s_new = jnp.where(neg, jnp.where(k == 0, d, s), s + alpha * d)
            r_new = r + alpha * Hd
            z_new = prec(r_new)
            rz_new = jnp.vdot(r_new, z_new)
            conv = rz_new <= rz_stop
            beta = rz_new / jnp.where(rz == 0, tiny, rz)
            d_new = -z_new + beta * d
            done_new = jnp.logical_or(neg, conv)
            return (s_new, r_new, z_new, d_new, rz_new, k + 1, done_new)

        s0 = jnp.zeros_like(grad)
        init = (s0, grad, z0, -z0, rz0, jnp.zeros((), jnp.int32), rz0 <= 0)
        s, _, _, _, _, k_cg, _ = jax.lax.while_loop(cond, body, init)
        gdir = jnp.vdot(grad, s)
        # fall back to preconditioned steepest descent if not a descent dir
        s = jnp.where(gdir < 0, s, -z0)
        gdir = jnp.where(gdir < 0, gdir, -rz0)
        return f, grad, gn, s, gdir, k_cg

    @jax.jit
    def probe(Y, s, alpha):
        """Armijo probe: retract and evaluate f."""
        Y_prop = jproj(pd64, Y + alpha * s)
        f_prop = 0.5 * jnp.vdot(Y_prop, data_matrix_product(pd64, Y_prop))
        return Y_prop, f_prop

    @jax.jit
    def probe_ladder(Y, s, alphas):
        """The whole Armijo backtracking ladder in ONE dispatch: retract
        and evaluate f at every candidate step length (sequential probes
        cost ~0.1 s each in dispatch overhead; a 40-probe line search ×
        30 Newton iterations was a 200 s worst case)."""

        def one(alpha):
            Y_prop = jproj(pd64, Y + alpha * s)
            f_prop = 0.5 * jnp.vdot(Y_prop, data_matrix_product(pd64, Y_prop))
            return Y_prop, f_prop

        return jax.lax.map(one, alphas)

    kernels = (pd64, newton_step, probe, probe_ladder)
    problem._polish_jax_cache = (max_cond, kernels)
    return kernels


def polish_solution(
    problem,
    pd,
    Y,
    grad_tol: float | None = None,
    max_iterations: int = 30,
    max_tcg_iterations: int = 60,
    max_cond: float = 1e6,
    time_budget: float | None = None,
) -> PolishResult:
    """Polish Y to a float64 (near-)critical point of f(Y) = ½tr(YᵀQY)
    on the product manifold (translation-explicit formulation).

    Regularized Riemannian Newton-CG: each outer iteration solves
    (Hess + τI)s = −grad inexactly with preconditioned CG and an Armijo
    backtracking line search, with τ = min(1, |grad|) — a Levenberg-style
    damping that keeps the system positive definite through the
    mixed-curvature region and vanishes as the gradient does (restoring
    fast local convergence). This beats both a trust-region loop (the
    O(r)-gauge null space makes M-norm radii crawl) and undamped
    Newton-CG (immediate negative-curvature truncations) at the SDP
    endgame.

    The inner math runs as jitted XLA:CPU float64 programs (whole CG
    solve in one dispatch); the numpy mirror above is the specification
    and the golden-test oracle.

    `grad_tol` defaults to 1e-6·‖Q‖₂ — the reference's 1e-6 gradient
    tolerance (`src/CORA.cpp:100-101`) expressed scale-invariantly.
    """
    import jax
    import jax.numpy as jnp

    if grad_tol is None:
        grad_tol = 1e-6 * max(1.0, _q_norm(problem))
    pd64, newton_step, probe, probe_ladder = _jax_polish_kernels(
        problem, max_cond)
    cpu = _cpu_device()
    r_in = int(np.asarray(Y).shape[1])
    # pad the rank to a fixed width: zero columns are invariant under the
    # whole polish (Stiefel blocks stay row-orthonormal, gradients and CG
    # iterates have identically-zero padded columns), and one padded
    # width means ONE XLA:CPU compile of the Newton/ladder programs per
    # problem instead of one ~30 s compile per staircase rank
    r_pad = max(r_in, POLISH_PAD_RANK)
    with jax.default_device(cpu):
        from cora_tpu.ops.riemannian import project_to_manifold as _jp

        Y_np = np.zeros((np.asarray(Y).shape[0], r_pad), np.float64)
        Y_np[:, :r_in] = np.asarray(Y, np.float64)
        Y = _jp(pd64, jnp.asarray(Y_np))
        t0 = time.time()

        f = float("nan")
        gn = float("inf")
        status = "max_iterations"
        k = 0
        for k in range(1, max_iterations + 1):
            if time_budget is not None and time.time() - t0 > time_budget:
                status = "time_budget"
                break
            gn_prev = gn
            # every operand CPU-committed: a default-device (TPU) scalar
            # here would drag each call through the device tunnel
            tau = jnp.asarray(
                min(1.0, gn_prev if np.isfinite(gn_prev) else 1.0),
                jnp.float64)
            f_, grad, gn_, s, gdir, _ = newton_step(
                Y, tau, jnp.asarray(max_tcg_iterations, jnp.int64))
            f, gn = float(f_), float(gn_)
            if gn <= grad_tol:
                status = "gradient_tolerance"
                break

            gdir = float(gdir)
            # batched Armijo ladder: one dispatch evaluates every candidate
            alphas = 0.5 ** np.arange(16, dtype=np.float64)
            Y_props, f_props = probe_ladder(Y, s, jnp.asarray(alphas))
            f_props = np.asarray(f_props)
            ok = (f_props <= f + 1e-4 * alphas * gdir) | (f_props < f)
            if not ok.any():
                status = "line_search_failure"
                break
            i = int(np.argmax(ok))  # largest accepted step
            Y = Y_props[i]
            f = float(f_props[i])
    # final f/grad at the accepted point (same compiled program: the CG
    # cap is a traced operand)
    with jax.default_device(cpu):
        f_, _, gn_, _, _, _ = newton_step(
            Y, jnp.asarray(1.0, jnp.float64), jnp.asarray(1, jnp.int64))
    f, gn = float(f_), float(gn_)
    if gn <= grad_tol:
        status = "gradient_tolerance"
    return PolishResult(
        Y=np.asarray(Y)[:, :r_in], f=f, grad_norm=gn, iterations=k,
        status=status,
    )
