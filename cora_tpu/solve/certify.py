"""Optimality certification: Lagrange multipliers, certificate operator,
and the fast PSD verification cascade.

Parity with the reference (`src/CORA_problem.cpp:1030-1166`,
`src/CORA_utils.cpp:17-186` — Algorithm 3 of "Accelerating Certifiable
Estimation with Preconditioned Eigensolvers"):

  1. SVD-ratio early exit: σ_max/σ_min(Y) > 1e6 ⇒ rank-deficient ⇒
     treat as certified (`CORA_problem.cpp:1036-1049`).
  2. Λ blocks — Stiefel: sym((QY)_i Y_iᵀ) per pose; Oblique: row inner
     products ⟨Y_e, (QY)_e⟩ (`CORA_problem.cpp:1105-1131`).
  3. Certificate S = Q − Λ; PSD ⟺ the rank-restricted solution is a
     global optimum of the SDP relaxation.
  4. Verification cascade: dense eigendecomposition for small problems
     (`CORA_utils.cpp:63-74`), otherwise unpreconditioned LOBPCG with a
     1%-budget early-stop pass, then Jacobi-preconditioned LOBPCG with
     the remaining budget (`CORA_utils.cpp:101-176`; the reference uses
     an ILDL factorization host-side — on TPU a clamped diagonal
     preconditioner keeps the whole test on device).
  5. NaN-θ retry with doubled η happens in the caller
     (`CORA_problem.cpp:1076-1083` → `cora_tpu.solve.staircase`).

S is never materialized on device: S·V = Q·V − Λ·V with Q in factored
edge form and Λ as batched d×d blocks + a diagonal.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cora_tpu.graph.data import ProblemData
from cora_tpu.ops.lobpcg import lobpcg_min
from cora_tpu.ops.quadratic import (
    data_matrix_product,
    jacobi_diagonal,
    join_state,
    split_state,
)
from cora_tpu.types import CertResults

DENSE_CUTOFF = 100  # reference `CORA_utils.cpp:63`


def compute_lambda_blocks(pd: ProblemData, Y: jax.Array, QY=None):
    """Lagrange-multiplier blocks (reference `compute_Lambda_blocks`)."""
    if QY is None:
        QY = data_matrix_product(pd, Y)
    Yrot, Ysph, _ = split_state(pd, Y)
    Grot, Gsph, _ = split_state(pd, QY)
    from cora_tpu.ops.linalg import bmm

    P = bmm(Grot, jnp.swapaxes(Yrot, -1, -2))  # (QY)_i Y_iᵀ per pose
    Lam_rot = 0.5 * (P + jnp.swapaxes(P, -1, -2))  # (n, d, d)
    lam_sph = jnp.sum(Ysph * Gsph, axis=-1)  # (m,)
    return Lam_rot, lam_sph


def apply_lambda(pd: ProblemData, Lam_rot, lam_sph, V: jax.Array) -> jax.Array:
    Vrot, Vsph, Vtr = split_state(pd, V)
    from cora_tpu.ops.linalg import bmm

    LV_rot = bmm(Lam_rot, Vrot)
    LV_sph = lam_sph[:, None] * Vsph
    return join_state(pd, LV_rot, LV_sph, jnp.zeros_like(Vtr))


def make_certificate_operator(pd: ProblemData, Y: jax.Array):
    """Returns S(V) = QV − ΛV and the Λ blocks."""
    Lam_rot, lam_sph = compute_lambda_blocks(pd, Y)

    def S(V):
        return data_matrix_product(pd, V) - apply_lambda(pd, Lam_rot, lam_sph, V)

    return S, (Lam_rot, lam_sph)


def materialize_certificate(problem, pd: ProblemData, Y) -> np.ndarray:
    """Dense S = Q − Λ on host (small problems / golden tests)."""
    Q = problem.data_matrix().toarray()
    Lam_rot, lam_sph = compute_lambda_blocks(pd, jnp.asarray(Y))
    Lam_rot = np.asarray(Lam_rot)
    lam_sph = np.asarray(lam_sph)
    S = Q.copy()
    d = pd.d
    for i in range(pd.n):
        S[i * d:(i + 1) * d, i * d:(i + 1) * d] -= Lam_rot[i]
    for e in range(pd.m):
        S[pd.rot_size + e, pd.rot_size + e] -= lam_sph[e]
    return S


_lam_jit = jax.jit(compute_lambda_blocks)


@partial(jax.jit, static_argnames=("it1", "it2", "tol"))
def _cert_eig_device(pd, Y, Lam_rot, lam_sph, X0, eta, it1, it2, tol,
                     bfac=None):
    """Minimum eigenpair of S = Q − Λ via the two-stage LOBPCG cascade,
    compiled as ONE device program with η as a dynamic argument (the
    staircase calls this once per rank level and again on each η-doubling
    NaN retry; baking η into the trace would recompile every time).

    Mirrors `fast_verification` stages 3–4 (`CORA_utils.cpp:90-176`):
    stage 1 unpreconditioned with a 1% budget + early stop on clearly
    negative curvature, stage 2 preconditioned with the remaining budget.
    The stage-2 preconditioner is the banded+Woodbury factor of S + σI
    when one exists (`bfac`, passed as a traced pytree so each staircase
    level reuses this compiled program) — the ILDL analog of
    `CORA_utils.cpp:128-176` — and a clamped Jacobi diagonal otherwise.
    """
    eta = jnp.asarray(eta, Y.dtype)

    def M_op(V):
        return (
            data_matrix_product(pd, V)
            - apply_lambda(pd, Lam_rot, lam_sph, V)
            + eta * V
        )

    # stage 1: unpreconditioned, early-stop when θ_M < η/2 ⟺ θ_S < −η/2
    _, X1, k1, _ = lobpcg_min(
        M_op, X0, it1, tol=tol, nev=1, early_stop_below=eta / 2.0
    )

    # stage 2: preconditioned with the remaining budget. Runs
    # unconditionally (same compiled program either way); if stage 1
    # already found negative curvature the early-stop fires on the first
    # body iteration, costing one cheap (N,3k) block step.
    if bfac is not None:
        from cora_tpu.precond.banded import banded_apply

        precon = lambda V: banded_apply(pd, bfac, V)
    else:
        diagS = jacobi_diagonal(pd)
        diag_rot = (
            jnp.diagonal(Lam_rot, axis1=-2, axis2=-1).reshape(-1)
            if pd.n
            else jnp.zeros((0,), Y.dtype)
        )
        lam_diag = jnp.concatenate(
            [diag_rot, lam_sph, jnp.zeros((pd.num_translations,), Y.dtype)]
        )
        diagM = diagS - lam_diag + eta
        inv_diag = jnp.where(
            jnp.abs(diagM) > 1e-8, 1.0 / jnp.abs(diagM), 1.0
        )[:, None]
        precon = lambda V: inv_diag * V

    _, X2, k2, _ = lobpcg_min(
        M_op,
        X1,
        it2,
        tol=tol,
        nev=1,
        precon=precon,
        early_stop_below=eta / 2.0,
    )

    x = X2[:, 0]
    theta = x @ (M_op(x[:, None])[:, 0] - eta * x)  # Rayleigh quotient on S
    # convergence of the leading Ritz pair (residual on M)
    R = M_op(X2[:, :1]) - (theta + eta) * X2[:, :1]
    resnorm = jnp.linalg.norm(R)
    return theta, x, X2, k1 + k2, resnorm


def certify_solution(
    problem,
    pd: ProblemData,
    Y: jax.Array,
    eta: float,
    nx: int = 10,
    eigvec_bootstrap=None,
    max_lobpcg_iters: int = 500,
    tol: float = 1e-3,
    seed: int = 0,
    rank_deficient_exit: bool = False,
    method: str = "host",
    eig_tol: float = 1e-5,
    escape_eig_iters: int | None = None,
) -> CertResults:
    """Certify Y as a global optimum (reference `certify_solution`).

    `method="host"` (default) runs the float64 host cascade
    (`cora_tpu.solve.verification`): banded-Cholesky / sparse-LDLᵀ PSD
    decision, then shift-invert Lanczos for the minimum eigenpair — the
    CHOLMOD + ILDL-LOBPCG analog of `src/CORA_utils.cpp:17-186`.
    `method="device"` keeps the whole test on device with the two-stage
    LOBPCG (TPU-only operation; weaker convergence at θ ~ 1e-5 scales).
    `method="auto"` (what the staircase uses): the PSD *decision* is
    always the exact float64 banded Cholesky of S + ηI when the graph's
    band is exact (every reference dataset) — rigor identical to the
    host path — but on a NOT-PD verdict the negative-curvature eigvec
    for the saddle escape comes from the fast banded-preconditioned
    device LOBPCG instead of host ARPACK (the escape direction needs no
    certification-grade accuracy). Falls back to the host cascade when
    the band is inexact.
    """
    Y = jnp.asarray(Y)
    N = pd.size
    r = Y.shape[1]

    # --- rank-deficiency early exit (`CORA_problem.cpp:1036-1049`) ---
    # The reference certifies any Y with singular-value ratio > 1e6
    # outright. That is unsound when a saddle escape failed and left a
    # rank-deficient *saddle* (first-order critical but with negative
    # curvature), so this exit is off by default — the banded-Cholesky
    # PSD test below is cheap enough to always run and decides correctly.
    if rank_deficient_exit:
        from cora_tpu.ops.riemannian import riemannian_gradient

        grad_norm = float(jnp.linalg.norm(riemannian_gradient(pd, Y)))
        sv = np.linalg.svd(np.asarray(Y), compute_uv=False)
        critical = grad_norm <= 1e-3 * max(1.0, float(sv[0]))
    else:
        critical, sv = False, np.ones(2)
    if critical and (sv[-1] == 0 or sv[0] / sv[-1] > 1e6):
        return CertResults(
            is_certified=True,
            theta=0.0,
            x=np.zeros(N),
            all_eigvecs=np.zeros((N, nx)),
            num_iters=0,
        )

    num_eigvecs = min(max(nx, r + 2), N)

    # --- small problems: dense eigendecomposition (`CORA_utils.cpp:63-74`) ---
    if N <= DENSE_CUTOFF:
        S = materialize_certificate(problem, pd, Y)
        w, V = np.linalg.eigh(S)
        theta = float(w[0])
        return CertResults(
            is_certified=bool(theta >= -eta),
            theta=theta,
            x=V[:, 0],
            all_eigvecs=V[:, :num_eigvecs],
            num_iters=0,
        )

    eta = float(eta)

    # --- host float64 cascade (default): Λ and S recomputed in f64 from
    # Y so the verdict is not polluted by the float32 staircase state ---
    if method == "host":
        from cora_tpu.solve.verification import (
            certificate_matrix_host,
            verify_psd_host,
        )

        S_host = certificate_matrix_host(
            pd, problem.data_matrix(), np.asarray(Y)
        )

        # banded-Cholesky PSD fast path (exact on chain-structured
        # graphs; the CHOLMOD attempt of `CORA_utils.cpp:31-51`)
        if pd.n:
            try:
                from cora_tpu.precond.banded import factor_banded

                factor_banded(problem, pd, S_host, eta, require_exact=True)
                return CertResults(
                    is_certified=True,
                    theta=0.0,
                    x=np.zeros(N),
                    all_eigvecs=np.zeros((N, num_eigvecs)),
                    num_iters=0,
                )
            except (np.linalg.LinAlgError, ValueError):
                pass  # not PD or band inexact: the LDLᵀ/Lanczos stage decides

        v0 = None
        if eigvec_bootstrap is not None:
            boot = np.asarray(eigvec_bootstrap)
            v0 = boot[:, 0] if boot.ndim == 2 else boot
            if v0.shape[0] != N:
                v0 = None
        hv = verify_psd_host(
            S_host, eta, nev=num_eigvecs, v0=v0, tol=eig_tol,
            maxiter=max_lobpcg_iters,
        )
        return CertResults(
            is_certified=bool(hv.is_psd),
            theta=hv.theta,
            x=hv.x,
            all_eigvecs=hv.eigvecs,
            num_iters=hv.num_eig_iters,
        )

    # --- device path: factored-operator LOBPCG cascade, stays on TPU.
    # Runs in the problem's device dtype (float32 staircase: the escape
    # eigenvector and the method="device" Ritz value need no float64;
    # TPU v5e has no native f64). The exact float64 banded PSD DECISION
    # runs first — the device transfers (Y upload, Λ blocks, banded
    # factor) are only paid when the decision is NOT-PSD and the saddle
    # escape needs the negative-curvature eigenvector. ---
    Y_host64 = np.asarray(Y, np.float64)  # decision stays float64

    psd_known = False
    band_inexact = not pd.n
    bfac = None
    if pd.n:
        from cora_tpu.precond.banded import (
            device_factor,
            factor_banded,
        )
        from cora_tpu.solve.verification import certificate_matrix_host

        S_sparse = certificate_matrix_host(
            pd, problem.data_matrix(), Y_host64
        )
        try:
            factor_banded(problem, pd, S_sparse, eta, require_exact=True)
            return CertResults(
                is_certified=True,
                theta=0.0,
                x=np.zeros(N),
                all_eigvecs=np.zeros((N, num_eigvecs)),
                num_iters=0,
            )
        except np.linalg.LinAlgError:
            psd_known = True  # definitively NOT PSD; LOBPCG finds the eigvec
        except ValueError:
            band_inexact = True  # eigensolver must make the decision

        # stage-2 preconditioner: banded factor of S + σI, σ escalated
        # until PD (the ILDL analog of `CORA_utils.cpp:128-176`; the
        # shift only weakens — never invalidates — the preconditioner).
        # The last successful σ seeds the retry loop at cache/16 — one
        # level up from where a fresh search would land after the first
        # retry — so successive staircase levels (similar spectra) pay at
        # most one extra factorization, while a single level that needed
        # a huge σ cannot permanently weaken the preconditioner (the
        # seed decays again as soon as smaller shifts succeed). Cleared
        # by Problem.invalidate() with the other solve caches.
        sigma = max(eta, 1e-6)
        if problem is not None:
            sigma = max(sigma, getattr(problem, "_cert_sigma_cache", 0.0) / 16.0)
        for _ in range(12):
            try:
                F_pre = factor_banded(problem, pd, S_sparse, sigma)
                bfac = device_factor(pd, F_pre, dtype=pd.dtype())
                if problem is not None:
                    problem._cert_sigma_cache = sigma
                break
            except np.linalg.LinAlgError:
                sigma *= 16.0

    if method == "auto" and band_inexact:
        # the banded decision procedure is unavailable: delegate the
        # whole test to the rigorous host float64 cascade
        return certify_solution(
            problem, pd, Y_host64, eta, nx=nx,
            eigvec_bootstrap=eigvec_bootstrap,
            max_lobpcg_iters=max_lobpcg_iters, tol=tol, seed=seed,
            method="host", eig_tol=eig_tol,
        )

    # decision made (NOT-PSD) or undecidable: now pay the device uploads
    Y = jnp.asarray(Y_host64, pd.dtype())
    lam_blocks = _lam_jit(pd, Y)

    rng = np.random.default_rng(seed)
    X0 = rng.standard_normal((N, num_eigvecs)).astype(pd.dtype())
    if eigvec_bootstrap is not None:
        boot = np.asarray(eigvec_bootstrap)
        if boot.ndim == 1:
            boot = boot[:, None]
        ncols = min(boot.shape[1], num_eigvecs)
        X0[:, :ncols] = boot[:, :ncols]
    X0 = jnp.asarray(X0)

    # with method="auto" the PSD DECISION was already made by the exact
    # banded Cholesky; the eigenvector only seeds the saddle escape and
    # needs no certification-grade convergence — a reduced budget saves
    # device time on every failed level
    eig_budget = max_lobpcg_iters
    if method == "auto" and psd_known and escape_eig_iters is not None:
        eig_budget = min(max_lobpcg_iters, escape_eig_iters)
    it1 = max(int(0.01 * eig_budget), 3)
    it2 = eig_budget - it1
    theta, x, X_blk, iters, resnorm = jax.device_get(
        _cert_eig_device(
            pd, Y, lam_blocks[0], lam_blocks[1], X0, eta, it1, it2, tol,
            bfac=bfac,
        )
    )
    theta = float(theta)
    iters = int(iters)

    if psd_known:
        certified = False
        if theta > -eta / 2.0:
            # the exact banded decision says λ_min(S) < −η, but the
            # device LOBPCG exited near θ ≈ 0 — its (bootstrap-seeded)
            # block converged to the wrong end of the spectrum, and a
            # zero-curvature escape direction stalls the whole staircase
            # (observed: θ = −5·10⁻⁸ after 2 iterations while the level
            # was genuinely not optimal). Get a trustworthy direction
            # from the host shift-invert Lanczos instead.
            from cora_tpu.solve.verification import verify_psd_host

            hv = verify_psd_host(
                S_sparse, eta, nev=num_eigvecs,
                v0=np.asarray(x, np.float64), maxiter=max_lobpcg_iters,
            )
            if np.isfinite(hv.theta):
                theta = float(hv.theta)
                x = hv.x.astype(np.asarray(x).dtype)
                X_blk = hv.eigvecs.astype(np.asarray(X_blk).dtype)
                iters += int(hv.num_eig_iters)
    else:
        # no exact factorization available: certify only on a *converged*
        # non-negative verdict (a barely-negative unconverged Ritz value
        # must not certify)
        converged = float(resnorm) <= tol * max(abs(theta), 1.0)
        certified = bool(theta >= -eta and converged)

    return CertResults(
        is_certified=certified,
        theta=theta,
        x=np.asarray(x),
        all_eigvecs=np.asarray(X_blk),
        num_iters=iters,
    )
