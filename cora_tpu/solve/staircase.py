"""The Riemannian staircase: solve → certify → escape → … → round → refine.

Parity with `solveCORA` (reference `src/CORA.cpp:26-243`):

  * per-rank TNT solve with the reference's hardcoded parameters;
  * certification threshold η = clamp(f · 5e-6, 1e-7, 1e-1)
    (`CORA.cpp:112-116,154`);
  * eigenvector bootstrap carried between staircase levels
    (`CORA.cpp:155-171`);
  * NaN-θ retry with doubled η (`CORA_problem.cpp:1076-1083`);
  * saddle escape with rank increment on certification failure;
  * post-loop rank-d SVD rounding + TNT refine + re-certification
    (`CORA.cpp:200-233`).

Host Python orchestrates the (at most ~7) rank levels; each level's
entire solve runs as one compiled device program. Rank is a static shape,
so each level compiles once and is cached across solves.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from cora_tpu.graph.data import ProblemData
from cora_tpu.graph.problem import Problem
from cora_tpu.precond import make_preconditioner
from cora_tpu.ops.riemannian import project_to_manifold, random_initial_guess
from cora_tpu.solve.certify import certify_solution
from cora_tpu.solve.rounding import align_estimate_to_origin, project_solution
from cora_tpu.solve.saddle import saddle_escape
from cora_tpu.solve.tnt import tnt_solve
from cora_tpu.types import CoraResult, SolverConfig

SADDLE_GRAD_TOL = 1e-4  # reference `CORA.cpp:191-192`
PRECON_SADDLE_GRAD_TOL = 1e-4


def _clamp(val, lo, hi):
    return min(max(val, lo), hi)


def solve_cora(
    problem: Problem,
    x0=None,
    max_rank: int | None = None,
    config: SolverConfig | None = None,
    verbose: bool | None = None,
) -> CoraResult:
    """Full certifiable solve of a range-aided SLAM problem."""
    config = config or SolverConfig()
    if max_rank is None:
        max_rank = config.max_rank
    if verbose is None:
        verbose = config.verbose

    def vprint(msg):
        if verbose:
            print(msg)

    pd = problem.device_data(dtype=config.dtype)
    precon = make_preconditioner(
        problem, pd, config.preconditioner,
        reg_chol_max_cond=config.reg_chol_max_cond,
    )
    cert_p = config.cert

    rank = problem.dim + config.init_rank_jump
    if x0 is None:
        X = random_initial_guess(pd, rank, jax.random.PRNGKey(config.seed))
    else:
        X = project_to_manifold(pd, jnp.asarray(x0, dtype=config.dtype))
        rank = X.shape[1]

    ranks_visited = []
    cert = None
    eigvec_bootstrap = None
    eta = cert_p.min_eta
    first_loop = True
    result = None

    while rank <= max_rank:
        ranks_visited.append(rank)
        vprint(f"\nSolving problem at rank {rank}")
        result = tnt_solve(pd, X, precon, config.tnt)
        vprint(
            f"Obtained solution with objective {result.f:.6f} "
            f"(|grad| {result.gradfx_norm:.2e}, {result.num_iterations} its, "
            f"{result.elapsed_time:.2f}s, {result.status})"
        )

        eta = _clamp(result.f * cert_p.rel_eta, cert_p.min_eta, cert_p.max_eta)
        if first_loop:
            eigvec_bootstrap = np.asarray(result.x)
            first_loop = False
        else:
            eigvec_bootstrap = cert.all_eigvecs

        cert = _certify_with_retry(
            problem, pd, result.x, eta, cert_p, eigvec_bootstrap
        )
        vprint(
            f"Certified: {cert.is_certified} (eta={eta:.2e}, "
            f"theta={cert.theta:.3e}, {cert.num_iters} eig iters)"
        )

        if np.isnan(cert.theta):
            raise RuntimeError("certification produced NaN theta")

        if cert.is_certified:
            X = result.x
            break

        rank += 1
        if rank > max_rank:
            X = result.x
            break
        X = saddle_escape(
            pd, result.x, cert.theta, cert.x, precon,
            SADDLE_GRAD_TOL, PRECON_SADDLE_GRAD_TOL, verbose=verbose,
        )

    # ---- rank-d rounding + refinement (`CORA.cpp:200-233`) ----
    if X.shape[1] > problem.dim:
        vprint(f"\nProjecting solution to rank {problem.dim} and refining")
        X = project_solution(pd, X, verbose=verbose)
        result = tnt_solve(pd, X, precon, config.tnt)
        vprint(f"FINAL objective {result.f:.6f}")
        eta = _clamp(result.f * cert_p.rel_eta, cert_p.min_eta, cert_p.max_eta)
        cert = _certify_with_retry(
            problem, pd, result.x, eta, cert_p, eigvec_bootstrap
        )
        X = result.x

    vprint(
        f"\nFinal solution certified: {cert.is_certified} "
        f"(eta={eta:.2e}, theta={cert.theta:.3e})"
    )
    return CoraResult(
        result=result,
        certified=bool(cert.is_certified),
        theta=float(cert.theta),
        eta=float(eta),
        ranks_visited=ranks_visited,
    )


def _certify_with_retry(problem, pd, Y, eta, cert_p, bootstrap):
    """NaN-θ retry loop (reference `CORA_problem.cpp:1076-1083`)."""
    cert = certify_solution(
        problem, pd, Y, eta,
        nx=cert_p.lobpcg_block_size,
        eigvec_bootstrap=bootstrap,
        max_lobpcg_iters=cert_p.max_lobpcg_iters,
    )
    retries = 0
    while np.isnan(cert.theta) and retries < 20:
        eta *= 2
        cert = certify_solution(
            problem, pd, Y, eta,
            nx=cert_p.lobpcg_block_size,
            eigvec_bootstrap=bootstrap,
            max_lobpcg_iters=cert_p.max_lobpcg_iters,
        )
        retries += 1
    return cert
