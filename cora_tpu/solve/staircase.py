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
    (`CORA.cpp:200-233`);
  * translation-implicit mode: the TNT state is [rotations | spheres]
    only, the operator is the marginalized Q̃ and certification happens
    on the recovered translation-explicit solution
    (`CORA.cpp:30-40,161-164`, `CORA_problem.cpp:1085-1100`).

Host Python orchestrates the (at most ~7) rank levels; each level's
entire solve runs as one compiled device program. Rank is a static shape,
so each level compiles once and is cached across solves.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from cora_tpu.graph.problem import Problem
from cora_tpu.models.formulations import make_operator

from cora_tpu.ops.riemannian import project_to_manifold, random_initial_guess
from cora_tpu.solve.certify import certify_solution
from cora_tpu.solve.rounding import align_estimate_to_origin, project_solution
from cora_tpu.solve.saddle import saddle_escape
from cora_tpu.solve.tnt import tnt_solve
from cora_tpu.types import CoraResult, Formulation, SolverConfig

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
    checkpoint_path: str | None = None,
) -> CoraResult:
    """Full certifiable solve of a range-aided SLAM problem."""
    config = config or SolverConfig()
    if max_rank is None:
        max_rank = config.max_rank
    if verbose is None:
        verbose = config.verbose
    implicit = config.formulation == Formulation.IMPLICIT

    def vprint(msg):
        if verbose:
            print(msg)

    t_start = time.time()
    pd = problem.device_data(dtype=config.dtype)
    op = problem.operator(config.formulation, dtype=config.dtype)
    precon_full = problem.preconditioner_fn(
        config.preconditioner, dtype=config.dtype,
        max_cond=config.reg_chol_max_cond,
    )
    if implicit:
        # lift → full preconditioner → truncate (reference
        # `CORA_problem.cpp:869-903`); cached for jit closure identity
        cache = getattr(problem, "_impl_precon_cache", None)
        if cache is None:
            cache = problem._impl_precon_cache = {}
        key = (config.preconditioner, np.dtype(config.dtype).name,
               config.reg_chol_max_cond)
        if key not in cache:
            def _impl_precon(V, _full=precon_full, _pd=pd):
                pad = jnp.zeros((_pd.num_translations, V.shape[1]), V.dtype)
                return _full(jnp.concatenate([V, pad], axis=0))[
                    : _pd.rot_range_size
                ]
            cache[key] = _impl_precon
        precon = cache[key]
    else:
        precon = precon_full
    cert_p = config.cert

    ckpt = None
    if checkpoint_path:
        from cora_tpu.solve.checkpoint import maybe_resume

        ckpt = maybe_resume(problem, checkpoint_path)

    state_height = pd.rot_range_size if implicit else pd.size
    rank = problem.dim + config.init_rank_jump
    if ckpt is not None:
        X = jnp.asarray(ckpt.Y, dtype=config.dtype)
        rank = ckpt.rank
        vprint(f"Resumed from checkpoint at rank {rank}")
    elif x0 is None:
        X = random_initial_guess(
            pd, rank, jax.random.PRNGKey(config.seed), height=state_height
        )
    else:
        X = jnp.asarray(np.asarray(x0), dtype=config.dtype)
        if X.shape[0] != state_height:
            if implicit and X.shape[0] == pd.size:
                X = X[:state_height]
            else:
                raise ValueError(
                    f"x0 has {X.shape[0]} rows, expected {state_height}"
                )
        X = project_to_manifold(pd, X)
        rank = X.shape[1]

    def to_explicit(Y):
        if implicit:
            return op.implicit.translation_explicit_solution(Y)
        return Y

    ranks_visited = list(ckpt.ranks_visited) if ckpt is not None else []
    all_iterates = [] if config.log_iterates else None
    cert = None
    eigvec_bootstrap = ckpt.eigvec_bootstrap if ckpt is not None else None
    eta = cert_p.min_eta
    first_loop = eigvec_bootstrap is None
    result = None
    sdp_cost = float("nan")
    t_certificate = float("nan")

    def save_ckpt(Y, r):
        if checkpoint_path:
            from cora_tpu.solve.checkpoint import (
                StaircaseCheckpoint,
                problem_fingerprint,
            )

            StaircaseCheckpoint(
                Y=np.asarray(Y), rank=r, ranks_visited=ranks_visited,
                eigvec_bootstrap=(
                    np.asarray(eigvec_bootstrap)
                    if eigvec_bootstrap is not None else None
                ),
                fingerprint=problem_fingerprint(problem),
            ).save(checkpoint_path)

    while rank <= max_rank:
        ranks_visited.append(rank)
        vprint(f"\n[t={time.time()-t_start:7.2f}s] Solving problem at rank {rank}")
        result = tnt_solve(
            pd, X, precon, config.tnt, op=op,
            log_iterates=config.log_iterates,
            max_iterations_override=config.max_staircase_iterations,
        )
        if all_iterates is not None and result.iterates:
            all_iterates.extend(result.iterates)
        vprint(
            f"Obtained solution with objective {result.f:.6f} "
            f"(|grad| {result.gradfx_norm:.2e}, {result.num_iterations} its, "
            f"{result.elapsed_time:.2f}s, {result.status})"
        )

        eta = _clamp(result.f * cert_p.rel_eta, cert_p.min_eta, cert_p.max_eta)
        Y_explicit = to_explicit(result.x)
        if first_loop:
            eigvec_bootstrap = np.asarray(Y_explicit)
            first_loop = False
        elif cert is not None:
            eigvec_bootstrap = cert.all_eigvecs

        t_c = time.time()
        cert = _certify_with_retry(
            problem, pd, Y_explicit, eta, cert_p, eigvec_bootstrap
        )
        vprint(
            f"[t={time.time()-t_start:7.2f}s] Certified: {cert.is_certified} "
            f"(eta={eta:.2e}, theta={cert.theta:.3e}, {cert.num_iters} eig "
            f"iters, cert took {time.time()-t_c:.2f}s)"
        )

        if np.isnan(cert.theta):
            raise RuntimeError("certification produced NaN theta")

        if cert.is_certified:
            X = result.x
            sdp_cost = result.f
            t_certificate = time.time() - t_start
            break

        rank += 1
        if rank > max_rank:
            X = result.x
            break
        save_ckpt(result.x, rank - 1)
        # negative-curvature direction in the solver's state space
        v = cert.x[: state_height]
        v = v / max(np.linalg.norm(v), 1e-300)
        t_e = time.time()
        X = saddle_escape(
            pd, result.x, cert.theta, v, precon,
            SADDLE_GRAD_TOL, PRECON_SADDLE_GRAD_TOL, verbose=verbose, op=op,
        )
        vprint(f"[t={time.time()-t_start:7.2f}s] saddle escape took "
               f"{time.time()-t_e:.2f}s")

    sdp_certified = bool(cert.is_certified)

    # ---- rank-d rounding + refinement (`CORA.cpp:200-233`) ----
    final_cert = cert
    if X.shape[1] > problem.dim:
        vprint(f"\nProjecting solution to rank {problem.dim} and refining")
        X = project_solution(pd, X, verbose=verbose)
        result = tnt_solve(
            pd, X, precon, config.tnt, op=op,
            log_iterates=config.log_iterates,
        )
        if all_iterates is not None and result.iterates:
            all_iterates.extend(result.iterates)
        if all_iterates is not None:
            result.iterates = all_iterates
        vprint(f"FINAL objective {result.f:.6f}")
        eta = _clamp(result.f * cert_p.rel_eta, cert_p.min_eta, cert_p.max_eta)
        final_cert = _certify_with_retry(
            problem, pd, to_explicit(result.x), eta, cert_p, eigvec_bootstrap
        )
        X = result.x

    suboptimality = (
        result.f - sdp_cost if np.isfinite(sdp_cost) else float("nan")
    )
    vprint(
        f"\nSDP certified: {sdp_certified} | final rank-d estimate "
        f"certified: {final_cert.is_certified} | suboptimality bound: "
        f"{suboptimality:.6f}"
    )
    if all_iterates is not None and result.iterates is not all_iterates:
        result.iterates = all_iterates
    return CoraResult(
        result=result,
        certified=sdp_certified,
        theta=float(final_cert.theta),
        eta=float(eta),
        ranks_visited=ranks_visited,
        sdp_cost=float(sdp_cost),
        suboptimality=float(suboptimality),
        final_certified=bool(final_cert.is_certified),
        elapsed_to_certificate=float(t_certificate),
    )


def extract_solution(problem: Problem, config: SolverConfig, res: CoraResult):
    """Translation-explicit, gauge-aligned final estimate."""
    pd = problem.device_data(dtype=config.dtype)
    Y = jnp.asarray(res.result.x)
    if config.formulation == Formulation.IMPLICIT:
        op = make_operator(problem, pd, config.formulation, dtype=config.dtype)
        Y = op.implicit.translation_explicit_solution(Y)
    return np.asarray(align_estimate_to_origin(pd, Y))


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
