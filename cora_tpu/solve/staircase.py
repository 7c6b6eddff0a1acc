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

TPU-native deviations from the reference's control flow (both exist
because the device staircase runs in float32 with a per-level iteration
cap, where the reference runs float64 TNT to its 1e-6 tolerance):

  * **Ramp levels.** When a level exhausts its iteration/time budget at a
    point that is nowhere near critical (|grad| ≫ tolerance), S = Q − Λ
    carries no optimality information and there is no saddle to escape —
    instead of paying for certification + the escape line search, the
    state is lifted with a small random column (breaking the rank-r
    invariant subspace that a zero column would preserve) and the
    staircase continues at rank r+1.
  * **Finish phase + float64 polish.** A level that does reach a
    (near-)critical point is re-run with the full tCG budget to the
    float32 floor, then polished on the host in float64
    (`cora_tpu.solve.polish`) to the reference's 1e-6 gradient tolerance
    before the certificate is computed — so certification always happens
    at a genuinely stationary point, as in the reference
    (`src/CORA.cpp:139-171`).
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
from cora_tpu.types import (
    CertResults,
    CoraResult,
    Formulation,
    Initialization,
    Preconditioner,
    SolverConfig,
)
from cora_tpu.utils.timing import PhaseTimer

SADDLE_GRAD_TOL = 1e-4  # reference `CORA.cpp:191-192`
PRECON_SADDLE_GRAD_TOL = 1e-4


def _clamp(val, lo, hi):
    return min(max(val, lo), hi)


def _trim_rank(Y: np.ndarray, d: int, rel_tol: float = 1e-3) -> np.ndarray:
    """Drop numerically-dead columns of Y via thin SVD: Y ↦ U_r Σ_r.

    X = YYᵀ (and with it cost, Λ blocks and the certificate S) is
    preserved up to the trimmed singular energy; the right factor Vᵀ is
    pure gauge. Keeps at least d columns (St(d,r) needs r ≥ d)."""
    U, s, _ = np.linalg.svd(np.asarray(Y, np.float64), full_matrices=False)
    if s.size == 0 or s[0] == 0:
        return np.asarray(Y, np.float64)
    r = max(int((s > rel_tol * s[0]).sum()), d)
    return U[:, :r] * s[:r]


@jax.jit
def _lift_random(pd, Y, key, scale):
    """Lift Y to rank r+1 with a small random column, reprojected.

    A zero column would leave the lifted point on a rank-r invariant
    subspace of the dynamics (the gradient's new column is identically
    zero); the random column breaks the symmetry so TNT can populate the
    new dimension. Used at ramp levels where there is no saddle structure
    to follow (cf. the eigenvector escape, `src/CORA.cpp:245-350`)."""
    col = scale * jax.random.normal(key, (Y.shape[0], 1), Y.dtype)
    return project_to_manifold(pd, jnp.concatenate([Y, col], axis=1))


def solve_cora(
    problem: Problem,
    x0=None,
    max_rank: int | None = None,
    config: SolverConfig | None = None,
    verbose: bool | None = None,
    checkpoint_path: str | None = None,
    mesh=None,
) -> CoraResult:
    """Full certifiable solve of a range-aided SLAM problem.

    `mesh`: optional `jax.sharding.Mesh` — runs the whole staircase
    (TNT, saddle escape, refinement) on the edge-sharded Q·Y operator
    with replicated state and one psum per Hessian-vector product
    (`cora_tpu.parallel.sharding`); the preconditioner apply and
    rounding act on replicated arrays and need no communication.
    Certification stays on the host float64 path (SURVEY §2.3 —
    green-field distribution; the reference is single-threaded).
    """
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
    if mesh is not None:
        shard_op = problem.sharded_operator(mesh, dtype=config.dtype)
        if implicit:
            # marginalized operator over the edge-sharded explicit
            # product: Qmain/B products ride the psum path, the banded
            # L⁻¹ apply is replicated host-factored math
            op = make_operator(
                problem, pd, config.formulation, dtype=config.dtype,
                full_product=shard_op,
            )
        else:
            op = shard_op
    else:
        op = problem.operator(config.formulation, dtype=config.dtype)
    precon_full = problem.preconditioner_fn(
        config.preconditioner, dtype=config.dtype,
        max_cond=config.reg_chol_max_cond,
    )
    if implicit:
        # lift → full preconditioner → truncate (reference
        # `CORA_problem.cpp:869-903`)
        from cora_tpu.precond import implicit_precond

        precon = implicit_precond(precon_full)
    else:
        precon = precon_full
    # explicit single-device solves use the pd-argument operator path
    # inside TNT (op=None): the problem arrays travel as jit operands,
    # not closure constants — smaller modules, no device→host constant
    # pulls at lowering, one compiled program per shape
    solver_op = None if (not implicit and mesh is None) else op
    cert_p = config.cert

    ckpt = None
    if checkpoint_path:
        from cora_tpu.solve.checkpoint import maybe_resume

        ckpt = maybe_resume(problem, checkpoint_path)

    state_height = pd.rot_range_size if implicit else pd.size
    rank = problem.dim + config.init_rank_jump
    if x0 is None and config.initialization == Initialization.ODOMETRY:
        # reference odometry initialization (`paper_experiments.cpp:
        # 441-520`): chain-composed rotations, priors/ranges seeded from
        # the measurements
        from cora_tpu.models.init import odometry_initialization

        x0 = odometry_initialization(problem, rank=rank, seed=config.seed)
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

    # ---- fused Pallas kernel backend selection (round 4) ----
    # one kernel dispatch per tCG solve / per outer step instead of
    # hundreds of XLA dispatches; covers chain graphs with the
    # RegularizedCholesky preconditioner (every reference dataset except
    # mrclam's inter-robot ranges — those fall back transparently)
    kernel_eligible = (
        config.use_pallas != "never"
        and mesh is None
        and not implicit
        and config.preconditioner == Preconditioner.REGULARIZED_CHOLESKY
        and not config.log_iterates
        and config.dtype == np.float32
    )
    if kernel_eligible and config.use_pallas == "auto":
        kernel_eligible = jax.default_backend() == "tpu"
    kernel_interpret = (
        config.use_pallas == "always" and jax.default_backend() != "tpu"
    )
    _kernel_fallback_reported = set()

    kernel_disabled = [False]  # set on a runtime compile failure

    def run_tnt(X, **kw):
        """One TNT solve, on the fused-kernel backend when available."""
        if kernel_eligible and not kernel_disabled[0]:
            from cora_tpu.ops.pallas_tcg import KernelCompileError
            from cora_tpu.solve.tnt_tiles import (
                get_kernel_backend,
                tnt_solve_tiles,
            )

            backend, reason = get_kernel_backend(
                problem, pd, int(X.shape[1]), config.tnt,
                max_cond=config.reg_chol_max_cond,
                interpret=kernel_interpret,
            )
            if backend is not None:
                plan_r, kern = backend
                kw.pop("log_iterates", None)
                try:
                    return tnt_solve_tiles(plan_r, kern, X, config.tnt, **kw)
                except KernelCompileError as e:
                    # the VMEM estimate passed but Mosaic rejected the
                    # kernel — restart this solve on the XLA path and
                    # stop retrying the kernel for this staircase
                    kernel_disabled[0] = True
                    vprint(f"[pallas] kernel compile failed, using XLA "
                           f"path: {e}")
            elif reason not in _kernel_fallback_reported:
                _kernel_fallback_reported.add(reason)
                vprint(f"[pallas] falling back to XLA path: {reason}")
        return tnt_solve(
            pd, X, precon, config.tnt, op=solver_op,
            log_iterates=config.log_iterates, **kw,
        )

    timer = PhaseTimer()
    grad_norm_f64 = float("nan")
    # tr(Q): calibrates the ramp-lift column so its objective energy is a
    # fixed small fraction of the current cost (host, cached sparse Q)
    trace_q = float(problem.data_matrix().diagonal().sum())

    def _polish(Y_explicit, label="polish_f64"):
        """Host float64 polish of the translation-explicit state; returns
        (Y_polished_f64, f_f64, grad_norm_f64) or None when disabled."""
        if not config.polish:
            return None
        from cora_tpu.solve.polish import polish_solution

        with timer(label):
            pres = polish_solution(
                problem, pd, np.asarray(Y_explicit),
                grad_tol=config.polish_grad_tol,
                time_budget=config.polish_time_budget,
            )
        vprint(
            f"[t={time.time()-t_start:7.2f}s] f64 polish: f {pres.f:.6f}, "
            f"|grad| {pres.grad_norm:.2e} ({pres.iterations} its, "
            f"{pres.status})"
        )
        return pres

    ramp_budget = config.max_staircase_iterations or config.tnt.max_iterations
    while rank <= max_rank:
        ranks_visited.append(rank)
        vprint(f"\n[t={time.time()-t_start:7.2f}s] Solving problem at rank {rank}")
        # one device dispatch per level: the cheap-tCG ramp, the
        # far-from-critical exit test and the full-budget finish all run
        # inside the TNT while_loop (see tnt_solve's ramp mode)
        with timer("tnt_level"):
            result = run_tnt(
                X,
                ramp_iterations=ramp_budget,
                ramp_tcg=config.ramp_tcg_iterations,
                lift_grad_norm=(
                    config.lift_grad_norm
                    if rank < max_rank
                    else float("inf")  # final level: finish best-effort
                ),
                stall_window=config.ramp_stall_window,
                stall_tol=config.ramp_stall_tol,
            )
        if all_iterates is not None and result.iterates:
            all_iterates.extend(result.iterates)
        vprint(
            f"Obtained solution with objective {result.f:.6f} "
            f"(|grad| {result.gradfx_norm:.2e}, {result.num_iterations} its, "
            f"{result.elapsed_time:.2f}s, {result.status})"
        )

        # ANY level that ends far from criticality (host time/iteration
        # caps, float32 stalls, trust-region collapse at a bad basin) is
        # the same situation as an in-loop ramp_exit: no certificate to
        # check, no saddle to escape — lift instead of certifying a
        # meaningless point
        capped_far = result.gradfx_norm > config.lift_grad_norm
        if (result.status == "ramp_exit" or capped_far) and rank < max_rank:
            # ramp level: nowhere near a critical point — no certificate
            # to check, no saddle to escape (see module docstring)
            rank += 1
            save_ckpt(result.x, rank)
            # column scaled so E[colᵀQ col] ≈ lift_rel_energy · 2f — the
            # perturbation can't regress the objective by more than ~1%
            scale = float(
                np.sqrt(
                    config.lift_rel_energy * 2.0 * max(result.f, 1e-12)
                    / max(trace_q, 1e-12)
                )
            )
            with timer("lift"):
                X = _lift_random(
                    pd, result.x,
                    jax.random.PRNGKey(config.seed * 1000 + rank),
                    jnp.asarray(scale, result.x.dtype),
                )
            vprint(f"[t={time.time()-t_start:7.2f}s] ramp level: lifted to "
                   f"rank {rank} (column scale {scale:.2e})")
            continue

        Y_explicit = to_explicit(result.x)
        # near-critical points of the rank-r relaxation collapse to the
        # SDP rank: trim numerically-dead columns (Y ↦ UΣ keeps
        # X = YYᵀ and hence Λ/S; reference exploits the same rank
        # deficiency at `CORA_problem.cpp:1036-1049`) so the polish
        # works in a space without excess gauge degeneracy
        if result.gradfx_norm <= config.lift_grad_norm:
            Y_trim = _trim_rank(np.asarray(Y_explicit), problem.dim)
            if Y_trim.shape[1] < Y_explicit.shape[1]:
                vprint(
                    f"[t={time.time()-t_start:7.2f}s] trimmed solution rank "
                    f"{Y_explicit.shape[1]} → {Y_trim.shape[1]}"
                )
                Y_explicit = Y_trim
                result.x = jnp.asarray(
                    Y_trim[:state_height] if implicit else Y_trim,
                    dtype=config.dtype,
                )
                rank = Y_trim.shape[1]

        near_critical = result.gradfx_norm <= config.lift_grad_norm
        if first_loop:
            eigvec_bootstrap = np.asarray(Y_explicit)
            first_loop = False
        elif cert is not None:
            eigvec_bootstrap = cert.all_eigvecs

        # Pre-certification at the float32 point (round 4, host-off-the-
        # critical-path): the exact banded-Cholesky PSD decision costs
        # ~0.1 s where the float64 polish costs 0.2-1.3 s. A NOT-PSD
        # verdict at the unpolished point already carries the escape
        # eigenvector, so failed levels skip the polish entirely; only a
        # level whose certificate looks PSD pays the polish, and its
        # certificate is then re-verified at the polished (rigorously
        # stationary) point. Soundness is unchanged — nothing certifies
        # without the polished re-verification.
        pres = None
        cert_final = None
        f_current = result.f
        eta = _clamp(f_current * cert_p.rel_eta, cert_p.min_eta, cert_p.max_eta)
        if near_critical:
            if config.polish:
                t_c = time.time()
                with timer("certify"):
                    pre = _certify_with_retry(
                        problem, pd, Y_explicit, eta, cert_p, eigvec_bootstrap
                    )
                vprint(
                    f"[t={time.time()-t_start:7.2f}s] Pre-certificate "
                    f"(f32 point): {pre.is_certified} (eta={eta:.2e}, "
                    f"theta={pre.theta:.3e}, {time.time()-t_c:.2f}s)"
                )
                if np.isnan(pre.theta):
                    raise RuntimeError("certification produced NaN theta")
                if pre.is_certified:
                    pres = _polish(Y_explicit)
                elif abs(pre.theta) <= 10.0 * result.gradfx_norm:
                    # marginal NOT-PSD verdict: at the unpolished float32
                    # point the Λ(Y) blocks carry O(|grad|) error, so a
                    # barely-negative θ can be a residual artifact rather
                    # than a real saddle (advisor r4) — polish to a
                    # rigorously stationary point and let the full
                    # re-certification below decide
                    vprint(
                        f"[t={time.time()-t_start:7.2f}s] pre-certificate "
                        f"marginal (|theta| {abs(pre.theta):.2e} ≲ |grad| "
                        f"{result.gradfx_norm:.2e}) — polishing before the "
                        f"final verdict"
                    )
                    pres = _polish(Y_explicit)
                else:
                    cert_final = pre
            else:
                pass  # certify the raw point below
        else:
            # forced finish at max_rank far from criticality (lower ranks
            # ramp-lift above): S = Q − Λ(Y) carries no optimality
            # information at a non-critical point — do NOT issue a
            # certificate (the reference hard-errors on the equivalent
            # NaN-θ state, `src/CORA.cpp:180-182`)
            vprint(
                f"[t={time.time()-t_start:7.2f}s] level at rank {rank} ended "
                f"far from criticality (|grad| {result.gradfx_norm:.2e}) — "
                f"certificate skipped"
            )
            cert_final = CertResults(
                is_certified=False, theta=float("-inf"), x=np.zeros(pd.size),
                all_eigvecs=np.zeros((pd.size, cert_p.lobpcg_block_size)),
                num_iters=0,
            )

        if pres is not None:
            grad_norm_f64 = pres.grad_norm
            Y_explicit = pres.Y  # float64 host state
            f_current = pres.f
            # fold the polished point back into the device state
            if implicit:
                X_pol = jnp.asarray(
                    pres.Y[:state_height], dtype=config.dtype
                )
            else:
                X_pol = jnp.asarray(pres.Y, dtype=config.dtype)
            result.x = X_pol
            result.f = pres.f

        if cert_final is None:
            eta = _clamp(
                f_current * cert_p.rel_eta, cert_p.min_eta, cert_p.max_eta)
            t_c = time.time()
            with timer("certify"):
                cert = _certify_with_retry(
                    problem, pd, Y_explicit, eta, cert_p, eigvec_bootstrap
                )
            vprint(
                f"[t={time.time()-t_start:7.2f}s] Certified: "
                f"{cert.is_certified} (eta={eta:.2e}, theta={cert.theta:.3e}, "
                f"{cert.num_iters} eig iters, cert took {time.time()-t_c:.2f}s)"
            )
            if np.isnan(cert.theta):
                raise RuntimeError("certification produced NaN theta")
        else:
            cert = cert_final

        if cert.is_certified:
            X = result.x
            sdp_cost = f_current
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
        with timer("saddle_escape"):
            X = None
            if kernel_eligible and not kernel_disabled[0]:
                from cora_tpu.ops.pallas_tcg import KernelCompileError
                from cora_tpu.solve.tnt_tiles import (
                    get_kernel_backend,
                    saddle_escape_tiles,
                )

                backend, _ = get_kernel_backend(
                    problem, pd, int(result.x.shape[1]) + 1, config.tnt,
                    max_cond=config.reg_chol_max_cond,
                    interpret=kernel_interpret,
                )
                if backend is not None:
                    try:
                        X = saddle_escape_tiles(
                            backend[0], backend[1], result.x, cert.theta, v,
                            SADDLE_GRAD_TOL, PRECON_SADDLE_GRAD_TOL,
                            verbose=verbose,
                        )
                    except Exception as e:  # noqa: BLE001 — Mosaic reject
                        kernel_disabled[0] = True
                        vprint(f"[pallas] ladder kernel failed, using XLA "
                               f"escape: {e}")
            if X is None:
                X = saddle_escape(
                    pd, result.x, cert.theta, v, precon,
                    SADDLE_GRAD_TOL, PRECON_SADDLE_GRAD_TOL, verbose=verbose,
                    op=solver_op,
                )
        vprint(f"[t={time.time()-t_start:7.2f}s] saddle escape took "
               f"{time.time()-t_e:.2f}s")

    sdp_certified = bool(cert.is_certified) if cert is not None else False

    # ---- rank-d rounding + refinement (`CORA.cpp:200-233`) ----
    final_cert = cert
    if X.shape[1] > problem.dim:
        vprint(f"\nProjecting solution to rank {problem.dim} and refining")
        with timer("rounding"):
            X = project_solution(pd, X, verbose=verbose)
        with timer("tnt_refine"):
            result = run_tnt(X)
        if all_iterates is not None and result.iterates:
            all_iterates.extend(result.iterates)
        if all_iterates is not None:
            result.iterates = all_iterates
        Y_final = to_explicit(result.x)
        pres = _polish(Y_final, label="polish_final")
        if pres is not None:
            Y_final = pres.Y
            result.f = pres.f
            result.x = jnp.asarray(
                pres.Y[:state_height] if implicit else pres.Y,
                dtype=config.dtype,
            )
        vprint(f"FINAL objective {result.f:.6f}")
        eta = _clamp(result.f * cert_p.rel_eta, cert_p.min_eta, cert_p.max_eta)
        with timer("certify"):
            final_cert = _certify_with_retry(
                problem, pd, Y_final, eta, cert_p, eigvec_bootstrap
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
    if verbose:
        print("\nPhase breakdown:\n" + timer.report())
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
        grad_norm_f64=float(grad_norm_f64),
        phases=dict(timer.totals),
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
    """NaN-θ retry loop (reference `CORA_problem.cpp:1076-1083`).

    method="auto": the PSD decision is the exact float64 banded Cholesky
    wherever the graph permits (host-cascade rigor); only the escape
    eigenvector comes from the fast on-device LOBPCG."""
    cert = certify_solution(
        problem, pd, Y, eta,
        nx=cert_p.lobpcg_block_size,
        eigvec_bootstrap=bootstrap,
        max_lobpcg_iters=cert_p.max_lobpcg_iters,
        method="auto",
        escape_eig_iters=cert_p.escape_eig_iters,
    )
    retries = 0
    while np.isnan(cert.theta) and retries < 20:
        eta *= 2
        cert = certify_solution(
            problem, pd, Y, eta,
            nx=cert_p.lobpcg_block_size,
            eigvec_bootstrap=bootstrap,
            max_lobpcg_iters=cert_p.max_lobpcg_iters,
            method="auto",
            escape_eig_iters=cert_p.escape_eig_iters,
        )
        retries += 1
    return cert
