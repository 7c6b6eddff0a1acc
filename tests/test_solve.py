"""End-to-end staircase solve tests (reference `tests/test_cora.cpp` plus
certification unit tests from `tests/test_certification.cpp`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cora_tpu import parse_pyfg, solve_cora
from cora_tpu.ops.lobpcg import lobpcg_min
from cora_tpu.solve.certify import certify_solution, materialize_certificate
from cora_tpu.types import Preconditioner, SolverConfig

PROBLEMS = ["single_rpm", "single_range", "small_ra_slam_problem"]


@pytest.mark.parametrize("subdir", PROBLEMS)
@pytest.mark.parametrize(
    "precon", [Preconditioner.JACOBI, Preconditioner.REGULARIZED_CHOLESKY]
)
def test_solve_fixture_certified(fixtures_dir, subdir, precon):
    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    cfg = SolverConfig(preconditioner=precon, seed=3)
    res = solve_cora(problem, config=cfg)
    assert res.certified
    # all fixtures are noiseless: the certified optimum has zero cost
    assert res.result.f < 1e-6
    assert res.result.x.shape == (problem.data_matrix_size, problem.dim)


def test_device_cert_matches_host_verdicts(fixtures_dir):
    """The all-device LOBPCG cascade (banded stage-2 preconditioner, the
    ILDL analog of `CORA_utils.cpp:128-176`) must reach the same verdicts
    as the host float64 cascade: certified at the optimum, uncertified
    with a usable negative-curvature eigvec at a suboptimal point."""
    problem = parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )
    pd = problem.device_data()
    cfg = SolverConfig(seed=3)
    res = solve_cora(problem, config=cfg)
    assert res.certified
    Y_opt = jnp.asarray(res.result.x)
    eta = max(res.result.f * 1e-6, 1e-7)

    # PSD at the optimum: both methods certify
    for method in ("host", "device"):
        cert = certify_solution(problem, pd, Y_opt, eta, method=method)
        assert cert.is_certified, method

    # suboptimal first-order-critical-ish point: neither certifies, and
    # the device path's eigvec carries real negative curvature
    rng = np.random.default_rng(0)
    Y_bad = jnp.asarray(rng.standard_normal(Y_opt.shape))
    from cora_tpu.ops.riemannian import project_to_manifold

    Y_bad = project_to_manifold(pd, Y_bad)
    host = certify_solution(problem, pd, Y_bad, eta, method="host")
    dev = certify_solution(
        problem, pd, Y_bad, eta, method="device", max_lobpcg_iters=300
    )
    assert not host.is_certified and not dev.is_certified
    from cora_tpu.solve.certify import materialize_certificate

    S = materialize_certificate(problem, pd, Y_bad)
    x = dev.x / np.linalg.norm(dev.x)
    rayleigh = float(x @ (S @ x))
    assert rayleigh < 0  # genuine negative-curvature direction


def test_certificate_zero_lambda_at_ground_truth(fixtures_dir):
    """At the noiseless ground truth, Λ = 0 and S = Q
    (reference `test_certification.cpp`)."""
    from cora_tpu.io.matrix_market import read_matrix_market_dense
    from cora_tpu.solve.certify import compute_lambda_blocks

    subdir = "small_ra_slam_problem"
    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    pd = problem.device_data()
    X_gt = jnp.asarray(
        read_matrix_market_dense(str(fixtures_dir / subdir / "X_gt.mm"))
    )
    Lam_rot, lam_sph = compute_lambda_blocks(pd, X_gt)
    np.testing.assert_allclose(np.asarray(Lam_rot), 0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lam_sph), 0, atol=1e-6)


def test_certificate_matrix_matches_fixture(fixtures_dir):
    """S at the fixed random state matches the exported S_rand.mm."""
    from cora_tpu.io.matrix_market import (
        read_matrix_market,
        read_matrix_market_dense,
    )

    subdir = "small_ra_slam_problem"
    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    pd = problem.device_data()
    x0 = read_matrix_market_dense(str(fixtures_dir / subdir / "X_rand_dim2.mm"))
    S = materialize_certificate(problem, pd, x0)
    expected = read_matrix_market(str(fixtures_dir / subdir / "S_rand.mm")).toarray()
    np.testing.assert_allclose(S, expected, atol=1e-6)


@pytest.mark.parametrize("n", [10, 1000])
def test_lobpcg_known_eigenpairs(n):
    """Analytic min-eigenpair cases I − x xᵀ and I − 2 x xᵀ at sizes that
    exercise both the dense and iterative branches
    (reference `test_certification.cpp:45-125`)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    x /= np.linalg.norm(x)
    for scale, expected_min in [(1.0, 0.0), (2.0, -1.0)]:
        xj = jnp.asarray(x)

        def op(V, s=scale):
            return V - s * jnp.outer(xj, xj @ V)

        X0 = jnp.asarray(rng.standard_normal((n, 6)))
        theta, X, iters, nc = lobpcg_min(op, X0, max_iters=200, tol=1e-8, nev=1)
        assert abs(float(theta[0]) - expected_min) < 1e-6
        # eigenvector equality up to sign
        v = np.asarray(X[:, 0])
        align = abs(float(v @ x))
        if expected_min != 0.0:
            assert align > 1 - 1e-6


def test_certify_rejects_saddle(fixtures_dir):
    """The rank-2 saddle of small_ra must NOT be certified."""
    from cora_tpu.ops.riemannian import random_initial_guess
    from cora_tpu.precond import make_preconditioner
    from cora_tpu.solve.tnt import tnt_solve

    problem = parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )
    pd = problem.device_data()
    Y0 = random_initial_guess(pd, 2, jax.random.PRNGKey(42))
    prec = make_preconditioner(problem, pd, Preconditioner.JACOBI)
    res = tnt_solve(pd, Y0, prec)
    assert res.f > 1.0  # stuck on a saddle at rank 2
    cert = certify_solution(problem, pd, res.x, eta=1e-5)
    assert not cert.is_certified
    assert cert.theta < -1e-3


def test_block_cholesky_preconditioner_matches_dense(fixtures_dir):
    """BlockCholesky = blockdiag(Q+1e-3·I per variable type)⁻¹ — the
    reference's per-variable-type factorization
    (`src/CORA_problem.cpp:513-543`), NOT an alias of
    RegularizedCholesky."""
    from cora_tpu.precond import make_preconditioner

    problem = parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )
    pd = problem.device_data()
    prec = make_preconditioner(problem, pd, Preconditioner.BLOCK_CHOLESKY)

    Q = problem.data_matrix().toarray()
    N = pd.size
    nd, ndm = pd.rot_size, pd.rot_size + pd.m
    M = np.zeros_like(Q)
    for lo, hi in ((0, nd), (nd, ndm), (ndm, N)):
        M[lo:hi, lo:hi] = Q[lo:hi, lo:hi]
    M += 1e-3 * np.eye(N)

    rng = np.random.default_rng(0)
    V = rng.standard_normal((N, 3))
    expected = np.linalg.solve(M, V)
    got = np.asarray(prec(jnp.asarray(V)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-8)

    # and it differs from the RegularizedCholesky apply
    reg = make_preconditioner(
        problem, pd, Preconditioner.REGULARIZED_CHOLESKY
    )
    assert not np.allclose(np.asarray(reg(jnp.asarray(V))), got)


def test_mrclam_inter_robot_certified_solve(datasets_dir):
    """mrclam5a end-to-end: multi-robot graph with inter-robot ranges —
    the structure the banded band and the tile-kernel plan do NOT cover,
    so this exercises the general-graph fallbacks (reference experiment
    grid, `examples/paper_experiments.cpp:708-732`)."""
    path = (datasets_dir / "mrclam" / "range_and_rpm" / "mrclam5a"
            / "mrclam5a.pyfg")
    if not path.exists():
        pytest.skip("mrclam5a not in reference snapshot")
    problem = parse_pyfg(str(path))
    pd = problem.device_data(dtype=np.float32)
    assert pd.n == 1080 and pd.m == 316 and pd.d == 2
    res = solve_cora(problem, config=SolverConfig(
        dtype=np.float32, max_staircase_iterations=60,
        ramp_tcg_iterations=24))
    assert res.certified
    assert res.result.f == pytest.approx(69.10, abs=0.5)
