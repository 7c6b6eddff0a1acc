"""Exporters, odometry initialization, and evaluation tests."""

import numpy as np
import pytest

from cora_tpu import parse_pyfg
from cora_tpu.models.init import get_odom_chains, odometry_initialization
from cora_tpu.models.synthetic import synthetic_problem
from cora_tpu.utils.evaluation import ate_rmse, evaluate_ate, umeyama_alignment


def test_odometry_init_on_manifold(fixtures_dir):
    import jax.numpy as jnp

    from cora_tpu.ops.quadratic import evaluate_objective
    from cora_tpu.ops.riemannian import project_to_manifold

    problem = parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )
    pd = problem.device_data()
    x0 = odometry_initialization(problem, rank=3, seed=0)
    assert x0.shape == (problem.data_matrix_size, 3)

    # rotation blocks should already be on the manifold (dead-reckoned SO(d))
    x0j = jnp.asarray(x0)
    proj = np.asarray(project_to_manifold(pd, x0j))
    np.testing.assert_allclose(proj, x0, atol=1e-8)

    # noiseless fixture: the odometry terms are exactly consistent, so the
    # cost is entirely range residuals against the randomized landmark
    # (reference randomizes landmarks, `paper_experiments.cpp:476-487`) —
    # far below a random initialization
    from cora_tpu.ops.riemannian import random_initial_guess
    import jax

    f_odom = float(evaluate_objective(pd, x0j))
    f_rand = float(
        evaluate_objective(pd, random_initial_guess(pd, 3, jax.random.PRNGKey(0)))
    )
    assert f_odom < f_rand


def test_odometry_chains(fixtures_dir):
    problem = parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )
    chains = get_odom_chains(problem)
    assert len(chains) == 1
    assert len(chains[0]) == problem.num_poses - 1


def test_odometry_init_beats_random_cost(datasets_dir):
    import jax.numpy as jnp

    from cora_tpu.ops.quadratic import evaluate_objective

    problem = parse_pyfg(str(datasets_dir / "plaza2.pyfg"))
    pd = problem.device_data()
    x0 = odometry_initialization(problem, rank=2, seed=0)
    f_odom = float(evaluate_objective(pd, jnp.asarray(x0)))
    assert f_odom < 1e7  # random init is ~9e7 on plaza2; odom ~2.8e6


def test_umeyama_exact_recovery():
    rng = np.random.default_rng(0)
    X = rng.standard_normal((50, 3))
    A = rng.standard_normal((3, 3))
    U, _, Vt = np.linalg.svd(A)
    R_true = U @ Vt
    if np.linalg.det(R_true) < 0:
        U[:, -1] *= -1
        R_true = U @ Vt
    t_true = rng.standard_normal(3)
    Y = X @ R_true.T + t_true
    R, t, s = umeyama_alignment(X, Y)
    np.testing.assert_allclose(R, R_true, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-10)
    assert ate_rmse(X, Y) < 1e-10


def test_exporters_roundtrip(tmp_path, fixtures_dir):
    import jax

    from cora_tpu.io.exporters import save_solution
    from cora_tpu.ops.riemannian import random_initial_guess
    from cora_tpu.solve.rounding import project_solution

    problem = parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )
    pd = problem.device_data()
    Y = project_solution(pd, random_initial_guess(pd, 3, jax.random.PRNGKey(0)))
    tum = tmp_path / "out.tum"
    save_solution(problem, np.asarray(Y), str(tum), fmt="tum")
    lines = tum.read_text().strip().splitlines()
    assert len(lines) == problem.num_poses
    assert all(len(line.split()) == 8 for line in lines)

    g2o = tmp_path / "out.g2o"
    save_solution(problem, np.asarray(Y), str(g2o), fmt="g2o")
    lines = g2o.read_text().strip().splitlines()
    assert all(line.startswith("VERTEX_SE2") for line in lines)


def test_synthetic_problem_gt_consistency():
    import jax.numpy as jnp

    from cora_tpu.ops.quadratic import evaluate_objective

    # noiseless synthetic: the GT state (exact poses, landmarks, and
    # range bearings with the null-space sign convention) has zero cost
    problem = synthetic_problem(
        n_poses=40, n_landmarks=2, n_ranges=20, noiseless=True, seed=0,
    )
    pd = problem.device_data()
    d = problem.dim
    X = np.zeros((problem.data_matrix_size, d))
    for sym, (R, t) in problem.pose_gt.items():
        i = problem.rotation_idx(sym)
        X[i * d:(i + 1) * d] = R.T
        X[problem.translation_idx(sym)] = t
    for sym, pos in problem.landmark_gt.items():
        X[problem.translation_idx(sym)] = pos
    for e, meas in enumerate(problem.range_measurements):
        diff = (
            X[problem.translation_idx(meas.first_id)]
            - X[problem.translation_idx(meas.second_id)]
        )
        X[problem.num_poses_dim + e] = diff / np.linalg.norm(diff)
    f = float(evaluate_objective(pd, jnp.asarray(X)))
    assert f < 1e-8
