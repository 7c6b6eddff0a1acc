"""Implicit (marginalized) formulation tests (reference
`dataMatrixProduct` implicit branch, `CORA_problem.cpp:742-757`,
and `getTranslationExplicitSolution`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cora_tpu import parse_pyfg, solve_cora
from cora_tpu.models.formulations import make_operator
from cora_tpu.types import Formulation, Preconditioner, SolverConfig

PROBLEMS = ["single_rpm", "small_ra_slam_problem"]


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_implicit_product_matches_dense_schur(fixtures_dir, subdir):
    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    pd = problem.device_data()
    op = make_operator(problem, pd, Formulation.IMPLICIT)
    Q = problem.data_matrix()
    k = pd.rot_range_size
    n_tr = pd.num_translations
    Qmain = Q[:k, :k]
    B = Q[:k, k:k + n_tr - 1]
    L = Q[k:k + n_tr - 1, k:k + n_tr - 1].toarray()

    rng = np.random.default_rng(0)
    Y = rng.standard_normal((k, 3))
    want = Qmain @ Y - B @ np.linalg.solve(L, B.T @ Y)
    got = np.asarray(op(jnp.asarray(Y)))
    np.testing.assert_allclose(got, want, atol=1e-9 * max(np.abs(want).max(), 1))


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_translation_recovery_stationarity(fixtures_dir, subdir):
    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    pd = problem.device_data()
    op = make_operator(problem, pd, Formulation.IMPLICIT)
    Q = problem.data_matrix()
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((pd.rot_range_size, 3))
    full = np.asarray(op.implicit.translation_explicit_solution(jnp.asarray(Y)))
    # translations minimize the quadratic given Y ⇒ translation rows of QX = 0
    grad = Q @ full
    assert np.abs(grad[pd.rot_range_size:]).max() < 1e-8
    # pinned (last) translation stays exactly zero
    assert np.abs(full[-1]).max() == 0.0


def test_implicit_solve_certifies(fixtures_dir):
    problem = parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )
    cfg = SolverConfig(
        formulation=Formulation.IMPLICIT,
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
        seed=3,
    )
    res = solve_cora(problem, config=cfg)
    assert res.certified
    assert res.result.f < 1e-6
    # implicit state has no translation rows
    assert res.result.x.shape[0] == problem.rot_and_range_matrix_size
