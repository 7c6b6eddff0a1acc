"""Host float64 polish: numpy calculus matches the jax ops; polish
drives the gradient to the tolerance on a real problem."""

import numpy as np
import pytest

from cora_tpu import parse_pyfg
from cora_tpu.solve import polish as pl


@pytest.fixture(scope="module")
def problem(fixtures_dir):
    return parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )


def test_numpy_calculus_matches_jax(problem):
    import jax

    from cora_tpu.ops import riemannian as rm
    from cora_tpu.ops.quadratic import data_matrix_product

    pd = problem.device_data(dtype=np.float64)
    Q = problem.data_matrix()
    rng = np.random.default_rng(0)
    A = rng.standard_normal((pd.size, 3))
    Y = pl.project_to_manifold(pd, A)
    V = rng.standard_normal((pd.size, 3))

    # manifold projection agrees
    Yj = np.asarray(rm.project_to_manifold(pd, jax.numpy.asarray(A)))
    np.testing.assert_allclose(Y, Yj, atol=1e-10)

    # tangent projection agrees
    Pj = np.asarray(
        rm.tangent_space_projection(
            pd, jax.numpy.asarray(Y), jax.numpy.asarray(V)
        )
    )
    np.testing.assert_allclose(pl.tangent_project(pd, Y, V), Pj, atol=1e-10)

    # Hessian-vector product agrees
    nablaF = Q @ Y
    Hj = np.asarray(
        rm.riemannian_hvp(
            pd,
            jax.numpy.asarray(Y),
            data_matrix_product(pd, jax.numpy.asarray(Y)),
            jax.numpy.asarray(V),
        )
    )
    np.testing.assert_allclose(
        pl.hessian_vector_product(pd, Q, Y, nablaF, V), Hj, atol=1e-8
    )


def test_polish_reaches_gradient_tolerance(problem):
    """From a float32 stall point (the real handoff), polish reaches
    |grad| ≤ 1e-6 in float64."""
    import jax

    from cora_tpu.ops.riemannian import random_initial_guess
    from cora_tpu.solve.tnt import tnt_solve
    from cora_tpu.types import Preconditioner

    pd32 = problem.device_data(dtype=np.float32)
    Y0 = random_initial_guess(pd32, 3, jax.random.PRNGKey(1))
    precon = problem.preconditioner_fn(
        Preconditioner.REGULARIZED_CHOLESKY, dtype=np.float32
    )
    coarse = tnt_solve(pd32, Y0, precon)  # runs to the f32 floor

    pd = problem.device_data(dtype=np.float64)
    res = pl.polish_solution(problem, pd, np.asarray(coarse.x),
                             grad_tol=1e-6)
    assert res.grad_norm <= 1e-6, (res.status, res.grad_norm)
    # the scale-invariant default tolerance is also reached
    res_default = pl.polish_solution(problem, pd, np.asarray(coarse.x))
    assert res_default.grad_norm <= 1e-6 * max(1.0, pl._q_norm(problem))
    assert res.f <= coarse.f + 1e-9
    # stays on the manifold
    Yrot = res.Y[: pd.rot_size].reshape(pd.n, pd.d, -1)
    eye = np.einsum("nir,njr->nij", Yrot, Yrot)
    np.testing.assert_allclose(
        eye, np.broadcast_to(np.eye(pd.d), eye.shape), atol=1e-12
    )
