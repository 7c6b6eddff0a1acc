"""Operator tests against the reference's golden fixtures
(reference `tests/test_optimizer_helpers.cpp`): cost, Euclidean gradient,
Riemannian gradient and Hessian-vector product on fixed random states,
plus consistency of the factored Q-operator with the assembled Q."""

import jax.numpy as jnp
import numpy as np
import pytest

from cora_tpu import parse_pyfg
from cora_tpu.io.matrix_market import read_matrix_market_dense
from cora_tpu.ops.quadratic import (
    data_matrix_product,
    evaluate_objective,
    euclidean_gradient,
    jacobi_diagonal,
)
from cora_tpu.ops.riemannian import riemannian_gradient, riemannian_hvp

PROBLEMS = ["single_rpm", "single_range", "small_ra_slam_problem"]
EXPECTED_COST = {
    "small_ra_slam_problem": 1.063888372855624e03,
    "single_rpm": 0.809173848024762,
    "single_range": 4.718031199983851,
}


def _load(fixtures_dir, subdir):
    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    pd = problem.device_data()
    x0 = read_matrix_market_dense(str(fixtures_dir / subdir / "X_rand_dim2.mm"))
    return problem, pd, jnp.asarray(x0)


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_cost_matches_fixture(fixtures_dir, subdir):
    _, pd, x0 = _load(fixtures_dir, subdir)
    cost = float(evaluate_objective(pd, x0))
    assert abs(cost - EXPECTED_COST[subdir]) < 1e-6


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_egrad_matches_fixture(fixtures_dir, subdir):
    _, pd, x0 = _load(fixtures_dir, subdir)
    egrad = np.asarray(euclidean_gradient(pd, x0))
    expected = read_matrix_market_dense(str(fixtures_dir / subdir / "expected_egrad.mm"))
    np.testing.assert_allclose(egrad, expected, atol=1e-6)


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_rgrad_matches_fixture(fixtures_dir, subdir):
    _, pd, x0 = _load(fixtures_dir, subdir)
    rgrad = np.asarray(riemannian_gradient(pd, x0))
    expected = read_matrix_market_dense(str(fixtures_dir / subdir / "expected_rgrad.mm"))
    np.testing.assert_allclose(rgrad, expected, atol=1e-6)


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_hvp_matches_fixture(fixtures_dir, subdir):
    _, pd, x0 = _load(fixtures_dir, subdir)
    egrad = euclidean_gradient(pd, x0)
    dX = jnp.asarray(
        read_matrix_market_dense(str(fixtures_dir / subdir / "rand_dX.mm"))
    )
    hvp = np.asarray(riemannian_hvp(pd, x0, egrad, dX))
    expected = read_matrix_market_dense(str(fixtures_dir / subdir / "hessProd.mm"))
    np.testing.assert_allclose(hvp, expected, atol=1e-6)


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_factored_operator_matches_assembled_Q(fixtures_dir, subdir):
    problem, pd, _ = _load(fixtures_dir, subdir)
    Q = problem.data_matrix()
    rng = np.random.default_rng(7)
    Y = rng.normal(size=(Q.shape[0], 5))
    np.testing.assert_allclose(
        np.asarray(data_matrix_product(pd, jnp.asarray(Y))), Q @ Y, atol=1e-9
    )


@pytest.mark.parametrize("name", ["plaza2.pyfg", "single_drone.pyfg", "tiers.pyfg"])
def test_factored_operator_on_benchmarks(datasets_dir, name):
    """The chain fast path must agree with the assembled Q on real datasets."""
    problem = parse_pyfg(str(datasets_dir / name))
    pd = problem.device_data()
    Q = problem.data_matrix()
    rng = np.random.default_rng(11)
    Y = rng.normal(size=(Q.shape[0], 4))
    got = np.asarray(data_matrix_product(pd, jnp.asarray(Y)))
    want = Q @ Y
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-9 * max(scale, 1.0))


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_jacobi_diagonal(fixtures_dir, subdir):
    problem, pd, _ = _load(fixtures_dir, subdir)
    Q = problem.data_matrix()
    np.testing.assert_allclose(
        np.asarray(jacobi_diagonal(pd)), Q.diagonal(), atol=1e-9
    )
