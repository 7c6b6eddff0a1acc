"""Tile-layout math (`cora_tpu.ops.tiles`) vs the canonical operators.

The fused Pallas tCG kernel runs entirely on the pose-pair tile layout;
these tests pin every tile operation against the canonical (N, r)
implementations on synthetic chain problems (2D with landmarks + ranges,
3D) — the same family as every reference dataset.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cora_tpu.models.synthetic import synthetic_problem  # noqa: E402
from cora_tpu.ops import tiles as T  # noqa: E402
from cora_tpu.ops.quadratic import data_matrix_product  # noqa: E402
from cora_tpu.ops.riemannian import (  # noqa: E402
    project_to_manifold,
    random_initial_guess,
    riemannian_hvp,
    tangent_space_projection,
)
from cora_tpu.precond.banded import banded_apply, device_factor, factor_banded  # noqa: E402


def _setup(dim=2, n=37, n_landmarks=3, n_ranges=29, rank=3, seed=1):
    problem = synthetic_problem(
        n_poses=n, n_landmarks=n_landmarks, n_ranges=n_ranges, dim=dim,
        seed=seed,
    )
    pd = problem.device_data(dtype=np.float64)
    plan = T.build_tile_plan(problem, pd, rank, dtype=np.float64)
    ops = T.make_host_ops(plan)
    key = jax.random.PRNGKey(seed)
    Y = random_initial_guess(pd, rank, key)
    k2 = jax.random.PRNGKey(seed + 100)
    V = jax.random.normal(k2, Y.shape, Y.dtype)
    return problem, pd, plan, ops, Y, V


@pytest.mark.parametrize("dim,rank", [(2, 3), (3, 4), (2, 2)])
def test_roundtrip(dim, rank):
    problem, pd, plan, ops, Y, V = _setup(dim=dim, rank=rank)
    tiles = T.to_tiles(plan, Y)
    back = T.from_tiles(plan, *tiles)
    np.testing.assert_allclose(np.asarray(back), np.asarray(Y), rtol=0, atol=0)


@pytest.mark.parametrize("dim,rank,n", [(2, 3, 37), (3, 4, 16), (2, 4, 8)])
def test_qv_matches_data_matrix_product(dim, rank, n):
    problem, pd, plan, ops, Y, V = _setup(dim=dim, rank=rank, n=n)
    ref = data_matrix_product(pd, V)
    out = T.from_tiles(plan, *ops.qv(*T.to_tiles(plan, V)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


def test_dot_matches():
    problem, pd, plan, ops, Y, V = _setup()
    a = ops.dot(T.to_tiles(plan, Y), T.to_tiles(plan, V))
    np.testing.assert_allclose(float(a), float(jnp.vdot(Y, V)), rtol=1e-12)


@pytest.mark.parametrize("dim,rank", [(2, 3), (3, 4)])
def test_tangent_project_matches(dim, rank):
    problem, pd, plan, ops, Y, V = _setup(dim=dim, rank=rank)
    ref = tangent_space_projection(pd, Y, V)
    out = T.from_tiles(
        plan, *ops.tangent_project(T.to_tiles(plan, Y), T.to_tiles(plan, V)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("dim,rank", [(2, 3), (3, 4)])
def test_hvp_matches(dim, rank):
    problem, pd, plan, ops, Y, V = _setup(dim=dim, rank=rank)
    nablaF = data_matrix_product(pd, Y)
    Vt = tangent_space_projection(pd, Y, V)  # Hessian acts on tangent vectors
    ref = riemannian_hvp(pd, Y, nablaF, Vt)
    out = T.from_tiles(plan, *ops.hvp(
        T.to_tiles(plan, Y), T.to_tiles(plan, nablaF), T.to_tiles(plan, Vt)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-11)


@pytest.mark.parametrize("dim,rank,n", [(2, 3, 37), (3, 4, 16), (2, 3, 300)])
def test_precon_solve_matches_banded_apply(dim, rank, n):
    problem, pd, plan, ops, Y, V = _setup(dim=dim, rank=rank, n=n)
    F = factor_banded(None, pd, problem.data_matrix(), plan.lam,
                      order=np.arange(pd.n, dtype=np.int64))
    fac = device_factor(pd, F, dtype=np.float64)
    ref = banded_apply(pd, fac, V)
    out = T.from_tiles(plan, *ops.precon_solve(T.to_tiles(plan, V)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-9, atol=1e-9)
    # and it actually solves (Q + lam I) x = V
    Q = problem.data_matrix()
    x = np.asarray(out)
    resid = Q @ x + plan.lam * x - np.asarray(V)
    assert np.abs(resid).max() < 1e-7


@pytest.mark.parametrize("dim,rank", [(2, 3), (3, 4)])
def test_project_manifold_matches(dim, rank):
    problem, pd, plan, ops, Y, V = _setup(dim=dim, rank=rank)
    A = Y + 0.1 * V
    ref = project_to_manifold(pd, A)
    out = T.from_tiles(plan, *ops.project_manifold(T.to_tiles(plan, A)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-9, atol=1e-9)


def test_plan_supported_rejects_non_chain():
    problem = synthetic_problem(n_poses=10, n_landmarks=1, n_ranges=5, seed=0)
    pd = problem.device_data()
    assert T.plan_supported(pd) is None
    # break the chain: a loop-closure edge 0 -> 5
    from cora_tpu.measurements import RelativePoseMeasurement
    from cora_tpu.symbol import Symbol

    problem.add_relative_pose_measurement(RelativePoseMeasurement(
        Symbol("a", 0), Symbol("a", 5), np.eye(2), np.zeros(2), np.eye(3),
    ))
    pd2 = problem.device_data()
    assert T.plan_supported(pd2) is not None
