"""Manifold geometry property tests (reference `tests/test_geometry.cpp`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cora_tpu.ops import manifolds as mf

jax.config.update("jax_enable_x64", True)


@pytest.mark.parametrize("d,r,n", [(2, 2, 5), (2, 4, 7), (3, 3, 4), (3, 6, 11)])
def test_stiefel_projection_on_manifold(d, r, n):
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (n, d, r), dtype=jnp.float64)
    P = mf.stiefel_project(A)
    eye = jnp.broadcast_to(jnp.eye(d), (n, d, d))
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("ndr,ner->nde", P, P)), np.asarray(eye), atol=1e-8
    )


@pytest.mark.parametrize("d,r,n", [(2, 3, 5), (3, 5, 4)])
def test_stiefel_projection_matches_svd(d, r, n):
    """Polar-decomposition projection ≡ SVD projection U Vᵀ for full-rank A."""
    rng = np.random.default_rng(3)
    A = rng.normal(size=(n, d, r))
    P = np.asarray(mf.stiefel_project(jnp.asarray(A)))
    for i in range(n):
        U, _, Vt = np.linalg.svd(A[i], full_matrices=False)
        np.testing.assert_allclose(P[i], U @ Vt, atol=1e-9)


@pytest.mark.parametrize("d,r,n", [(2, 4, 6), (3, 5, 3)])
def test_stiefel_tangent_orthogonality(d, r, n):
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    Y = mf.stiefel_random(k1, n, d, r)
    V = jax.random.normal(k2, (n, d, r), dtype=jnp.float64)
    T = mf.stiefel_tangent_project(Y, V)
    # tangent condition: Y Tᵀ + T Yᵀ = 0 blockwise
    S = jnp.einsum("ndr,ner->nde", Y, T)
    np.testing.assert_allclose(
        np.asarray(S + jnp.swapaxes(S, -1, -2)), 0, atol=1e-10
    )
    # idempotency
    np.testing.assert_allclose(
        np.asarray(mf.stiefel_tangent_project(Y, T)), np.asarray(T), atol=1e-10
    )


def test_oblique_projection_and_tangent():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    Y = mf.oblique_random(k1, 9, 5)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(Y, axis=-1)), 1.0, atol=1e-12
    )
    V = jax.random.normal(k2, (9, 5), dtype=jnp.float64)
    T = mf.oblique_tangent_project(Y, V)
    np.testing.assert_allclose(np.asarray(jnp.sum(Y * T, axis=-1)), 0, atol=1e-12)


def test_retraction_stays_on_manifold():
    from cora_tpu import Problem
    from cora_tpu.measurements import RangeMeasurement, RelativePoseMeasurement
    from cora_tpu.ops.riemannian import (
        project_to_manifold,
        random_initial_guess,
        retract,
    )
    from cora_tpu.symbol import Symbol

    problem = Problem(dim=2, relaxation_rank=4)
    for i in range(3):
        problem.add_pose_variable(Symbol("a", i))
    problem.add_landmark_variable(Symbol("L", 0))
    problem.add_relative_pose_measurement(
        RelativePoseMeasurement(Symbol("a0"), Symbol("a1"), np.eye(2), [1, 0], np.eye(3))
    )
    problem.add_relative_pose_measurement(
        RelativePoseMeasurement(Symbol("a1"), Symbol("a2"), np.eye(2), [1, 0], np.eye(3))
    )
    problem.add_range_measurement(RangeMeasurement(Symbol("a0"), Symbol("L0"), 2.0, 1.0))
    pd = problem.device_data()

    key = jax.random.PRNGKey(5)
    Y = random_initial_guess(pd, 4, key)
    V = 0.1 * jax.random.normal(jax.random.PRNGKey(6), Y.shape, dtype=jnp.float64)
    Y2 = retract(pd, Y, V)

    # check manifold constraints of the retracted point
    Yrot = np.asarray(Y2[: pd.rot_size]).reshape(pd.n, pd.d, 4)
    for i in range(pd.n):
        np.testing.assert_allclose(Yrot[i] @ Yrot[i].T, np.eye(2), atol=1e-10)
    Ysph = np.asarray(Y2[pd.rot_size : pd.rot_size + pd.m])
    np.testing.assert_allclose(np.linalg.norm(Ysph, axis=-1), 1.0, atol=1e-10)
    # projection is idempotent
    np.testing.assert_allclose(
        np.asarray(project_to_manifold(pd, Y2)), np.asarray(Y2), atol=1e-10
    )


def test_project_to_SOd():
    rng = np.random.default_rng(0)
    for d in (2, 3):
        M = rng.normal(size=(6, d, d))
        R = np.asarray(mf.project_to_SOd(jnp.asarray(M)))
        for i in range(6):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(d), atol=1e-10)
            np.testing.assert_allclose(np.linalg.det(R[i]), 1.0, atol=1e-10)


# ---------------------------------------------------------------------------
# ill-conditioned d=3 projection (advisor r4: the guarded Newton-Schulz
# produced ||PP^T - I|| ~ 1 on anisotropic I + alpha^2 v v^T Grams from
# large-alpha saddle-escape trial retractions)
# ---------------------------------------------------------------------------


def _rank1_perturbed_blocks(alpha, n=8, d=3, r=5, dtype=np.float64):
    rng = np.random.default_rng(7)
    Y = np.asarray(mf.stiefel_project(jnp.asarray(rng.normal(size=(n, d, r)))))
    u = rng.normal(size=(n, d, 1))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = rng.normal(size=(n, 1, r))
    w /= np.linalg.norm(w, axis=2, keepdims=True)
    return jnp.asarray(Y + alpha * u * w, dtype=dtype)


@pytest.mark.parametrize("alpha", [1.0, 1e2, 1e3, 1e6])
def test_stiefel_projection_anisotropic_f64(alpha):
    """Exact closed form: near-orthonormal output for any conditioning."""
    A = _rank1_perturbed_blocks(alpha)
    P = np.asarray(mf.stiefel_project(A))
    G = np.einsum("ndr,ner->nde", P, P)
    assert np.isfinite(P).all()
    assert np.abs(G - np.eye(3)).max() < 1e-6


@pytest.mark.parametrize("alpha", [1e2, 1e3, 1e4])
def test_stiefel_projection_anisotropic_f32(alpha):
    """float32 QDWH works on A directly (no Gram squaring), so the
    output is orthonormal to ~eps for any conditioning (the old guarded
    Newton-Schulz gave ||PP^T - I|| ~ 1 already at alpha=1e3)."""
    A = _rank1_perturbed_blocks(alpha, dtype=jnp.float32)
    P = np.asarray(mf.stiefel_project(A))
    G = np.einsum("ndr,ner->nde", P, P)
    assert np.isfinite(P).all()
    err = np.abs(G - np.eye(3)).max()
    assert err < 1e-5, f"alpha={alpha}: ||PP^T - I|| = {err}"
