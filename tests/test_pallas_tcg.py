"""Pallas kernel plumbing (`cora_tpu.ops.pallas_tcg`) in interpreter mode.

The tile math itself is pinned against the canonical operators in
test_tiles.py; here the kernels (whole-tCG-loop, fused step) are checked
against (a) the same TileOps math run as plain jnp, and (b) the
canonical float32 Steihaug–Toint solver, on CPU via `interpret=True`.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cora_tpu.models.synthetic import synthetic_problem  # noqa: E402
from cora_tpu.ops import tiles as T  # noqa: E402
from cora_tpu.ops.pallas_tcg import PallasTNT  # noqa: E402
from cora_tpu.ops.quadratic import data_matrix_product  # noqa: E402
from cora_tpu.ops.riemannian import (  # noqa: E402
    random_initial_guess,
    riemannian_hvp,
    tangent_space_projection,
)
from cora_tpu.precond.banded import banded_apply, device_factor, factor_banded  # noqa: E402
from cora_tpu.solve.tnt import HashableParams, steihaug_toint_tcg  # noqa: E402
from cora_tpu.types import TNTParams  # noqa: E402


def _setup(dim=2, n=37, n_landmarks=3, n_ranges=29, rank=3, seed=1):
    problem = synthetic_problem(
        n_poses=n, n_landmarks=n_landmarks, n_ranges=n_ranges, dim=dim,
        seed=seed,
    )
    pd = problem.device_data(dtype=np.float32)
    plan = T.build_tile_plan(problem, pd, rank, dtype=np.float32)
    hp = HashableParams(TNTParams())
    kern = PallasTNT(plan, hp, interpret=True)
    key = jax.random.PRNGKey(seed)
    Y = random_initial_guess(pd, rank, key).astype(jnp.float32)
    return problem, pd, plan, kern, Y


@pytest.mark.parametrize("dim,rank", [(2, 3), (3, 4)])
def test_step_kernel(dim, rank):
    problem, pd, plan, kern, Y = _setup(dim=dim, rank=rank)
    ops = T.make_host_ops(plan)
    Yt = T.to_tiles(plan, Y)
    # a tangent-ish perturbation with the REAL padding invariant (zero
    # outside valid lanes — everything the kernels ever see satisfies it)
    key = jax.random.PRNGKey(7)
    V = 0.1 * jax.random.normal(key, Y.shape, Y.dtype)
    sv = T.to_tiles(plan, V)

    for flag in (1, 0):
        Yn, QY, grad, f, gn, pgn = kern.step(
            Yt, sv, jnp.asarray(flag, jnp.int32))
        # host reference with the identical TileOps math
        Yn_ref = ops.retract(Yt, sv) if flag else Yt
        QY_ref = ops.qv(*Yn_ref)
        f_ref = 0.5 * ops.dot(Yn_ref, QY_ref)
        g_ref = ops.tangent_project(Yn_ref, QY_ref)
        for a, b in zip(Yn, Yn_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(float(f), float(f_ref), rtol=1e-4)
        for a, b in zip(grad, g_ref):
            # a block sitting ON the projection degeneracy threshold can
            # take different guard branches across backends (f32 rounding)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-2)
        gn_ref = float(jnp.sqrt(ops.dot(g_ref, g_ref)))
        np.testing.assert_allclose(float(gn), gn_ref, rtol=1e-4)
        pg_ref = ops.tangent_project(Yn_ref, ops.precon_solve(g_ref))
        ip = float(ops.dot(g_ref, pg_ref))
        pgn_ref = np.sqrt(ip) if ip > 0 else gn_ref
        # AF/AB propagators are stored bf16 in the kernel (VMEM budget);
        # the preconditioned norm shifts ~0.1-0.5% vs the f32 host path
        np.testing.assert_allclose(float(pgn), pgn_ref, rtol=1e-2)


@pytest.mark.parametrize("dim,rank", [(2, 3), (3, 4)])
def test_tcg_kernel_vs_canonical(dim, rank):
    problem, pd, plan, kern, Y = _setup(dim=dim, rank=rank)
    nablaF = data_matrix_product(pd, Y)
    grad = tangent_space_projection(pd, Y, nablaF)

    F = factor_banded(None, pd, problem.data_matrix(), plan.lam,
                      order=np.arange(pd.n, dtype=np.int64))
    fac = device_factor(pd, F, dtype=np.float32)

    def hess(v):
        return riemannian_hvp(pd, Y, nablaF, v)

    def precon(v):
        return tangent_space_projection(pd, Y, banded_apply(pd, fac, v))

    params = TNTParams()
    delta = jnp.asarray(5.0, jnp.float32)
    s_ref, mdec_ref, hit_ref, k_ref = steihaug_toint_tcg(
        grad, hess, precon, delta, 40, params.kappa_fgr, params.theta)

    Yt = T.to_tiles(plan, Y)
    gt = T.to_tiles(plan, grad)
    nt = T.to_tiles(plan, nablaF)
    s, mdec, hit, k, snorm = kern.tcg(
        gt, Yt, nt, delta, jnp.asarray(40, jnp.int32))
    s_can = T.from_tiles(plan, *s)

    # bf16 scan propagators in the kernel's preconditioner shift the CG
    # trajectory slightly; compare at the level that matters (iteration
    # count within 2, boundary flag, model decrease and step to ~1%)
    assert abs(int(k) - int(k_ref)) <= 2
    assert bool(hit) == bool(hit_ref)
    np.testing.assert_allclose(float(mdec), float(mdec_ref), rtol=2e-2)
    np.testing.assert_allclose(np.asarray(s_can), np.asarray(s_ref),
                               rtol=8e-2, atol=1e-1)
    np.testing.assert_allclose(
        float(snorm), float(jnp.linalg.norm(s_ref)), rtol=2e-2)


def test_solve_cora_kernel_backend_e2e():
    """Full certified staircase solve on the kernel backend (interpret
    mode) — certifies and matches the XLA path's cost on a tiny chain."""
    from cora_tpu.solve.staircase import solve_cora
    from cora_tpu.types import Formulation, Preconditioner, SolverConfig

    problem = synthetic_problem(
        n_poses=14, n_landmarks=2, n_ranges=10, dim=2, seed=3)
    base = dict(
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
        formulation=Formulation.EXPLICIT,
        dtype=np.float32,
        max_staircase_iterations=40,
        seed=0,
    )
    res_k = solve_cora(problem, config=SolverConfig(use_pallas="always", **base))
    res_x = solve_cora(problem, config=SolverConfig(use_pallas="never", **base))
    assert res_k.certified
    assert res_x.certified
    np.testing.assert_allclose(res_k.sdp_cost, res_x.sdp_cost, rtol=1e-4)
    np.testing.assert_allclose(res_k.result.f, res_x.result.f, rtol=1e-4)
