"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cora_tpu import parse_pyfg
from cora_tpu.ops.quadratic import data_matrix_product
from cora_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_operator,
    pad_problem_data,
    shard_problem_data,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return make_mesh()


@pytest.mark.parametrize(
    "subdir", ["single_rpm", "single_range", "small_ra_slam_problem"]
)
def test_sharded_product_matches_local(fixtures_dir, mesh, subdir):
    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    pd = problem.device_data()
    pds = shard_problem_data(pd, mesh)
    op = make_sharded_operator(pds, mesh)
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.standard_normal((pd.size, 4)))
    got = np.asarray(op(Y))
    want = np.asarray(data_matrix_product(pd, Y))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=1e-10 * scale)


def test_sharded_product_on_plaza2(datasets_dir, mesh):
    problem = parse_pyfg(str(datasets_dir / "plaza2.pyfg"))
    pd = problem.device_data()
    pds = shard_problem_data(pd, mesh)
    op = make_sharded_operator(pds, mesh)
    rng = np.random.default_rng(1)
    Y = jnp.asarray(rng.standard_normal((pd.size, 3)))
    got = np.asarray(op(Y))
    want = np.asarray(data_matrix_product(pd, Y))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-10 * scale)


def test_padding_is_inert(mesh):
    """Edge counts that don't divide the mesh shard cleanly (13 poses,
    7 ranges over 8 devices) must still reproduce the exact product."""
    from cora_tpu.models.synthetic import synthetic_problem

    problem = synthetic_problem(n_poses=13, n_landmarks=2, n_ranges=7, seed=1)
    pd = problem.device_data()
    pds = shard_problem_data(pd, mesh)
    op = make_sharded_operator(pds, mesh)
    rng = np.random.default_rng(2)
    Y = jnp.asarray(rng.standard_normal((pd.size, 3)))
    np.testing.assert_allclose(
        np.asarray(op(Y)),
        np.asarray(data_matrix_product(pd, Y)),
        atol=1e-10,
    )


def test_sharded_solve_certifies(fixtures_dir, mesh):
    """Full certified staircase solve on the 8-device mesh: TNT, saddle
    escape and refinement all run on the edge-sharded operator."""
    from cora_tpu import solve_cora
    from cora_tpu.types import Preconditioner, SolverConfig

    problem = parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )
    cfg = SolverConfig(
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY, seed=3
    )
    res = solve_cora(problem, config=cfg, mesh=mesh)
    assert res.certified
    assert res.result.f < 1e-6  # noiseless fixture: certified optimum is 0

    # sharded and unsharded paths agree on the certified objective
    res_local = solve_cora(problem, config=cfg)
    assert abs(res.result.f - res_local.result.f) < 1e-6


def test_init_distributed_and_global_mesh():
    """Single-process smoke path of the multi-host bootstrap: no-op init,
    global mesh over all (virtual) devices, operator exactness on it."""
    from cora_tpu.models.synthetic import synthetic_problem
    from cora_tpu.parallel.distributed import (
        init_distributed,
        make_global_mesh,
        process_info,
    )

    assert init_distributed() is False  # single-process: no-op
    pid, nproc = process_info()
    assert (pid, nproc) == (0, 1)

    gmesh = make_global_mesh()
    assert gmesh.devices.size == len(jax.devices())

    problem = synthetic_problem(n_poses=16, n_landmarks=1, n_ranges=8, seed=0)
    pd = problem.device_data()
    op = make_sharded_operator(shard_problem_data(pd, gmesh), gmesh)
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.standard_normal((pd.size, 3)))
    np.testing.assert_allclose(
        np.asarray(op(Y)), np.asarray(data_matrix_product(pd, Y)), atol=1e-10
    )


def test_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(len(jax.devices()))


def test_implicit_mesh_solve_certifies(fixtures_dir, mesh):
    """Implicit (marginalized) formulation under the device mesh: the
    Qmain/B products ride the edge-sharded explicit operator, the banded
    L⁻¹ apply is replicated (reference `src/CORA_problem.cpp:714-757`)."""
    import numpy as np

    from cora_tpu.solve.staircase import solve_cora
    from cora_tpu.types import Formulation, Preconditioner, SolverConfig

    problem = parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg"))
    cfg = SolverConfig(
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
        formulation=Formulation.IMPLICIT,
        dtype=np.float64,
        seed=0,
    )
    res = solve_cora(problem, config=cfg, mesh=mesh)
    res_ref = solve_cora(problem, config=cfg)  # no mesh
    assert res.certified
    # noiseless fixture: the optimum cost is ~0; compare absolutely
    np.testing.assert_allclose(
        res.sdp_cost, res_ref.sdp_cost, rtol=1e-6, atol=1e-10)


def test_lred_factor_multi_robot_bandwidth():
    """`_lred_factor`'s RCM band assumption on a multi-robot graph with
    inter-robot ranges (the tiers/mrclam structure): the reduced
    translation Laplacian must factor exactly (banded + spikes)."""
    import numpy as np

    from cora_tpu.models.formulations import ImplicitOperators
    from cora_tpu.models.synthetic import synthetic_problem
    from cora_tpu.measurements import RangeMeasurement
    from cora_tpu.symbol import Symbol

    problem = synthetic_problem(n_poses=60, n_landmarks=2, n_ranges=30,
                                dim=2, seed=7)
    # inter-pose ranges spanning the chain (multi-robot-style coupling)
    rng = np.random.default_rng(0)
    for k in range(8):
        i, j = sorted(rng.choice(60, size=2, replace=False))
        if j - i < 2:
            continue
        try:
            problem.add_range_measurement(RangeMeasurement(
                Symbol("a", int(i)), Symbol("a", int(j)), 1.0 + k, 0.5))
        except ValueError:
            pass
    pd = problem.device_data(dtype=np.float64)
    impl = ImplicitOperators(problem, pd)  # raises if band is inexact

    # marginalized operator matches the dense Schur complement
    import scipy.sparse as sp

    Q = problem.data_matrix().toarray()
    off = pd.rot_range_size
    Qm, B, L = Q[:off, :off], Q[:off, off:-1], Q[off:-1, off:-1]
    Y = rng.standard_normal((off, 3))
    ref = Qm @ Y - B @ np.linalg.solve(L, B.T @ Y)
    import jax.numpy as jnp

    out = np.asarray(impl.product(jnp.asarray(Y)))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize(
    "subdir", ["single_rpm", "single_range", "small_ra_slam_problem"]
)
def test_blockrow_product_matches_local(fixtures_dir, mesh, subdir):
    """Block-row operator (separator psum + all_gather) is exact."""
    from cora_tpu.parallel.sharding import make_blockrow_operator

    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    pd = problem.device_data()
    op = make_blockrow_operator(pd, mesh)
    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.standard_normal((pd.size, 4)))
    got = np.asarray(op(Y))
    want = np.asarray(data_matrix_product(pd, Y))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=1e-10 * scale)


def test_blockrow_product_synthetic_cross_block(mesh):
    """Loop closures + landmarks + ranges crossing block boundaries all
    route through the separator correctly (exactness at plaza2-like
    structure, small size)."""
    from cora_tpu.models.synthetic import synthetic_problem
    from cora_tpu.parallel.sharding import make_blockrow_operator

    problem = synthetic_problem(n_poses=300, n_landmarks=5, n_ranges=150,
                                seed=3)
    pd = problem.device_data(dtype=np.float32)
    op = make_blockrow_operator(pd, mesh)
    rng = np.random.default_rng(1)
    Y = jnp.asarray(rng.standard_normal((pd.size, 3)), jnp.float32)
    got = np.asarray(op(Y))
    want = np.asarray(data_matrix_product(pd, Y))
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)
