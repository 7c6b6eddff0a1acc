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
