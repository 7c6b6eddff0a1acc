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


def test_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(len(jax.devices()))
