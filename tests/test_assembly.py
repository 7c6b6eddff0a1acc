"""Golden-matrix assembly tests against the reference's MATLAB-exported
MatrixMarket fixtures (reference `tests/test_parse_pyfg.cpp`,
`tests/test_construct_problem.cpp`)."""

import numpy as np
import pytest
import scipy.sparse as sp

from cora_tpu import Problem, parse_pyfg
from cora_tpu.io.matrix_market import read_matrix_market
from cora_tpu.measurements import RangeMeasurement, RelativePoseMeasurement
from cora_tpu.symbol import Symbol

PROBLEMS = ["single_rpm", "single_range", "small_ra_slam_problem"]

SUBMATRIX_FILES = {
    "Arange.mm": "range_incidence_matrix",
    "OmegaRange.mm": "range_precision_matrix",
    "RangeDistances.mm": "range_dist_matrix",
    "Apose.mm": "rel_pose_incidence_matrix",
    "OmegaPose.mm": "rel_pose_translation_precision_matrix",
    "T.mm": "rel_pose_translation_data_matrix",
    "RotConLaplacian.mm": "rotation_conn_laplacian",
}


def _check_close(actual, expected, name, atol=1e-10):
    actual = sp.csr_matrix(actual)
    expected = sp.csr_matrix(expected)
    if expected.shape[0] == 0 or expected.shape[1] == 0:
        assert actual.shape[0] == 0 or actual.shape[1] == 0, name
        return
    assert actual.shape == expected.shape, f"{name}: {actual.shape} vs {expected.shape}"
    diff = abs(actual - expected).max() if actual.nnz + expected.nnz else 0.0
    assert diff < atol, f"{name}: max abs diff {diff}"


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_submatrices_match_fixtures(fixtures_dir, subdir):
    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    sub = problem.submatrices()
    for fname, attr in SUBMATRIX_FILES.items():
        expected = read_matrix_market(str(fixtures_dir / subdir / fname))
        _check_close(getattr(sub, attr), expected, f"{subdir}/{fname}")


@pytest.mark.parametrize("subdir", PROBLEMS)
def test_data_matrix_matches_fixture(fixtures_dir, subdir):
    problem = parse_pyfg(str(fixtures_dir / subdir / "factor_graph.pyfg"))
    expected = read_matrix_market(str(fixtures_dir / subdir / "DataMatrix.mm"))
    _check_close(problem.data_matrix(), expected, f"{subdir}/DataMatrix.mm")


def test_single_odom_ground_truth_in_null_space():
    # reference `test_construct_problem.cpp:22-76`
    dim, rank = 2, 5
    problem = Problem(dim=dim, relaxation_rank=rank)
    x1, x2 = Symbol("x1"), Symbol("x2")
    problem.add_pose_variable(x1)
    problem.add_pose_variable(x2)
    problem.add_relative_pose_measurement(
        RelativePoseMeasurement(x1, x2, np.eye(2), np.array([1.0, 0.0]), np.eye(3))
    )
    Q = problem.data_matrix()

    rng = np.random.default_rng(0)
    t1 = rng.normal(size=dim)
    X = np.zeros(((dim + 1) * 2, dim))
    X[:dim, :] = np.eye(dim)
    X[dim:2 * dim, :] = np.eye(dim)
    X[2 * dim] = t1
    X[2 * dim + 1] = t1 + np.array([1.0, 0.0])

    assert np.linalg.norm(Q @ X) < 1e-12

    # gauge invariance: any orthogonal rotation of the state stays in the null space
    A = rng.normal(size=(dim, dim))
    ortho, _ = np.linalg.qr(A)
    assert np.linalg.norm(Q @ (X @ ortho)) < 1e-12


def test_single_range_ground_truth_in_null_space():
    # reference `test_construct_problem.cpp:80-125`
    dim, rank = 3, 5
    problem = Problem(dim=dim, relaxation_rank=rank)
    l1, l2 = Symbol("l1"), Symbol("l2")
    problem.add_landmark_variable(l1)
    problem.add_landmark_variable(l2)
    problem.add_range_measurement(RangeMeasurement(l1, l2, 2.0, 1.0))
    Q = problem.data_matrix()

    rng = np.random.default_rng(1)
    p1 = rng.normal(size=dim)
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    p2 = p1 + 2.0 * direction

    X = np.vstack([-direction, p1, p2])
    assert np.linalg.norm(Q @ X) < 1e-12


def test_duplicate_rejection():
    problem = Problem(dim=2, relaxation_rank=3)
    problem.add_pose_variable(Symbol("a0"))
    with pytest.raises(ValueError):
        problem.add_pose_variable(Symbol("a0"))
    problem.add_pose_variable(Symbol("a1"))
    m = RelativePoseMeasurement(
        Symbol("a0"), Symbol("a1"), np.eye(2), np.zeros(2), np.eye(3)
    )
    problem.add_relative_pose_measurement(m)
    with pytest.raises(ValueError):
        problem.add_relative_pose_measurement(m)


@pytest.mark.parametrize("name,n_poses,n_rpm,n_range,n_lm", [
    ("plaza2.pyfg", 4091, 4090, 1807, 4),
    ("single_drone.pyfg", 1754, 1753, 1754, 1),
])
def test_parse_benchmark_datasets(datasets_dir, name, n_poses, n_rpm, n_range, n_lm):
    problem = parse_pyfg(str(datasets_dir / name))
    assert problem.num_poses == n_poses
    assert problem.num_pose_pose_measurements == n_rpm
    assert problem.num_range_measurements == n_range
    assert problem.num_landmarks == n_lm
