"""Aux subsystem tests: checkpoint/resume, timing, iterate logging,
iteration caps, native parser equivalence."""

import numpy as np
import pytest

from cora_tpu import parse_pyfg, solve_cora
from cora_tpu.types import Preconditioner, SolverConfig


@pytest.fixture()
def small_problem(fixtures_dir):
    return parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )


def test_checkpoint_save_resume(tmp_path, small_problem):
    ck = str(tmp_path / "solve.npz")
    cfg = SolverConfig(preconditioner=Preconditioner.JACOBI, seed=3)
    res = solve_cora(small_problem, config=cfg, checkpoint_path=ck)
    assert res.certified
    import os

    assert os.path.exists(ck)
    # resume path loads the checkpoint and still certifies
    res2 = solve_cora(small_problem, config=cfg, checkpoint_path=ck)
    assert res2.certified
    assert res2.result.f < 1e-6


def test_checkpoint_rejects_other_problem(tmp_path, small_problem, fixtures_dir):
    ck = str(tmp_path / "solve.npz")
    cfg = SolverConfig(preconditioner=Preconditioner.JACOBI, seed=3)
    solve_cora(small_problem, config=cfg, checkpoint_path=ck)
    other = parse_pyfg(str(fixtures_dir / "single_rpm" / "factor_graph.pyfg"))
    with pytest.raises(ValueError, match="different problem"):
        solve_cora(other, config=cfg, checkpoint_path=ck)


def test_log_iterates(small_problem):
    cfg = SolverConfig(
        preconditioner=Preconditioner.JACOBI, seed=3, log_iterates=True
    )
    res = solve_cora(small_problem, config=cfg)
    # iterates accumulate across all staircase levels + the final refine
    # (reference `solveCORA` collects them into one list, `CORA.cpp:143-151`)
    assert res.result.iterates is not None
    assert len(res.result.iterates) >= res.result.num_iterations
    assert res.result.iterates[-1].shape == res.result.x.shape


def test_staircase_iteration_cap(small_problem):
    cfg = SolverConfig(
        preconditioner=Preconditioner.JACOBI, seed=3,
        max_staircase_iterations=5,
    )
    res = solve_cora(small_problem, config=cfg)
    # the cap limits each pre-certificate level; the final refine is uncapped,
    # and the staircase still certifies (possibly at a higher rank)
    assert res.certified


def test_phase_timer():
    import time

    from cora_tpu.utils.timing import PhaseTimer

    t = PhaseTimer()
    with t("a"):
        time.sleep(0.01)
    with t("a"):
        pass
    assert t.counts["a"] == 2
    assert t.totals["a"] >= 0.01
    assert "a" in t.report()


def test_native_parser_matches_python(fixtures_dir):
    pytest.importorskip("ctypes")
    from cora_tpu.io.pyfg import parse_pyfg_python

    try:
        from cora_tpu.native.pyfg_fast import parse_pyfg_native
    except ImportError:
        pytest.skip("native extension unavailable")

    for subdir in ["single_rpm", "single_range", "small_ra_slam_problem"]:
        path = str(fixtures_dir / subdir / "factor_graph.pyfg")
        try:
            p_nat = parse_pyfg_native(path)
        except ImportError:
            pytest.skip("no compiler for native extension")
        p_py = parse_pyfg_python(path)
        assert p_py.pose_symbol_idxs == p_nat.pose_symbol_idxs
        assert p_py.landmark_symbol_idxs == p_nat.landmark_symbol_idxs
        Q1, Q2 = p_py.data_matrix(), p_nat.data_matrix()
        assert abs(Q1 - Q2).max() < 1e-14
