"""Visualization subsystem tests (reference `CORA_vis` / `data_viz.py`
equivalents): still rendering, iterate alignment/animation, calibration."""

import numpy as np
import pytest

from cora_tpu import parse_pyfg, solve_cora
from cora_tpu.io.viz import (
    animate_iterates,
    plot_range_calibration,
    plot_solution,
    project_and_align_iterates,
)
from cora_tpu.solve.staircase import extract_solution
from cora_tpu.types import SolverConfig


@pytest.fixture(scope="module")
def small_problem(fixtures_dir):
    return parse_pyfg(
        str(fixtures_dir / "small_ra_slam_problem" / "factor_graph.pyfg")
    )


@pytest.fixture(scope="module")
def solved(small_problem):
    cfg = SolverConfig(seed=0, log_iterates=True)
    res = solve_cora(small_problem, config=cfg)
    return cfg, res


def test_plot_solution_writes_png(small_problem, solved, tmp_path):
    cfg, res = solved
    soln = extract_solution(small_problem, cfg, res)
    out = tmp_path / "soln.png"
    plot_solution(small_problem, soln, str(out), show_gt=True)
    assert out.exists() and out.stat().st_size > 1000


def test_project_and_align_iterates(small_problem, solved):
    cfg, res = solved
    assert res.result.iterates, "log_iterates must capture iterates"
    aligned = project_and_align_iterates(
        small_problem, res.result.iterates[:3], cfg
    )
    d = small_problem.dim
    for Y in aligned:
        # rank-d, gauge-fixed: first rotation block = identity
        assert Y.shape[1] == d
        np.testing.assert_allclose(Y[:d, :d], np.eye(d), atol=1e-5)


def test_animate_iterates_writes_gif(small_problem, solved, tmp_path):
    cfg, res = solved
    out = tmp_path / "solve.gif"
    animate_iterates(
        small_problem, res.result.iterates, str(out), cfg, max_frames=4
    )
    assert out.exists() and out.stat().st_size > 1000


def test_range_calibration_plot(small_problem, tmp_path):
    out = tmp_path / "calib.png"
    plot_range_calibration(small_problem, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_play_iterates_renders_frames(small_problem, solved):
    """Live playback loop (reference CORA_vis renderLoop analog) renders
    every frame under the headless Agg backend."""
    from cora_tpu.io.viz import play_iterates

    cfg, res = solved
    n = play_iterates(small_problem, res.result.iterates, config=cfg,
                      max_frames=5, block=False)
    assert n == min(5, len(res.result.iterates))
