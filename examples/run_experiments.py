"""Experiment harness — the reference `examples/paper_experiments.cpp` +
`run_utils/run_experiments.bash` equivalent.

Runs the benchmark datasets over the configuration grid
{explicit, implicit} × {random, odom} × init_rank_jump, emitting the
same machine-parseable result lines the reference's `parse_data.py`
consumes ("Experiment result, name: …, time: …, cost: …" —
`paper_experiments.cpp:643-649`), plus TUM trajectory export and ATE.

Config: JSON file (see `examples/config.json`), overridable with
CORAFILE-style env var `CORA_DATASET` (reference `paper_experiments.cpp:729-732`).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

DEFAULT_DATA_DIR = "/root/reference/examples/data"
DEFAULT_DATASETS = [
    "plaza1.pyfg",
    "plaza2.pyfg",
    "single_drone.pyfg",
    "tiers.pyfg",
    "mrclam/range_and_rpm/mrclam3b/mrclam3b.pyfg",
    "mrclam/range_and_rpm/mrclam5a/mrclam5a.pyfg",
    "mrclam/range_and_rpm/mrclam6/mrclam6.pyfg",
]


def load_config(path: str | None) -> dict:
    cfg = {
        "init_rank_jump": 1,
        "max_rank": 10,
        "preconditioner": "regularized_cholesky",
        "formulation": "explicit",
        "init_type": "random",
        "dtype": "float64",
        "seed": 0,
        "verbose": False,
        "datasets": DEFAULT_DATASETS,
        "data_dir": DEFAULT_DATA_DIR,
        "output_dir": "/tmp/cora_tpu_experiments",
    }
    if path:
        with open(path) as f:
            cfg.update(json.load(f))
    return cfg


def run_one(pyfg_path: str, cfg: dict, results_file=None):
    from cora_tpu import parse_pyfg, solve_cora
    from cora_tpu.io.exporters import save_solution
    from cora_tpu.models.init import odometry_initialization
    from cora_tpu.solve.staircase import extract_solution
    from cora_tpu.types import Formulation, Preconditioner, SolverConfig
    from cora_tpu.utils.evaluation import evaluate_ate

    name = pathlib.Path(pyfg_path).stem
    problem = parse_pyfg(pyfg_path)
    scfg = SolverConfig(
        max_rank=cfg["max_rank"],
        init_rank_jump=cfg["init_rank_jump"],
        formulation=Formulation(cfg["formulation"]),
        preconditioner=Preconditioner(cfg["preconditioner"]),
        dtype=np.dtype(cfg["dtype"]).type,
        seed=cfg["seed"],
        verbose=cfg["verbose"],
    )

    x0 = None
    if cfg["init_type"] == "odom":
        rank = problem.dim + cfg["init_rank_jump"]
        x0 = odometry_initialization(problem, rank=rank, seed=cfg["seed"])
        if scfg.formulation == Formulation.IMPLICIT:
            x0 = x0[: problem.rot_and_range_matrix_size]

    t0 = time.time()
    res = solve_cora(problem, x0=x0, config=scfg)
    elapsed = time.time() - t0

    soln = extract_solution(problem, scfg, res)
    ate = evaluate_ate(problem, soln) if problem.pose_gt else float("nan")

    marginalized = scfg.formulation == Formulation.IMPLICIT
    line = (
        f"Experiment result, name: {name}, time: {elapsed:.5f}, "
        f"cost: {res.result.f:.6f}, marginalized: {int(marginalized)}, "
        f"init rank jump: {cfg['init_rank_jump']}, "
        f"init random: {int(cfg['init_type'] == 'random')}, "
        f"certified: {int(res.certified)}, sdp cost: {res.sdp_cost:.6f}, "
        f"suboptimality: {res.suboptimality:.6f}, ate: {ate:.6f}, "
        f"t_cert: {res.elapsed_to_certificate:.5f}"
    )
    print(line, flush=True)
    if results_file:
        results_file.write(line + "\n")
        results_file.flush()

    outdir = pathlib.Path(cfg["output_dir"])
    outdir.mkdir(parents=True, exist_ok=True)
    save_solution(problem, soln, str(outdir / f"{name}.tum"), fmt="tum")
    return res, elapsed, ate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="JSON config path")
    ap.add_argument("--dataset", default=None, help="single .pyfg to run")
    ap.add_argument("--sweep", action="store_true",
                    help="run the full {form}×{init}×{jump} grid")
    args = ap.parse_args()

    cfg = load_config(args.config)
    env_ds = os.environ.get("CORA_DATASET")
    datasets = (
        [args.dataset or env_ds]
        if (args.dataset or env_ds)
        else [str(pathlib.Path(cfg["data_dir"]) / d) for d in cfg["datasets"]]
    )

    outdir = pathlib.Path(cfg["output_dir"])
    outdir.mkdir(parents=True, exist_ok=True)
    results = open(outdir / "experiments.txt", "a")

    grid = [cfg]
    if args.sweep:
        grid = []
        for form in ("explicit", "implicit"):
            for init in ("random", "odom"):
                for jump in (0, 1, 2):
                    g = dict(cfg)
                    g.update(formulation=form, init_type=init, init_rank_jump=jump)
                    grid.append(g)

    for g in grid:
        for ds in datasets:
            try:
                run_one(ds, g, results)
            except Exception as e:  # keep the sweep going
                print(f"Experiment FAILED, name: {pathlib.Path(ds).stem}, "
                      f"error: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
