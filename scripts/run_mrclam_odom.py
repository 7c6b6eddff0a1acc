"""mrclam retry with odometry initialization (the reference grid's Odom
rows, `run_utils/run_experiments.bash`) + plaza2 odom-init comparison
point (the reference's published 3.57 s row IS odom init)."""

import json
import os
import sys
import time

REPO = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:8.1f}s] {msg}", flush=True)


log(f"devices: {jax.devices()}")
np.asarray(jnp.zeros(8))
log("D2H stall absorbed")

from cora_tpu import parse_pyfg, solve_cora  # noqa: E402
from cora_tpu.solve.staircase import extract_solution  # noqa: E402
from cora_tpu.types import (  # noqa: E402
    Formulation, Initialization, Preconditioner, SolverConfig,
)
from cora_tpu.utils.evaluation import evaluate_ate  # noqa: E402

DATA = "/root/reference/examples/data"
MR = f"{DATA}/mrclam/range_and_rpm"
DATASETS = [
    ("plaza2", f"{DATA}/plaza2.pyfg"),
    ("mrclam5a", f"{MR}/mrclam5a/mrclam5a.pyfg"),
    ("mrclam3b", f"{MR}/mrclam3b/mrclam3b.pyfg"),
    ("mrclam6", f"{MR}/mrclam6/mrclam6.pyfg"),
]

cfg = SolverConfig(
    preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
    formulation=Formulation.EXPLICIT,
    dtype=np.float32,
    max_staircase_iterations=60,
    ramp_tcg_iterations=24,
    seed=0,
    initialization=Initialization.ODOMETRY,
    use_pallas="auto",
)

rows = []
for name, path in DATASETS:
    if not os.path.exists(path):
        continue
    try:
        problem = parse_pyfg(path)
        t = time.time()
        res = solve_cora(problem, config=cfg)
        cold = time.time() - t
        t = time.time()
        res = solve_cora(problem, config=cfg)
        wall = time.time() - t
        soln = extract_solution(problem, cfg, res)
        ate = float(evaluate_ate(problem, soln))
        row = {
            "dataset": name, "init": "odometry",
            "t_cert_s": round(float(res.elapsed_to_certificate), 3),
            "wall_warm_s": round(wall, 3), "wall_cold_s": round(cold, 3),
            "certified": bool(res.certified),
            "f": round(float(res.result.f), 4),
            "ate": round(ate, 4),
            "ranks": res.ranks_visited,
            "phases": {k: round(v, 3) for k, v in (res.phases or {}).items()},
        }
        rows.append(row)
        log("Experiment result: " + json.dumps(row))
    except Exception as e:  # noqa: BLE001
        log(f"{name}: ERROR {type(e).__name__}: {e}")
        rows.append({"dataset": name, "init": "odometry", "error": str(e)})
    with open(os.path.join(REPO, "scripts", "r5_mrclam_odom.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
log("DONE")
