"""Round-5 grid 2: robustness of the fast configs across seeds (warm)."""

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
from cora_tpu.types import Formulation, Preconditioner, SolverConfig  # noqa: E402
from cora_tpu.utils.evaluation import evaluate_ate  # noqa: E402

problem = parse_pyfg("/root/reference/examples/data/plaza2.pyfg")
log("parsed plaza2")


def mkcfg(**kw):
    base = dict(
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
        formulation=Formulation.EXPLICIT,
        dtype=np.float32,
        max_staircase_iterations=60,
        ramp_tcg_iterations=24,
        seed=0,
        init_rank_jump=2,
        use_pallas="auto",
    )
    base.update(kw)
    return SolverConfig(**base)


rows = []
grid = (
    [dict(seed=s) for s in (0, 1, 2, 3, 4)]
    + [dict(seed=s, ramp_tcg_iterations=16) for s in (0, 1)]
    + [dict(seed=0, init_rank_jump=1), dict(seed=1, init_rank_jump=0)]
)
for kw in grid:
    cfg = mkcfg(**kw)
    solve_cora(problem, config=cfg)  # warm any new shapes
    t = time.time()
    res = solve_cora(problem, config=cfg)
    wall = time.time() - t
    soln = extract_solution(problem, cfg, res)
    ate = float(evaluate_ate(problem, soln))
    row = {
        "cfg": kw,
        "t_cert_s": round(float(res.elapsed_to_certificate), 3),
        "wall_s": round(wall, 3),
        "certified": bool(res.certified),
        "f": round(float(res.result.f), 4),
        "ate": round(ate, 4),
        "ranks": res.ranks_visited,
        "phases": {k: round(v, 3) for k, v in (res.phases or {}).items()},
    }
    rows.append(row)
    log(json.dumps(row))
with open(os.path.join(REPO, "scripts", "r5_grid2_results.json"), "w") as fh:
    json.dump(rows, fh, indent=1)
log("DONE")
