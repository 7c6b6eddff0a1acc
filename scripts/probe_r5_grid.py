"""Round-5 probe 4: verbose kernel-path solve + config grid (warm)."""

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
from cora_tpu.types import Formulation, Preconditioner, SolverConfig  # noqa: E402

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
        use_pallas="auto",
    )
    base.update(kw)
    return SolverConfig(**base)


# ---- 1. verbose warm solve: why do ranks 4-6 fail certification? ----
cfg = mkcfg(verbose=True)
solve_cora(problem, config=cfg)  # absorb any residual compiles
log("--- verbose warm kernel solve ---")
t = time.time()
res = solve_cora(problem, config=cfg)
log(f"verbose solve: {time.time()-t:.2f}s t_cert="
    f"{float(res.elapsed_to_certificate):.2f} ranks={res.ranks_visited}")

# ---- 2. config grid ----
rows = []
grid = (
    [dict(seed=s) for s in (1, 2)]
    + [dict(init_rank_jump=j) for j in (1, 2)]
    + [dict(ramp_tcg_iterations=t_) for t_ in (16, 32)]
    + [dict(max_staircase_iterations=c) for c in (40, 90)]
    + [dict(polish_time_budget=1.0)]
)
for kw in grid:
    cfg = mkcfg(**kw)
    solve_cora(problem, config=cfg)  # warm any new shapes
    t = time.time()
    res = solve_cora(problem, config=cfg)
    wall = time.time() - t
    row = {
        "cfg": {k: v for k, v in kw.items()},
        "t_cert_s": round(float(res.elapsed_to_certificate), 3),
        "wall_s": round(wall, 3),
        "certified": bool(res.certified),
        "f": round(float(res.result.f), 4),
        "ranks": res.ranks_visited,
        "phases": {k: round(v, 3) for k, v in (res.phases or {}).items()},
    }
    rows.append(row)
    log(json.dumps(row))
with open(os.path.join(REPO, "scripts", "r5_grid_results.json"), "w") as fh:
    json.dump(rows, fh, indent=1)
log("DONE")
