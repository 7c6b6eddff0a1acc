"""Round-5 probe 3: kernel path with escape-direction fix, init-chunk
compile absorption, f32 propagators. Determinism + timing, vs XLA path."""

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

rows = []
for label, pallas, n_warm in (("kernel", "auto", 3), ("xla", "never", 2)):
    cfg = SolverConfig(
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
        formulation=Formulation.EXPLICIT,
        dtype=np.float32,
        max_staircase_iterations=60,
        ramp_tcg_iterations=24,
        seed=0,
        use_pallas=pallas,
    )
    t = time.time()
    res = solve_cora(problem, config=cfg)
    log(f"{label} solve 0 (compiles): {time.time()-t:.1f}s "
        f"certified={res.certified} f={float(res.result.f):.4f} "
        f"ranks={res.ranks_visited}")
    for i in range(1, n_warm + 1):
        t = time.time()
        res = solve_cora(problem, config=cfg)
        wall = time.time() - t
        soln = extract_solution(problem, cfg, res)
        ate = float(evaluate_ate(problem, soln))
        log(f"{label} solve {i} (warm): {wall:.2f}s t_cert="
            f"{float(res.elapsed_to_certificate):.2f}s "
            f"certified={res.certified} f={float(res.result.f):.4f} "
            f"ate={ate:.4f} ranks={res.ranks_visited} "
            f"phases={ {k: round(v, 3) for k, v in (res.phases or {}).items()} }")
        rows.append({
            "label": label, "i": i,
            "t_cert_s": float(res.elapsed_to_certificate), "wall_s": wall,
            "certified": bool(res.certified), "f": float(res.result.f),
            "ate": ate, "ranks": res.ranks_visited,
            "phases": {k: round(v, 3) for k, v in (res.phases or {}).items()},
        })
with open(os.path.join(REPO, "scripts", "r5_kernel3_results.json"), "w") as fh:
    json.dump(rows, fh, indent=1)
log("DONE")
