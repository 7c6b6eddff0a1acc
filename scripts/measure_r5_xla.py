"""Round-5 XLA-path measurement on the real chip.

One long-lived process (tunnel rule: never kill a TPU client); absorbs
any pending D2H stall up front, then times plaza2 solves for a small
config grid on the XLA (use_pallas="never") path. Writes JSON lines to
stdout and a summary to scripts/r5_xla_results.json.
"""

import json
import os
import sys
import time

REPO = "/root/repo"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

t0 = time.time()
print("devices:", jax.devices(), flush=True)
np.asarray(jax.numpy.zeros(8))  # absorb any tunnel D2H stall up front
print(f"first D2H: {time.time()-t0:.1f}s", flush=True)

from cora_tpu import parse_pyfg, solve_cora  # noqa: E402
from cora_tpu.solve.staircase import extract_solution  # noqa: E402
from cora_tpu.types import Formulation, Preconditioner, SolverConfig  # noqa: E402
from cora_tpu.utils.evaluation import evaluate_ate  # noqa: E402

problem = parse_pyfg("/root/reference/examples/data/plaza2.pyfg")
print(f"parsed plaza2: {time.time()-t0:.1f}s", flush=True)

results = []
for cap, tcg in [(60, 24), (120, 16)]:
    cfg = SolverConfig(
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
        formulation=Formulation.EXPLICIT,
        dtype=np.float32,
        max_staircase_iterations=cap,
        ramp_tcg_iterations=tcg,
        seed=0,
        use_pallas="never",
    )
    t = time.time()
    res = solve_cora(problem, config=cfg)
    warm = time.time() - t
    t = time.time()
    res2 = solve_cora(problem, config=cfg)
    run = time.time() - t
    soln = extract_solution(problem, cfg, res2)
    ate = float(evaluate_ate(problem, soln))
    row = {
        "cap": cap, "tcg": tcg,
        "warm_s": round(warm, 3), "timed_s": round(run, 3),
        "t_cert_s": round(float(res2.elapsed_to_certificate), 3),
        "certified": bool(res2.certified),
        "cost": round(float(res2.result.f), 4),
        "ate": round(ate, 4),
        "ranks": res2.ranks_visited,
        "phases_s": {k: round(v, 3) for k, v in (res2.phases or {}).items()},
    }
    results.append(row)
    print(json.dumps(row), flush=True)

with open(os.path.join(REPO, "scripts", "r5_xla_results.json"), "w") as fh:
    json.dump(results, fh, indent=1)
print(f"DONE in {time.time()-t0:.1f}s", flush=True)
