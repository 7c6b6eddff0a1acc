"""plaza2 e2e on the fused-kernel backend: correctness + t_cert, then a
seed/tcg robustness sweep. One process, clean exit."""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np

import cora_tpu  # noqa: F401
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
print("devices:", jax.devices(), flush=True)
np.asarray(jnp.zeros((8,)))
print("D2H warm", flush=True)

from cora_tpu import parse_pyfg, solve_cora
from cora_tpu.solve.staircase import extract_solution
from cora_tpu.types import Formulation, Preconditioner, SolverConfig
from cora_tpu.utils.evaluation import evaluate_ate

problem = parse_pyfg("/root/reference/examples/data/plaza2.pyfg")


def run(tag, use_pallas, seed=0, tcg=24, cap=120, verbose=False):
    cfg = SolverConfig(
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
        formulation=Formulation.EXPLICIT,
        dtype=np.float32,
        max_staircase_iterations=cap,
        ramp_tcg_iterations=tcg,
        seed=seed,
        use_pallas=use_pallas,
        verbose=verbose,
    )
    t0 = time.time()
    res = solve_cora(problem, config=cfg)
    wall = time.time() - t0
    soln = extract_solution(problem, cfg, res)
    ate = float(evaluate_ate(problem, soln))
    out = dict(
        tag=tag, certified=bool(res.certified),
        f=round(float(res.result.f), 4), t_cert=round(res.elapsed_to_certificate, 3),
        wall=round(wall, 3), ate=round(ate, 4), ranks=res.ranks_visited,
        phases={k: round(v, 3) for k, v in (res.phases or {}).items()},
    )
    print(json.dumps(out), flush=True)
    return out


# warmup/compile pass (kernel backend), verbose to see level flow
print("== warmup (compiles) ==", flush=True)
run("pallas-warm", "auto", verbose=True)
print("== timed ==", flush=True)
run("pallas-s0", "auto")
run("pallas-s0b", "auto")

print("== sweep ==", flush=True)
for seed in range(5):
    run(f"pallas-seed{seed}", "auto", seed=seed)
for tcg in (12, 16):
    run(f"pallas-tcg{tcg}", "auto", tcg=tcg)
print("ALL DONE", flush=True)
