"""Reproduce seed1's failing staircase verbosely + validate the ladder
kernel against the XLA saddle escape."""
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
np.asarray(jnp.zeros((8,)))

from cora_tpu import parse_pyfg, solve_cora
from cora_tpu.types import Formulation, Preconditioner, SolverConfig

problem = parse_pyfg("/root/reference/examples/data/plaza2.pyfg")

# --- ladder kernel vs XLA escape on identical inputs ---
from cora_tpu.ops import tiles as T
from cora_tpu.solve.tnt_tiles import get_kernel_backend, saddle_escape_tiles
from cora_tpu.solve.saddle import saddle_escape
from cora_tpu.types import TNTParams
from cora_tpu.ops.riemannian import random_initial_guess
from cora_tpu.ops.quadratic import evaluate_objective

pd = problem.device_data(dtype=np.float32)
params = TNTParams()
Y = random_initial_guess(pd, 3, jax.random.PRNGKey(5)).astype(jnp.float32)
rng = np.random.default_rng(0)
v = rng.standard_normal(pd.size)
v /= np.linalg.norm(v)
theta = -1.0

(plan, kern), _ = get_kernel_backend(problem, pd, 4, params)
Xk = saddle_escape_tiles(plan, kern, Y, theta, v, 1e-4, 1e-4)
precon = problem.preconditioner_fn(
    Preconditioner.REGULARIZED_CHOLESKY, dtype=np.float32)
Xx = saddle_escape(pd, Y, theta, v, precon, 1e-4, 1e-4)
fk = float(evaluate_objective(pd, jnp.asarray(np.asarray(Xk), jnp.float32)))
fx = float(evaluate_objective(pd, jnp.asarray(np.asarray(Xx), jnp.float32)))
f0 = float(evaluate_objective(pd, Y))
print(f"LADDER CHECK: f0(aug)={f0:.4f} kernel-escape f={fk:.4f} "
      f"xla-escape f={fx:.4f}", flush=True)

# --- seed1 verbose staircase ---
cfg = SolverConfig(
    preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
    formulation=Formulation.EXPLICIT,
    dtype=np.float32,
    max_staircase_iterations=120,
    ramp_tcg_iterations=24,
    seed=1,
    verbose=True,
)
t0 = time.time()
res = solve_cora(problem, config=cfg)
print(f"SEED1: certified={res.certified} f={res.result.f:.4f} "
      f"ranks={res.ranks_visited} wall={time.time()-t0:.1f}s", flush=True)
