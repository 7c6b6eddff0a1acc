"""Fast compile check of the chunk kernel on the TPU (lowering errors
surface host-side in seconds)."""
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

from cora_tpu import parse_pyfg
from cora_tpu.ops import tiles as T
from cora_tpu.solve.tnt import HashableParams
from cora_tpu.solve.tnt_tiles import get_kernel_backend, tnt_solve_tiles
from cora_tpu.types import TNTParams
from cora_tpu.ops.riemannian import random_initial_guess

problem = parse_pyfg("/root/reference/examples/data/plaza2.pyfg")
pd = problem.device_data(dtype=np.float32)
params = TNTParams()
backend, reason = get_kernel_backend(problem, pd, 3, params)
assert backend is not None, reason
plan, kern = backend
Y0 = random_initial_guess(pd, 3, jax.random.PRNGKey(0)).astype(jnp.float32)
t0 = time.time()
res = tnt_solve_tiles(plan, kern, Y0, params, ramp_iterations=60, ramp_tcg=24,
                      lift_grad_norm=1e3, stall_window=10, stall_tol=1e-4)
print(f"first solve {time.time()-t0:.1f}s: f={res.f:.4f} |grad|={res.gradfx_norm:.3e} "
      f"iters={res.num_iterations} status={res.status}", flush=True)
t0 = time.time()
res = tnt_solve_tiles(plan, kern, Y0, params, ramp_iterations=60, ramp_tcg=24,
                      lift_grad_norm=1e3, stall_window=10, stall_tol=1e-4)
print(f"warm solve {time.time()-t0:.3f}s: f={res.f:.4f} iters={res.num_iterations} "
      f"status={res.status}", flush=True)
print("OK", flush=True)
