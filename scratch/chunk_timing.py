"""Decompose chunk-kernel cost: fixed dispatch vs per-outer vs per-inner."""
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
print("warm", flush=True)

from cora_tpu import parse_pyfg
from cora_tpu.ops import tiles as T
from cora_tpu.solve.tnt import HashableParams
from cora_tpu.solve.tnt_tiles import get_kernel_backend
from cora_tpu.types import TNTParams
from cora_tpu.ops.riemannian import random_initial_guess

problem = parse_pyfg("/root/reference/examples/data/plaza2.pyfg")
pd = problem.device_data(dtype=np.float32)
params = TNTParams()
(plan, kern), _ = get_kernel_backend(problem, pd, 3, params)
Y0 = random_initial_guess(pd, 3, jax.random.PRNGKey(0)).astype(jnp.float32)
Y0t = T.to_tiles(plan, Y0)
zeros = tuple(jnp.zeros_like(t) for t in Y0t)
Yt, nFt, gt, f_d, gn_d, pgn_d = kern.step(Y0t, zeros, jnp.asarray(0, jnp.int32))
f, gn, pgn = (float(x) for x in jax.device_get((f_d, gn_d, pgn_d)))
H = 310
hists = (jnp.zeros((H,), jnp.float32),) * 4 + (jnp.zeros((H,), jnp.int32),)


def run_chunk(n_outer, tcg):
    fscal = jnp.asarray(np.array(
        [f, gn, pgn, 5.0, np.inf, 0.0, 0, 0], np.float32))
    iscal = jnp.asarray(np.array(
        [0, 0, 1, 0, 0, n_outer, tcg, 0, 0, 0, 0, 0], np.int32))
    out = kern.chunk(Yt, gt, nFt, fscal, iscal, hists, history_len=H)
    jax.block_until_ready(out[3])
    return out


def timeit(fn, n=10):
    fn()
    t0 = time.time()
    for _ in range(n):
        fn()
    return (time.time() - t0) / n


# Careful: aliasing donates Yt..., so re-derive inputs each call
def fresh():
    return kern.step(Y0t, zeros, jnp.asarray(0, jnp.int32))


for n_outer, tcg in [(1, 1), (2, 1), (5, 1), (5, 24), (10, 24), (20, 24),
                     (20, 80)]:
    t = timeit(lambda: run_chunk(n_outer, tcg), n=5)
    print(f"outer={n_outer:3d} tcg={tcg:3d}: {t*1e3:8.2f} ms", flush=True)

# per-inner-iteration: difference between tcg budgets at fixed outer
print("DONE", flush=True)
