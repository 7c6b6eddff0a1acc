"""Compare ONE chunk outer iteration against the standalone kernels."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np
import cora_tpu  # noqa: F401
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
np.asarray(jnp.zeros((8,)))

from cora_tpu import parse_pyfg
from cora_tpu.ops import tiles as T
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
print(f"init: f={f:.6e} gn={gn:.4e} pgn={pgn:.4e}", flush=True)

# manual: tcg + step
delta = jnp.asarray(5.0, jnp.float32)
s, mdec, hit, k, snorm = kern.tcg(gt, Yt, nFt, delta, jnp.asarray(24, jnp.int32))
Yp, QYp, gradp, f_prop, gn_p, pgn_p = kern.step(Yt, s, jnp.asarray(1, jnp.int32))
mdec, f_prop = float(mdec), float(f_prop)
rho = (f - f_prop) / mdec if mdec else float("nan")
print(f"manual: k={int(k)} mdec={mdec:.4e} snorm={float(snorm):.4e} "
      f"f_prop={f_prop:.6e} rho={rho:.4f} accept={rho >= 0.05 and mdec > 0}",
      flush=True)

# chunk with stop_at=1
H = 310
hists = (jnp.zeros((H,), jnp.float32),) * 4 + (jnp.zeros((H,), jnp.int32),)
fscal = jnp.asarray(np.array([f, gn, pgn, 5.0, np.inf, 0.0, 0, 0], np.float32))
iscal = jnp.asarray(np.array([0, 0, 1, 0, 0, 1, 24, 0, 0, 0, 0, 0], np.int32))
Y2, g2, nF2, fs, isc, h2 = kern.chunk(Yt, gt, nFt, fscal, iscal, hists,
                                      history_len=H)
fs = np.asarray(jax.device_get(fs))
isc = np.asarray(jax.device_get(isc))
h2 = [np.asarray(x) for x in jax.device_get(h2)]
print(f"chunk: f={fs[0]:.6e} gn={fs[1]:.4e} pgn={fs[2]:.4e} Delta={fs[3]:.3f} "
      f"k={isc[0]} status={isc[1]} hist_f0={h2[0][0]:.6e} "
      f"hist_s0={h2[3][0]:.4e} hist_i0={h2[4][0]} rz0={h2[2][100]:.5e} miters={h2[1][100]} snorm_dbg={h2[3][100]:.4e} mdec_dbg={h2[0][100]:.4e}", flush=True)
print("DONE", flush=True)
