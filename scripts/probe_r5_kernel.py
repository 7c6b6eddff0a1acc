"""Round-5 kernel-path probe on the real chip (staged, incremental logs).

Answers VERDICT r4 item 2: where does the time-to-first-result of the
Pallas chunk path go — Mosaic compile, or kernel runtime? Runs in ONE
process (tunnel rule), prints+flushes after every stage.
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
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

T0 = time.time()


def log(msg):
    print(f"[{time.time()-T0:8.1f}s] {msg}", flush=True)


log(f"devices: {jax.devices()}")
np.asarray(jnp.zeros(8))
log("D2H stall absorbed")

from cora_tpu import parse_pyfg  # noqa: E402
from cora_tpu.ops import tiles as tile_mod  # noqa: E402
from cora_tpu.solve.tnt_tiles import get_kernel_backend  # noqa: E402
from cora_tpu.types import TNTParams  # noqa: E402
from cora_tpu.ops.riemannian import random_initial_guess  # noqa: E402

problem = parse_pyfg("/root/reference/examples/data/plaza2.pyfg")
pd = problem.device_data(dtype=np.float32)
log(f"parsed plaza2 (N={pd.size})")

params = TNTParams()
backend, reason = get_kernel_backend(problem, pd, 2, params)
log(f"get_kernel_backend rank=2: {'OK' if backend else reason}")
if backend is None:
    sys.exit(1)
plan, kern = backend
log(f"plan: n_pad={plan.n_pad} q={plan.q} S={plan.S} levels={plan.levels} "
    f"r={plan.r}")
from cora_tpu.ops.pallas_tcg import plan_vmem_bytes  # noqa: E402
log(f"vmem estimate: {plan_vmem_bytes(plan)/2**20:.1f} MiB")

Y0 = random_initial_guess(pd, 2, jax.random.PRNGKey(0))
Yt = tile_mod.to_tiles(plan, jnp.asarray(Y0, jnp.float32))
log("tiles built")

# ---- step kernel ----
zeros = tuple(jnp.zeros_like(t) for t in Yt)
t = time.time()
out = kern.step(Yt, zeros, jnp.asarray(0, jnp.int32))
f0 = float(out[3])
log(f"step kernel: compile+run {time.time()-t:.1f}s, f0={f0:.4e}")
t = time.time()
for _ in range(5):
    out = kern.step(Yt, zeros, jnp.asarray(0, jnp.int32))
jax.block_until_ready(out)
log(f"step kernel warm: {(time.time()-t)/5*1e3:.2f} ms/dispatch")

# ---- chunk kernel: compile with a 0-iteration chunk ----
H = 310
hists = (
    jnp.zeros((H,), jnp.float32), jnp.zeros((H,), jnp.float32),
    jnp.zeros((H,), jnp.float32), jnp.zeros((H,), jnp.float32),
    jnp.zeros((H,), jnp.int32),
)


def run_chunk(Yt, gt, nFt, k, stop_at, init_flag, f=0.0, gn=0.0, pgn=0.0,
              Delta=5.0, tcg=24, ramp_until=60, ramp_tcg=24, hists=hists):
    fscal = jnp.asarray(np.array(
        [f, gn, pgn, Delta, 1e3, 1e-4, 0.0, 0.0], np.float32))
    iscal = jnp.asarray(np.array(
        [k, 0, 0, 0, 0, stop_at, tcg, ramp_until, ramp_tcg, 10,
         init_flag, 0], np.int32))
    return kern.chunk(Yt, gt, nFt, fscal, iscal, hists, history_len=H)


t = time.time()
res = run_chunk(Yt, zeros, zeros, 0, 0, 1)
fs = np.asarray(jax.device_get(res[3]))
log(f"chunk compile (0-iter, init only): {time.time()-t:.1f}s, "
    f"f={fs[0]:.4e} gn={fs[1]:.3e}")

Yt2, gt2, nFt2 = res[0], res[1], res[2]
hists2 = res[5]
state = dict(f=float(fs[0]), gn=float(fs[1]), pgn=float(fs[2]),
             Delta=float(fs[3]))

# ---- timed chunks of growing size ----
k = 0
for iters in (4, 8, 16, 32, 64):
    t = time.time()
    res = run_chunk(Yt2, gt2, nFt2, k, k + iters, 0, hists=hists2, **state)
    fs = np.asarray(jax.device_get(res[3]))
    isc = np.asarray(jax.device_get(res[4]))
    dt = time.time() - t
    newk = int(isc[0])
    log(f"chunk {k}->{newk} (asked {iters}): {dt:.2f}s "
        f"({dt/max(newk-k,1)*1e3:.1f} ms/outer-iter), status={int(isc[1])}, "
        f"f={fs[0]:.6e} gn={fs[1]:.3e}")
    Yt2, gt2, nFt2, hists2 = res[0], res[1], res[2], res[5]
    state = dict(f=float(fs[0]), gn=float(fs[1]), pgn=float(fs[2]),
                 Delta=float(fs[3]))
    k = newk
    if int(isc[1]) != 0:
        log(f"terminated with status {int(isc[1])}")
        break

# ---- full solve via tnt_solve_tiles + staircase with kernel backend ----
log("now full staircase solve with use_pallas=auto ...")
from cora_tpu import solve_cora  # noqa: E402
from cora_tpu.types import Formulation, Preconditioner, SolverConfig  # noqa: E402

cfg = SolverConfig(
    preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
    formulation=Formulation.EXPLICIT,
    dtype=np.float32,
    max_staircase_iterations=60,
    ramp_tcg_iterations=24,
    seed=0,
    use_pallas="auto",
    verbose=True,
)
t = time.time()
res = solve_cora(problem, config=cfg)
warm = time.time() - t
log(f"solve 1 (compiles): {warm:.1f}s certified={res.certified} "
    f"f={float(res.result.f):.4f} ranks={res.ranks_visited}")
t = time.time()
res = solve_cora(problem, config=cfg)
log(f"solve 2 (warm): {time.time()-t:.2f}s t_cert="
    f"{float(res.elapsed_to_certificate):.2f}s certified={res.certified} "
    f"ranks={res.ranks_visited} phases={ {k2: round(v,3) for k2,v in (res.phases or {}).items()} }")
with open(os.path.join(REPO, "scripts", "r5_kernel_results.json"), "w") as fh:
    json.dump({
        "t_cert_s": float(res.elapsed_to_certificate),
        "certified": bool(res.certified),
        "f": float(res.result.f),
        "ranks": res.ranks_visited,
        "phases": res.phases,
    }, fh, indent=1)
log("DONE")
