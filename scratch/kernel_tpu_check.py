"""Real-TPU check of the fused Pallas kernels at plaza2 size:
compile, validate vs the host TileOps path, and time.
One clean process; exits normally (tunnel fragility)."""
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
np.asarray(jnp.zeros((8,)))  # absorb any D2H stall now
print("D2H warm", flush=True)

from cora_tpu import parse_pyfg
from cora_tpu.ops import tiles as T
from cora_tpu.ops.pallas_tcg import PallasTNT, plan_vmem_bytes
from cora_tpu.ops.quadratic import data_matrix_product
from cora_tpu.ops.riemannian import random_initial_guess, tangent_space_projection
from cora_tpu.solve.tnt import HashableParams
from cora_tpu.types import TNTParams

problem = parse_pyfg("/root/reference/examples/data/plaza2.pyfg")
pd = problem.device_data(dtype=np.float32)
rank = 4
t0 = time.time()
plan = T.build_tile_plan(problem, pd, rank, dtype=np.float32)
print(f"plan built in {time.time()-t0:.2f}s; n={plan.n} nb={plan.nb} "
      f"n_pad={plan.n_pad} S={plan.S} l={plan.l} levels={plan.levels} "
      f"vmem={plan_vmem_bytes(plan)/2**20:.1f}MiB", flush=True)

hp = HashableParams(TNTParams())
kern = PallasTNT(plan, hp, interpret=False)

Y = random_initial_guess(pd, rank, jax.random.PRNGKey(0)).astype(jnp.float32)
nablaF = data_matrix_product(pd, Y).astype(jnp.float32)
grad = tangent_space_projection(pd, Y, nablaF).astype(jnp.float32)
Yt = T.to_tiles(plan, Y)
gt = T.to_tiles(plan, grad)
nt = T.to_tiles(plan, nablaF)

# host reference (XLA path on tiles, CPU-checked already)
ops = T.make_host_ops(plan)

# ---- step kernel ----
t0 = time.time()
try:
    Yn, QY, g2, f, gn, pgn = kern.step(Yt, gt, jnp.asarray(0, jnp.int32))
    jax.block_until_ready(Yn)
    print(f"step compile+run {time.time()-t0:.1f}s", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"STEP KERNEL FAILED: {type(e).__name__}: {e}", flush=True)
    sys.exit(1)

QY_ref = ops.qv(*Yt)
f_ref = 0.5 * float(ops.dot(Yt, QY_ref))
g_ref = ops.tangent_project(Yt, QY_ref)
gn_ref = float(jnp.sqrt(ops.dot(g_ref, g_ref)))
print(f"step: f={float(f):.4f} (ref {f_ref:.4f})  gn={float(gn):.4f} "
      f"(ref {gn_ref:.4f})  pgn={float(pgn):.4f}", flush=True)
err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(g2, g_ref))
print(f"grad tile max err: {err:.3e}", flush=True)

# ---- tcg kernel ----
delta = jnp.asarray(5.0, jnp.float32)
t0 = time.time()
try:
    s, mdec, hit, k, snorm = kern.tcg(gt, Yt, nt, delta,
                                      jnp.asarray(24, jnp.int32))
    jax.block_until_ready(s)
    print(f"tcg compile+run {time.time()-t0:.1f}s; k={int(k)} "
          f"mdec={float(mdec):.4e} hit={bool(hit)} snorm={float(snorm):.4f}",
          flush=True)
except Exception as e:  # noqa: BLE001
    print(f"TCG KERNEL FAILED: {type(e).__name__}: {e}", flush=True)
    sys.exit(1)

# validate against host tile path (f32, loose): inline reference tcg
# using the same TileOps math


def host_tcg_run(maxit):
    f32 = jnp.float32
    eps = jnp.asarray(np.finfo(np.float32).tiny, f32)
    z0 = ops.tangent_project(Yt, ops.precon_solve(gt))
    rz = float(ops.dot(gt, z0))
    import math
    rz_stop = rz * min(0.1, (math.sqrt(max(rz, 0.0)) + 1e-38) ** 0.8) ** 2
    s = tuple(jnp.zeros_like(x) for x in gt)
    r_ = gt
    d = tuple(-x for x in z0)
    phi = sigma = 0.0
    dmd = rz
    mdec = 0.0
    hit = False
    kk = 0
    dv = 5.0
    for _ in range(maxit):
        Hd = ops.hvp(Yt, nt, d)
        dHd = float(ops.dot(d, Hd))
        alpha = rz / (dHd if dHd != 0 else 1e-38)
        phi_next = phi + 2 * alpha * sigma + alpha * alpha * dmd
        crossed = phi_next >= dv * dv
        negcurv = dHd <= 0
        stop = crossed or negcurv
        if stop:
            disc = max(sigma * sigma + dmd * (dv * dv - phi), 0.0)
            tau = (-sigma + math.sqrt(disc)) / (dmd if dmd != 0 else 1e-38)
            s = tuple(a + tau * b for a, b in zip(s, d))
            mdec = mdec + tau * rz - 0.5 * tau * tau * dHd
            hit = True
            kk += 1
            break
        s = tuple(a + alpha * b for a, b in zip(s, d))
        mdec = mdec + 0.5 * alpha * rz
        r_ = tuple(a + alpha * b for a, b in zip(r_, Hd))
        z = ops.tangent_project(Yt, ops.precon_solve(r_))
        rz_new = float(ops.dot(r_, z))
        kk += 1
        if rz_new <= rz_stop:
            break
        beta = rz_new / (rz if rz != 0 else 1e-38)
        d = tuple(-a + beta * b for a, b in zip(z, d))
        sigma = beta * (sigma + alpha * dmd)
        dmd = rz_new + beta * beta * dmd
        phi = phi_next
        rz = rz_new
    return s, mdec, hit, kk


s_ref, mdec_ref, hit_ref, k_ref = host_tcg_run(24)
print(f"host ref: k={k_ref} mdec={mdec_ref:.4e} hit={hit_ref}", flush=True)
serr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(s, s_ref))
print(f"s tile max err vs host: {serr:.3e} (snorm {float(snorm):.4f})", flush=True)

# ---- timing ----
def timeit(fn, n=50):
    fn()
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / n


t_step = timeit(lambda: kern.step(Yt, gt, jnp.asarray(1, jnp.int32)))
t_tcg24 = timeit(lambda: kern.tcg(gt, Yt, nt, delta, jnp.asarray(24, jnp.int32)))
t_tcg80 = timeit(lambda: kern.tcg(gt, Yt, nt, delta, jnp.asarray(80, jnp.int32)))
print(f"TIMING: step {t_step*1e3:.3f} ms | tcg(24) {t_tcg24*1e3:.3f} ms "
      f"| tcg(80) {t_tcg80*1e3:.3f} ms", flush=True)
# old-path per-iteration was ~0.65 ms -> tcg(24) was ~15 ms equivalent
print("DONE", flush=True)
