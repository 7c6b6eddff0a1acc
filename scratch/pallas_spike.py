"""Round-4 spike: (a) verify the library end-to-end on the real TPU,
(b) establish Pallas feasibility on the axon-tunneled chip: elementwise,
lane/sublane rolls, in-kernel fori_loop + SMEM scalars, launch overhead.

One process, exits cleanly (never kill a TPU client — tunnel wedges)."""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np

import cora_tpu  # noqa: F401  (enables x64, sets up axon)
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

print("devices:", jax.devices(), flush=True)
# pay the one-time D2H stall up front
np.asarray(jnp.zeros((8,)))
print("D2H warm", flush=True)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def step(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"[ok] {name} ({time.time()-t0:.2f}s): {out}", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {name}: {type(e).__name__}: {e}", flush=True)
        return None


# ---- 1. trivial elementwise kernel ----
def k_double(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def t_double():
    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    f = jax.jit(lambda x: pl.pallas_call(
        k_double,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    y = f(x)
    assert np.allclose(np.asarray(y), np.asarray(x) * 2.0)
    return "elementwise matches"


step("elementwise", t_double)


# ---- 2. lane roll + sublane roll ----
def k_roll(x_ref, o_ref, p_ref):
    o_ref[:] = pltpu.roll(x_ref[:], shift=1, axis=1)  # lane roll
    p_ref[:] = pltpu.roll(x_ref[:], shift=2, axis=0)  # sublane roll


def t_roll():
    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    f = jax.jit(lambda x: pl.pallas_call(
        k_roll,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
    )(x))
    a, b = f(x)
    ok1 = np.allclose(np.asarray(a), np.roll(np.asarray(x), 1, axis=1))
    ok2 = np.allclose(np.asarray(b), np.roll(np.asarray(x), 2, axis=0))
    return f"lane_roll={ok1} sublane_roll={ok2}"


step("rolls", t_roll)


# ---- 3. in-kernel fori_loop + scalar reduction to SMEM ----
def k_loop(x_ref, o_ref, acc_ref):
    def body(i, s):
        return s + jnp.sum(x_ref[:] * (i + 1.0))

    s = jax.lax.fori_loop(0, 10, body, jnp.float32(0.0))
    acc_ref[0] = s
    o_ref[:] = x_ref[:] + s


def t_loop():
    x = jnp.ones((8, 256), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        k_loop,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((1,), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
    )(x))
    y, acc = f(x)
    expected = 8 * 256 * 55.0
    return f"acc={float(acc[0])} (expect {expected})"


step("fori+smem", t_loop)


# ---- 4. in-kernel while_loop with vector state in scratch ----
def k_while(x_ref, o_ref, scratch):
    scratch[:] = x_ref[:]

    def cond(c):
        k, nrm = c
        return jnp.logical_and(k < 50, nrm > 1e-3)

    def body(c):
        k, _ = c
        scratch[:] = scratch[:] * 0.9
        return k + 1, jnp.sum(jnp.abs(scratch[:]))

    k, nrm = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1e9)))
    o_ref[:] = scratch[:]


def t_while():
    x = jnp.ones((8, 256), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        k_while,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, 256), jnp.float32)],
    )(x))
    y = f(x)
    return f"final[0,0]={float(y[0,0]):.5f} (expect 0.9^50={0.9**50:.5f}... or tol-stop)"


step("while+scratch", t_while)


# ---- 5. launch overhead: trivial kernel, timed ----
def t_overhead():
    x = jnp.ones((8, 256), jnp.float32)
    f = jax.jit(lambda x: pl.pallas_call(
        k_double,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    y = f(x).block_until_ready()
    t0 = time.time()
    for _ in range(200):
        y = f(y)
    y.block_until_ready()
    per = (time.time() - t0) / 200
    # compare: same trivial op as plain XLA
    g = jax.jit(lambda x: x * 2.0)
    y = g(x).block_until_ready()
    t0 = time.time()
    for _ in range(200):
        y = g(y)
    y.block_until_ready()
    per_xla = (time.time() - t0) / 200
    return f"pallas dispatch {per*1e6:.1f} us, xla dispatch {per_xla*1e6:.1f} us"


step("overhead", t_overhead)


# ---- 6. a chunk of pallas calls inside lax.fori_loop (device-resident) ----
def t_loop_of_kernels():
    x = jnp.ones((8, 256), jnp.float32)

    def body(i, v):
        return pl.pallas_call(
            k_double,
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(v) * 0.5
    f = jax.jit(lambda x: jax.lax.fori_loop(0, 1000, body, x))
    y = f(x).block_until_ready()
    t0 = time.time()
    y = f(x).block_until_ready()
    per = (time.time() - t0) / 1000
    return f"pallas-in-fori per-iter {per*1e6:.2f} us"


step("fori-of-pallas", t_loop_of_kernels)


# ---- 7. library e2e verify: plaza2 certified solve on TPU ----
def t_e2e():
    from cora_tpu import parse_pyfg, solve_cora
    from cora_tpu.solve.staircase import extract_solution
    from cora_tpu.types import Formulation, Preconditioner, SolverConfig
    from cora_tpu.utils.evaluation import evaluate_ate

    cfg = SolverConfig(
        preconditioner=Preconditioner.REGULARIZED_CHOLESKY,
        formulation=Formulation.EXPLICIT,
        dtype=np.float32,
        max_staircase_iterations=60,
        seed=0,
    )
    p = parse_pyfg("/root/reference/examples/data/plaza2.pyfg")
    res = solve_cora(p, config=cfg)  # warm
    t0 = time.time()
    res = solve_cora(p, config=cfg)
    wall = time.time() - t0
    soln = extract_solution(p, cfg, res)
    ate = evaluate_ate(p, soln)
    return json.dumps({
        "certified": bool(res.certified), "f": round(float(res.result.f), 4),
        "t_cert": round(res.elapsed_to_certificate, 3),
        "wall": round(wall, 3), "ate": round(float(ate), 4),
        "ranks": res.ranks_visited,
        "phases": {k: round(v, 3) for k, v in (res.phases or {}).items()},
    })


step("e2e-plaza2", t_e2e)
print("SPIKE DONE", flush=True)
