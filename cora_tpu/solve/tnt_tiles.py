"""TNT trust-region solver on the fused Pallas kernel backend.

Mirrors `cora_tpu.solve.tnt` (same parameters, status codes, ramp→finish
semantics, adaptive plateau pacing, chunked host time-cap checks — see
that module for the reference citations) but runs each chunk of outer
iterations as ONE Pallas kernel (`PallasTNT.chunk`): per outer iteration
the whole Steihaug–Toint tCG inner solve, the fused
retract+objective+gradient step and the trust-region/status logic all
execute with VMEM-resident state, and the constant tiles (banded-factor
propagators, edge coefficients) are loaded once per chunk instead of per
iteration.

Canonical (N, r) state crosses the tile boundary only at solve entry and
exit; between chunks only a dozen scalars round-trip to the host (for
the wall-clock cap, reference `max_computation_time`, `src/CORA.cpp:106`).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from cora_tpu.ops import tiles as tile_mod
from cora_tpu.ops.pallas_tcg import (
    KernelCompileError,
    PallasTNT,
    kernel_supported,
)
from cora_tpu.solve.tnt import (
    CHUNK_ITERS,
    GRAD_TOL,
    MAX_ITERS,
    PRECON_GRAD_TOL,
    RUNNING,
    STATUS_NAMES,
    TIME_CAP,
    HashableParams,
)
from cora_tpu.types import TNTParams, TNTResult


def tnt_solve_tiles(
    plan,
    kern: PallasTNT,
    Y0,
    params: TNTParams | None = None,
    max_iterations_override: int | None = None,
    max_tcg_override: int | None = None,
    max_time: float | None = None,
    ramp_iterations: int = 0,
    ramp_tcg: int = 0,
    lift_grad_norm: float = float("inf"),
    stall_window: int = 0,
    stall_tol: float = 0.0,
) -> TNTResult:
    """Drop-in `tnt_solve` on the kernel backend (canonical Y in/out)."""
    params = params or TNTParams()
    t0 = time.time()
    iter_cap = min(
        max_iterations_override or params.max_iterations, params.max_iterations
    )
    iter_cap += max(int(ramp_iterations), 0)
    tcg_cap = min(
        max_tcg_override or params.max_tcg_iterations, params.max_tcg_iterations
    )
    if max_time is None:
        max_time = params.max_computation_time

    # the first chunk evaluates f/grad/nablaF in-kernel (isc[10] flag):
    # grad/nablaF tiles enter as zeros and one dispatch does init + loop
    Yt = tile_mod.to_tiles(plan, jnp.asarray(Y0, jnp.float32))
    gt = tuple(jnp.zeros_like(t) for t in Yt)
    nFt = gt
    f = gn = pgn = 0.0
    status = RUNNING
    init_flag = 1

    H = int(iter_cap)
    hists = (
        jnp.zeros((H,), jnp.float32), jnp.zeros((H,), jnp.float32),
        jnp.zeros((H,), jnp.float32), jnp.zeros((H,), jnp.float32),
        jnp.zeros((H,), jnp.int32),
    )
    k = 0
    Delta = float(params.delta0)
    finish = dec = stp = 0
    timed_out = False
    # the FIRST chunk is a 0-iteration init-only dispatch: it absorbs the
    # Mosaic compile OUTSIDE the level's wall-clock budget (a cold
    # compile inside the budget turned levels into TIME_CAP ramp-lifts,
    # making trajectories depend on the compile cache — observed as
    # run-to-run nondeterminism), and evaluates f/grad/nablaF so the
    # adaptive chunk sizing below starts from real state. The next chunk
    # is small (8) to give the host an early per-iteration cost sample,
    # so the per-rank time cap (reference `max_computation_time`,
    # `src/CORA.cpp:106`) is enforceable from the start — a
    # 128-iteration first chunk made a slow kernel uninterruptible for
    # minutes (VERDICT r4).
    chunk_iters = 8
    first_call = True
    while (status == RUNNING and k < iter_cap) or first_call:
        # adaptive chunk sizing — see `tnt.tnt_solve` (per-rank time cap
        # cannot overshoot by more than ~half the remaining budget)
        if k > 0 and max_time is not None:
            per_iter = max((time.time() - t0) / max(k, 1), 1e-6)
            remaining = max(max_time - (time.time() - t0), 0.0)
            chunk_iters = int(
                min(max(remaining * 0.5 / per_iter, 8), CHUNK_ITERS))
        chunk_end = min(k, iter_cap) if first_call else min(
            k + chunk_iters, iter_cap)
        fscal = jnp.asarray(np.array(
            [f, gn, pgn, Delta, lift_grad_norm, stall_tol, 0.0, 0.0],
            np.float32))
        iscal = jnp.asarray(np.array(
            [k, status, finish, dec, stp, chunk_end, tcg_cap,
             int(ramp_iterations), int(ramp_tcg), int(stall_window),
             init_flag, 0],
            np.int32))
        init_flag = 0
        try:
            Yt, gt, nFt, fs, isc, hists = kern.chunk(
                Yt, gt, nFt, fscal, iscal, hists, history_len=H)
            fs = np.asarray(jax.device_get(fs), np.float64)
        except Exception as e:  # noqa: BLE001 — Mosaic/XLA compile or OOM
            if first_call:
                # nothing computed yet: the caller restarts this solve on
                # the XLA path from the same Y0 (`staircase.run_tnt`)
                raise KernelCompileError(str(e)) from e
            raise
        isc = np.asarray(jax.device_get(isc), np.int64)
        f, gn, pgn, Delta = (float(x) for x in fs)
        k, status, finish, dec, stp = (int(x) for x in isc)
        if first_call:
            # compile + init absorbed; the level's clock starts now
            first_call = False
            t0 = time.time()
        if (
            status == RUNNING and k < iter_cap
            and max_time is not None
            and time.time() - t0 > max_time
        ):
            timed_out = True
            break

    Y_final = tile_mod.from_tiles(plan, *Yt)
    h = jax.device_get(hists)
    elapsed = time.time() - t0
    if status == RUNNING:
        status = TIME_CAP if timed_out else MAX_ITERS
    return TNTResult(
        f=f,
        x=Y_final,
        gradfx_norm=gn,
        preconditioned_gradfx_norm=pgn,
        num_iterations=k,
        inner_iterations=np.asarray(h[4][:k]),
        objective_values=np.asarray(h[0][:k]),
        gradient_norms=np.asarray(h[1][:k]),
        preconditioned_gradient_norms=np.asarray(h[2][:k]),
        update_step_norms=np.asarray(h[3][:k]),
        elapsed_time=elapsed,
        status=STATUS_NAMES.get(status, str(status)),
        iterates=None,
    )


# ---------------------------------------------------------------------------
# plan / kernel caching on the Problem object
# ---------------------------------------------------------------------------


def get_kernel_backend(problem, pd, rank: int, params: TNTParams,
                       max_cond: float = 1e6, interpret: bool = False):
    """(plan_with_rank, PallasTNT) for this problem/rank, cached.

    Returns (None, reason) when the fused-kernel path does not cover the
    problem (non-chain graph, VMEM budget, ...). The r-independent plan
    (constant tiles + banded factor) is built once per problem; per-rank
    instances share the constant arrays and the device uploads.
    """
    reason = tile_mod.plan_supported(pd)
    if reason is not None:
        return None, reason

    cache = getattr(problem, "_tile_kernel_cache", None)
    if cache is None or cache.get("key") != (pd.size, float(max_cond)):
        try:
            base_plan = tile_mod.build_tile_plan(
                problem, pd, rank, max_cond=max_cond, dtype=np.float32)
        except (ValueError, np.linalg.LinAlgError) as e:
            return None, str(e)
        cache = problem._tile_kernel_cache = {
            "key": (pd.size, float(max_cond)),
            "plan": base_plan,
            "kernels": {},
        }
    base_plan = cache["plan"]
    plan = dataclasses.replace(base_plan, r=int(rank))
    reason = kernel_supported(plan)
    if reason is not None:
        return None, reason
    hp = params if isinstance(params, HashableParams) else HashableParams(params)
    kkey = (int(rank), hp)
    kern = cache["kernels"].get(kkey)
    if kern is None:
        kern = PallasTNT(plan, hp, interpret=interpret)
        # share device-resident constant arrays across ranks
        proto = next(iter(cache["kernels"].values()), None)
        if proto is not None:
            kern.consts = proto.consts
            kern.capinv = proto.capinv
        cache["kernels"][kkey] = kern
    return (plan, kern), None


def saddle_escape_tiles(
    plan,
    kern: PallasTNT,
    Y,
    theta: float,
    v,
    gradient_tolerance: float = 1e-4,
    preconditioned_gradient_tolerance: float = 1e-4,
    alpha_min: float = 1e-6,
    verbose: bool = False,
):
    """Saddle escape on the kernel backend: the whole ±α trial ladder is
    ONE kernel dispatch (`PallasTNT.ladder`). Semantics identical to
    `cora_tpu.solve.saddle.saddle_escape` (reference `src/CORA.cpp:245-350`);
    `plan`/`kern` must be built for rank r+1."""
    from cora_tpu.solve.saddle import N_ALPHAS

    N, r = Y.shape
    Y_aug = jnp.concatenate(
        [jnp.asarray(Y, jnp.float32), jnp.zeros((N, 1), jnp.float32)], axis=1)
    vv = jnp.asarray(np.asarray(v).reshape(N), jnp.float32)
    Ydot = jnp.zeros_like(Y_aug).at[:, -1].set(vv)
    Yt = tile_mod.to_tiles(plan, Y_aug)
    Ydt = tile_mod.to_tiles(plan, Ydot)

    zeros = tuple(jnp.zeros_like(t) for t in Yt)
    _, _, _, f_d, _, _ = kern.step(Yt, zeros, jnp.asarray(0, jnp.int32))
    f_saddle = float(f_d)

    alpha0 = max(16 * alpha_min, 100 * gradient_tolerance / abs(theta), 1.0)
    alphas = alpha0 * 0.5 ** np.arange(N_ALPHAS)
    signed = np.stack([alphas, -alphas], axis=1).reshape(-1)
    f, gn, pgn = kern.ladder(Yt, Ydt, jnp.asarray(signed, jnp.float32))
    f, gn, pgn = (np.asarray(x) for x in jax.device_get((f, gn, pgn)))

    ok = (
        (f < f_saddle)
        & (gn > gradient_tolerance)
        & (pgn > preconditioned_gradient_tolerance)
    )
    if ok.any():
        best = int(np.argmax(ok))  # largest acceptable step first
    elif float(f.min()) < f_saddle:
        best = int(np.argmin(f))
    else:
        if verbose:
            print("WARNING: saddle-escape line search failed to escape "
                  "the saddle point")
        return Y_aug
    sv = tuple(float(signed[best]) * t for t in Ydt)
    Yn, _, _, _, _, _ = kern.step(Yt, sv, jnp.asarray(1, jnp.int32))
    return tile_mod.from_tiles(plan, *Yn)
