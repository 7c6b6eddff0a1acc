"""TNT trust-region solver on the fused Pallas kernel backend.

Mirrors `cora_tpu.solve.tnt` (same parameters, status codes, ramp→finish
semantics, chunked host time-cap checks — see that module for the
reference citations) but carries the state as pose-pair TILES
(`cora_tpu.ops.tiles`) and runs every heavy operation as a fused Pallas
kernel (`cora_tpu.ops.pallas_tcg`):

  * the whole Steihaug–Toint tCG inner solve = ONE kernel dispatch;
  * retraction + objective + gradient + preconditioned-gradient norm =
    ONE kernel dispatch per outer iteration.

Canonical (N, r) state crosses the tile boundary only at solve entry and
exit. The preconditioner is the banded RegularizedCholesky factorization
(identity pose ordering) baked into the tile plan.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from cora_tpu.ops import tiles as tile_mod
from cora_tpu.ops.pallas_tcg import PallasTNT, kernel_supported
from cora_tpu.solve.tnt import (
    CHUNK_ITERS,
    DELTA_TOL,
    GRAD_TOL,
    MAX_ITERS,
    PRECON_GRAD_TOL,
    RAMP_EXIT,
    REL_DECREASE,
    RUNNING,
    STATUS_NAMES,
    STEPSIZE,
    TIME_CAP,
    HashableParams,
)
from cora_tpu.types import TNTParams, TNTResult


def _where3(flag, A, B):
    return tuple(jnp.where(flag, a, b) for a, b in zip(A, B))


@partial(jax.jit, static_argnames=("kern", "history_len"))
def _init_tiles(kern: PallasTNT, Y0_tiles, history_len: int):
    params = kern.params
    zeros = tuple(jnp.zeros_like(t) for t in Y0_tiles)
    Y, nablaF, grad, f0, gradnorm0, pgradnorm0 = kern.step(
        Y0_tiles, zeros, jnp.asarray(0, jnp.int32))

    zeros_h = jnp.zeros((history_len,), jnp.float32)
    izeros_h = jnp.zeros((history_len,), jnp.int32)
    init_status = jnp.where(
        gradnorm0 <= params.gradient_tolerance,
        GRAD_TOL,
        jnp.where(
            pgradnorm0 <= params.preconditioned_gradient_tolerance,
            PRECON_GRAD_TOL,
            RUNNING,
        ),
    ).astype(jnp.int32)
    return dict(
        Y=Y, f=f0, grad=grad, nablaF=nablaF,
        gradnorm=gradnorm0, pgradnorm=pgradnorm0,
        Delta=jnp.asarray(params.delta0, jnp.float32),
        k=jnp.zeros((), jnp.int32),
        status=init_status, finish=jnp.zeros((), jnp.bool_),
        dec_streak=jnp.zeros((), jnp.int32),
        step_streak=jnp.zeros((), jnp.int32),
        hist_f=zeros_h, hist_g=zeros_h, hist_pg=zeros_h, hist_s=zeros_h,
        hist_i=izeros_h,
    )


@partial(jax.jit, static_argnames=("kern",))
def _chunk_tiles(kern: PallasTNT, carry, iter_cap, tcg_cap, chunk_end,
                 ramp_until, ramp_tcg, lift_grad_norm,
                 stall_window, stall_tol):
    """Device-resident chunk of TNT outer iterations (kernel backend).

    Logic is line-for-line the `cora_tpu.solve.tnt._tnt_chunk` semantics
    (ramp→finish in-loop transition, streak-based stall statuses)."""
    params = kern.params
    f32 = jnp.float32
    tiny = jnp.asarray(np.finfo(np.float32).tiny, f32)
    ramp_until = jnp.maximum(jnp.asarray(ramp_until, jnp.int32), 0)
    iter_cap = jnp.minimum(
        jnp.asarray(iter_cap, jnp.int32), params.max_iterations + ramp_until
    )
    tcg_cap = jnp.minimum(jnp.asarray(tcg_cap, jnp.int32),
                          params.max_tcg_iterations)
    stop_at = jnp.minimum(jnp.asarray(chunk_end, jnp.int32), iter_cap)
    ramp_tcg = jnp.minimum(
        jnp.where(ramp_tcg > 0, jnp.asarray(ramp_tcg, jnp.int32), tcg_cap),
        tcg_cap,
    )
    lift_grad_norm = jnp.asarray(lift_grad_norm, f32)
    stall_window = jnp.asarray(stall_window, jnp.int32)
    stall_tol = jnp.asarray(stall_tol, f32)

    def cond(c):
        return jnp.logical_and(c["k"] < stop_at, c["status"] == RUNNING)

    def body(c):
        Y, f, grad, nablaF = c["Y"], c["f"], c["grad"], c["nablaF"]
        Delta, k = c["Delta"], c["k"]

        in_ramp = jnp.logical_and(
            jnp.logical_not(c["finish"]), k < ramp_until
        )
        s, mdec, hit_boundary, inner_k, step_norm = kern.tcg(
            grad, Y, nablaF, Delta,
            jnp.where(in_ramp, ramp_tcg, tcg_cap),
        )
        Y_prop, nablaF_prop, grad_prop, f_prop, gn_prop, pgn_prop = kern.step(
            Y, s, jnp.asarray(1, jnp.int32))

        rho = (f - f_prop) / jnp.where(mdec == 0, tiny, mdec)
        accept = jnp.logical_and(rho >= params.eta1, mdec > 0)

        Y_new = _where3(accept, Y_prop, Y)
        f_new = jnp.where(accept, f_prop, f)
        grad_new = _where3(accept, grad_prop, grad)
        nablaF_new = _where3(accept, nablaF_prop, nablaF)
        gradnorm = jnp.where(accept, gn_prop, c["gradnorm"])
        pgradnorm = jnp.where(accept, pgn_prop, c["pgradnorm"])

        very_successful = rho >= params.eta2
        Delta_new = jnp.where(
            jnp.logical_not(accept),
            params.alpha1 * Delta,
            jnp.where(
                jnp.logical_and(very_successful, hit_boundary),
                params.alpha2 * Delta,
                Delta,
            ),
        )

        rel_decrease = (f - f_prop) / (jnp.abs(f) + tiny)
        small_decrease = jnp.logical_and(
            accept, rel_decrease < params.relative_decrease_tolerance
        )
        small_step = jnp.logical_and(
            accept, step_norm < params.stepsize_tolerance)
        dec_streak = jnp.where(
            small_decrease, c["dec_streak"] + 1,
            jnp.where(accept, 0, c["dec_streak"])
        ).astype(jnp.int32)
        step_streak = jnp.where(
            small_step, c["step_streak"] + 1,
            jnp.where(accept, 0, c["step_streak"])
        ).astype(jnp.int32)
        STREAK = 3
        status = jnp.where(
            gradnorm <= params.gradient_tolerance,
            GRAD_TOL,
            jnp.where(
                pgradnorm <= params.preconditioned_gradient_tolerance,
                PRECON_GRAD_TOL,
                jnp.where(
                    dec_streak >= STREAK,
                    REL_DECREASE,
                    jnp.where(
                        step_streak >= STREAK,
                        STEPSIZE,
                        jnp.where(
                            Delta_new < params.delta_tolerance,
                            DELTA_TOL, RUNNING),
                    ),
                ),
            ),
        ).astype(jnp.int32)
        # adaptive ramp end: hard budget OR objective plateau over the
        # last `stall_window` iterations (see `tnt._tnt_chunk`)
        hist_f = c["hist_f"].at[k].set(f_new)
        f_lag = hist_f[jnp.maximum(k - stall_window, 0)]
        plateaued = jnp.logical_and(
            jnp.logical_and(stall_window > 0, k >= stall_window),
            (f_lag - f_new)
            < stall_window.astype(f32) * stall_tol * jnp.abs(f_new),
        )
        boundary = jnp.logical_and(
            in_ramp,
            jnp.logical_and(
                jnp.logical_or(k + 1 == ramp_until, plateaued),
                status == RUNNING,
            ),
        )
        stall_now = jnp.logical_or(
            jnp.logical_or(status == REL_DECREASE, status == STEPSIZE),
            status == DELTA_TOL,
        )
        lift_now = jnp.logical_and(boundary, gradnorm > lift_grad_norm)
        promote = jnp.logical_or(
            jnp.logical_and(in_ramp, stall_now),
            jnp.logical_and(boundary, gradnorm <= lift_grad_norm),
        )
        status = jnp.where(
            lift_now, RAMP_EXIT, jnp.where(promote, RUNNING, status)
        ).astype(jnp.int32)
        finish_new = jnp.logical_or(c["finish"], promote)
        Delta_new = jnp.where(promote, params.delta0, Delta_new)
        dec_streak = jnp.where(promote, 0, dec_streak).astype(jnp.int32)
        step_streak = jnp.where(promote, 0, step_streak).astype(jnp.int32)

        return dict(
            Y=Y_new, f=f_new, grad=grad_new, nablaF=nablaF_new,
            gradnorm=gradnorm, pgradnorm=pgradnorm,
            Delta=Delta_new, k=k + 1, status=status, finish=finish_new,
            dec_streak=dec_streak, step_streak=step_streak,
            hist_f=hist_f,
            hist_g=c["hist_g"].at[k].set(gradnorm),
            hist_pg=c["hist_pg"].at[k].set(pgradnorm),
            hist_s=c["hist_s"].at[k].set(jnp.where(accept, step_norm, 0.0)),
            hist_i=c["hist_i"].at[k].set(inner_k),
        )

    return jax.lax.while_loop(cond, body, carry)


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

    Y0_tiles = tile_mod.to_tiles(plan, jnp.asarray(Y0, jnp.float32))
    carry = _init_tiles(kern, Y0_tiles, iter_cap)
    k = 0
    status = int(carry["status"])
    timed_out = False
    while status == RUNNING and k < iter_cap:
        chunk_end = min(k + CHUNK_ITERS, iter_cap)
        carry = _chunk_tiles(
            kern, carry,
            np.int32(iter_cap), np.int32(tcg_cap), np.int32(chunk_end),
            np.int32(ramp_iterations), np.int32(ramp_tcg),
            np.float32(lift_grad_norm),
            np.int32(stall_window), np.float32(stall_tol),
        )
        k = int(carry["k"])
        status = int(carry["status"])
        if (
            status == RUNNING and k < iter_cap
            and max_time is not None
            and time.time() - t0 > max_time
        ):
            timed_out = True
            break

    Y_final = tile_mod.from_tiles(plan, *carry["Y"])
    out = jax.device_get(
        {k_: v for k_, v in carry.items()
         if k_ not in ("Y", "grad", "nablaF")}
    )
    elapsed = time.time() - t0
    k = int(out["k"])
    status = int(out["status"])
    if status == RUNNING:
        status = TIME_CAP if timed_out else MAX_ITERS
    return TNTResult(
        f=float(out["f"]),
        x=Y_final,
        gradfx_norm=float(out["gradnorm"]),
        preconditioned_gradfx_norm=float(out["pgradnorm"]),
        num_iterations=k,
        inner_iterations=np.asarray(out["hist_i"][:k]),
        objective_values=np.asarray(out["hist_f"][:k]),
        gradient_norms=np.asarray(out["hist_g"][:k]),
        preconditioned_gradient_norms=np.asarray(out["hist_pg"][:k]),
        update_step_norms=np.asarray(out["hist_s"][:k]),
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
