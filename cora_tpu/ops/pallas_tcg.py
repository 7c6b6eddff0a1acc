"""Fused Pallas TPU kernels for the TNT hot loop.

Two kernels over the pose-pair tile layout (`cora_tpu.ops.tiles`):

  * ``tcg`` — the ENTIRE Steihaug–Toint preconditioned truncated-CG
    inner solve as one kernel: per tCG iteration the Riemannian
    Hessian-vector product (factored Q·v + Weingarten + tangent
    projection), the banded+Woodbury preconditioner solve (log-depth
    doubling scan with precomputed per-level propagators) and all CG
    scalar recurrences run on VMEM-resident state. One kernel dispatch
    replaces ~10²-10³ XLA dispatches (measured ~26 µs per dispatch
    inside a device loop on the axon-tunneled v5e).
  * ``step`` — fused retraction (closed-form d=2 polar / Newton–Schulz
    d=3) + objective + Riemannian gradient + preconditioned gradient
    norm: the once-per-outer-iteration work.

All constant tiles are passed as OPERANDS (device arrays), never traced
closure constants, so lowering stays small and one compiled program
serves every staircase level of the same shape.

Reference hot path: `src/CORA_problem.cpp:742-867`,
`src/CORA_preconditioners.cpp:46-83`, tCG loop of the vendored
`Optimization::Riemannian::TNT` driven from `src/CORA.cpp:52-141`.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cora_tpu.ops import tiles as tile_mod
from cora_tpu.ops.tiles import TilePlan, TileOps

LANES = tile_mod.LANES

# VMEM budget guard for the chunk kernel (the largest resident set):
# the kernel asks Mosaic for a 100 MiB scoped limit (v5e has 128 MiB of
# VMEM); the estimate below must fit with headroom. A problem that
# passes this guard but still fails to compile falls back to the XLA
# path at runtime (`KernelCompileError` caught in
# `cora_tpu.solve.tnt_tiles.tnt_solve_tiles` / `staircase.run_tnt`).
VMEM_BUDGET_BYTES = 80 * 1024 * 1024


class KernelCompileError(RuntimeError):
    """Mosaic rejected the kernel (VMEM, lowering, …) — callers fall
    back to the XLA TNT path."""


def _const_items(plan: TilePlan):
    """Deterministic ordering of the constant bundle (capinv goes to SMEM)."""
    keys = [k for k in sorted(plan.const.keys()) if k != "capinv"]
    return keys


def plan_vmem_bytes(plan: TilePlan) -> int:
    """Resident-set estimate of the CHUNK kernel (the peak consumer):
    9 input + 9 aliased-output + 9 scratch state tiles (= 9 full
    [P, S, L] states) plus ~6 states' worth of loop temporaries
    (Hd/z/retraction intermediates), plus the constant tiles."""
    const = sum(
        plan.const[k].size * (2 if k in PallasTNT.BF16_KEYS else 4)
        for k in _const_items(plan)
    )
    state = (2 * plan.q * plan.r + 2 * plan.S * plan.r) * plan.n_pad * 4
    return const + 15 * state


def kernel_supported(plan: TilePlan) -> str | None:
    if plan_vmem_bytes(plan) > VMEM_BUDGET_BYTES:
        return f"VMEM estimate {plan_vmem_bytes(plan)/2**20:.1f} MiB over budget"
    return None


def _mk_roll(n_pad):
    from jax.experimental.pallas import tpu as pltpu

    def roll(x, s):
        if isinstance(s, (int, np.integer)):
            s = int(s) % n_pad
            if s == 0:
                return x
            return pltpu.roll(x, shift=np.int32(s), axis=1)
        # traced shift (level loops): tpu.dynamic_rotate takes an i32
        # scalar; normalize negatives
        s = jnp.mod(s.astype(jnp.int32), jnp.int32(n_pad))
        return pltpu.roll(x, shift=s, axis=1)

    return roll


def _dynrow_ref(ref, i):
    # dynamic leading-dim read of a 3D constant ref -> (rows, lanes) value
    return ref[i]


def _tree3(fn, *trees):
    return tuple(fn(*parts) for parts in zip(*trees))


class PallasTNT:
    """Kernel bundle for one (problem, plan, rank, TNT params).

    Hashable by identity so it can ride through `jax.jit` as a static
    argument; all array data it owns is passed to the kernels as
    operands via `self.consts`.
    """

    # Propagators are stored float32 (round 5): plaza2's whole plan is
    # ~5 MiB against the chunk kernel's 100 MiB VMEM window, so the old
    # bf16 squeeze (a relic of the 13 MiB guard) bought nothing and cost
    # trajectory parity — the perturbed preconditioner steered the f32
    # staircase into a different (worse) basin than the XLA path on
    # plaza2. PSD-robustness note kept for any future bf16 revival:
    # evaluate the backward solve as the exact adjoint of the forward
    # network (`TileOps._solve_B`) so P = (L̃^{-1})^T L̃^{-1} holds for
    # the STORED propagators regardless of storage rounding.
    BF16_KEYS = ()

    def __init__(self, plan: TilePlan, params, interpret: bool = False):
        self.plan = plan
        self.params = params  # HashableParams (kappa_fgr, theta used in-kernel)
        self.interpret = bool(interpret)
        self.consts = {
            k: jnp.asarray(
                plan.const[k],
                jnp.bfloat16 if k in self.BF16_KEYS else jnp.float32,
            )
            for k in _const_items(plan)
        }
        self.capinv = jnp.asarray(
            plan.const["capinv"], jnp.float32
        )
        self._ckeys = _const_items(plan)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    # -- shared plumbing ----------------------------------------------------
    def _tile_shapes(self):
        p = self.plan
        return (
            (2 * p.q * p.r, p.n_pad),
            (2 * p.S * p.r, p.n_pad),
            (max(p.r, 8), LANES),
        )

    def _tile_specs(self, n):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]

    def _call(self, kernel, n_state_in, scalar_in, n_state_out, n_scalar_out,
              *args):
        """pallas_call with [state tiles..., consts..., capinv(SMEM),
        scalars(SMEM)] inputs and [state tiles..., scalars(SMEM)] outputs."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        shapes = self._tile_shapes()
        n_tiles_in = 3 * n_state_in
        const_args = [self.consts[k] for k in self._ckeys]
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs = (
            self._tile_specs(n_tiles_in)
            + self._tile_specs(len(const_args))
            + [smem, smem]
        )
        out_shape = tuple(
            jax.ShapeDtypeStruct(shapes[i % 3], jnp.float32)
            for i in range(3 * n_state_out)
        ) + (jax.ShapeDtypeStruct((n_scalar_out,), jnp.float32),)
        out_specs = tuple(self._tile_specs(3 * n_state_out)) + (smem,)
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=self.interpret,
        )(*args, *const_args, self.capinv, scalar_in)

    def _ops(self, const_refs, capinv_ref):
        C = dict(zip(self._ckeys, const_refs))
        C["capinv"] = capinv_ref
        return TileOps(self.plan, C, _mk_roll(self.plan.n_pad), jnp,
                       dynrow=_dynrow_ref)

    # -- shared kernel cores (used by the standalone kernels AND the
    # whole-chunk kernel) ----------------------------------------------------
    def _step_core(self, ops, Yv, sv, do_retract):
        """retract + objective + Riemannian gradient + pgradnorm."""
        Yn_r = ops.retract(Yv, sv)
        if do_retract is None:
            Yn = Yn_r
        else:
            Yn = _tree3(lambda a, b: jnp.where(do_retract > 0, a, b), Yn_r, Yv)
        QY = ops.qv(*Yn)
        f = 0.5 * ops.dot(Yn, QY)
        grad = ops.tangent_project(Yn, QY)
        gradnorm = jnp.sqrt(ops.dot(grad, grad))
        pg = ops.tangent_project(Yn, ops.precon_solve(grad))
        ip = ops.dot(grad, pg)
        pgradnorm = jnp.where(ip > 0, jnp.sqrt(jnp.maximum(ip, 0.0)), gradnorm)
        return Yn, QY, grad, f, gradnorm, pgradnorm

    def _tcg_core(self, ops, gv, Yv, nFv, delta_v, miters):
        """Steihaug–Toint tCG (mirrors `tnt.steihaug_toint_tcg`)."""
        f32 = jnp.float32
        kappa = float(self.params.kappa_fgr)
        theta = float(self.params.theta)
        eps = jnp.asarray(np.finfo(np.float32).tiny, f32)

        z0 = ops.tangent_project(Yv, ops.precon_solve(gv))
        rz0 = ops.dot(gv, z0)
        # x**theta as exp(theta*log x) — Mosaic has no powf lowering
        sq = jnp.sqrt(jnp.maximum(rz0, 0.0)) + eps
        rz_stop = rz0 * jnp.minimum(
            f32(kappa), jnp.exp(f32(theta) * jnp.log(sq))) ** 2
        zero3 = _tree3(jnp.zeros_like, gv)

        def cond(c):
            (s, r_, d, rz, phi, sigma, dmd, mdec, k, done, hit) = c
            return jnp.logical_and(k < miters, jnp.logical_not(done))

        def body(c):
            (s, r_, d, rz, phi, sigma, dmd, mdec, k, done, hit) = c
            Hd = ops.hvp(Yv, nFv, d)
            dHd = ops.dot(d, Hd)
            alpha = rz / jnp.where(dHd == 0, eps, dHd)
            phi_next = phi + 2.0 * alpha * sigma + alpha * alpha * dmd
            crossed = phi_next >= delta_v * delta_v
            negcurv = dHd <= 0
            stop_here = jnp.logical_or(crossed, negcurv)

            disc = jnp.maximum(
                sigma * sigma + dmd * (delta_v * delta_v - phi), 0.0)
            tau = (-sigma + jnp.sqrt(disc)) / jnp.where(dmd == 0, eps, dmd)
            coef = jnp.where(stop_here, tau, alpha)
            s_new = _tree3(lambda a, b: a + coef * b, s, d)
            mdec_new = jnp.where(
                stop_here,
                mdec + tau * rz - 0.5 * tau * tau * dHd,
                mdec + 0.5 * alpha * rz,
            )
            r_new = _tree3(lambda a, b: a + alpha * b, r_, Hd)
            z_new = ops.tangent_project(Yv, ops.precon_solve(r_new))
            rz_new = ops.dot(r_new, z_new)
            converged = rz_new <= rz_stop
            beta = rz_new / jnp.where(rz == 0, eps, rz)
            d_new = _tree3(lambda zz, dd: -zz + beta * dd, z_new, d)
            sigma_new = beta * (sigma + alpha * dmd)
            dmd_new = rz_new + beta * beta * dmd
            done_new = jnp.logical_or(stop_here, converged)
            return (
                s_new, r_new, d_new, rz_new,
                jnp.where(stop_here, phi, phi_next),
                sigma_new, dmd_new, mdec_new, k + 1, done_new,
                jnp.logical_or(hit, stop_here),
            )

        init = (
            zero3, gv, _tree3(lambda z: -z, z0), rz0,
            jnp.zeros((), f32), jnp.zeros((), f32), rz0,
            jnp.zeros((), f32), jnp.zeros((), jnp.int32),
            rz0 <= 0.0, jnp.zeros((), jnp.bool_),
        )
        s, r_, d, rz, phi, sigma, dmd, mdec, k, done, hit = (
            jax.lax.while_loop(cond, body, init))
        step_norm = jnp.sqrt(ops.dot(s, s))
        return s, mdec, hit, k, step_norm

    def _tcg_core_ref(self, ops, s_s, r_s, d_s, g_ref, Y_ref, nF_ref,
                      delta_v, miters):
        """Ref-state variant of `_tcg_core` for the chunk kernel: the CG
        vectors live in VMEM scratch refs and the while_loop carries only
        scalars (Mosaic stack-allocates value-carried tiles)."""
        f32 = jnp.float32
        kappa = float(self.params.kappa_fgr)
        theta = float(self.params.theta)
        eps = jnp.asarray(np.finfo(np.float32).tiny, f32)

        def read3(rr):
            return tuple(x[:] for x in rr)

        def write3(rr, vals):
            for x, v in zip(rr, vals):
                x[:] = v

        gv = read3(g_ref)
        Yv = read3(Y_ref)
        z0 = ops.tangent_project(Yv, ops.precon_solve(gv))
        rz0 = ops.dot(gv, z0)
        sq = jnp.sqrt(jnp.maximum(rz0, 0.0)) + eps
        rz_stop = rz0 * jnp.minimum(
            f32(kappa), jnp.exp(f32(theta) * jnp.log(sq))) ** 2
        write3(s_s, _tree3(jnp.zeros_like, gv))
        write3(r_s, gv)
        write3(d_s, _tree3(lambda z: -z, z0))

        def cond(c):
            (rz, phi, sigma, dmd, mdec, k, done, hit) = c
            return jnp.logical_and(k < miters, jnp.logical_not(done))

        def body(c):
            (rz, phi, sigma, dmd, mdec, k, done, hit) = c
            d = read3(d_s)
            Hd = ops.hvp(read3(Y_ref), read3(nF_ref), d)
            dHd = ops.dot(d, Hd)
            alpha = rz / jnp.where(dHd == 0, eps, dHd)
            phi_next = phi + 2.0 * alpha * sigma + alpha * alpha * dmd
            crossed = phi_next >= delta_v * delta_v
            negcurv = dHd <= 0
            stop_here = jnp.logical_or(crossed, negcurv)

            disc = jnp.maximum(
                sigma * sigma + dmd * (delta_v * delta_v - phi), 0.0)
            tau = (-sigma + jnp.sqrt(disc)) / jnp.where(dmd == 0, eps, dmd)
            coef = jnp.where(stop_here, tau, alpha)
            write3(s_s, _tree3(lambda a, b: a + coef * b, read3(s_s), d))
            mdec_new = jnp.where(
                stop_here,
                mdec + tau * rz - 0.5 * tau * tau * dHd,
                mdec + 0.5 * alpha * rz,
            )
            r_new = _tree3(lambda a, b: a + alpha * b, read3(r_s), Hd)
            write3(r_s, r_new)
            z_new = ops.tangent_project(
                read3(Y_ref), ops.precon_solve(r_new))
            rz_new = ops.dot(r_new, z_new)
            converged = rz_new <= rz_stop
            beta = rz_new / jnp.where(rz == 0, eps, rz)
            write3(d_s, _tree3(lambda zz, dd: -zz + beta * dd, z_new, d))
            done_new = jnp.logical_or(stop_here, converged)
            return (
                rz_new,
                jnp.where(stop_here, phi, phi_next),
                beta * (sigma + alpha * dmd),
                rz_new + beta * beta * dmd,
                mdec_new, k + jnp.int32(1), done_new,
                jnp.logical_or(hit, stop_here),
            )

        init = (
            rz0, jnp.zeros((), f32), jnp.zeros((), f32), rz0,
            jnp.zeros((), f32), jnp.zeros((), jnp.int32),
            rz0 <= 0.0, jnp.zeros((), jnp.bool_),
        )
        rz, phi, sigma, dmd, mdec, k, done, hit = jax.lax.while_loop(
            cond, body, init)
        sv = read3(s_s)
        step_norm = jnp.sqrt(ops.dot(sv, sv))
        return mdec, hit, k, step_norm

    # -- step kernel: retract + f + grad + pgradnorm -------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def step(self, Y, s, do_retract):
        """(Y, s) -> (Y_new, nablaF, grad, f, gradnorm, pgradnorm).

        With do_retract=0 the state is evaluated as-is (TNT init)."""
        nck = len(self._ckeys)

        def kernel(*refs):
            Y_r = refs[0:3]
            s_r = refs[3:6]
            consts = refs[6:6 + nck]
            capinv = refs[6 + nck]
            scal_in = refs[7 + nck]
            outs = refs[8 + nck:]
            ops = self._ops(consts, capinv)

            Yv = tuple(r[:] for r in Y_r)
            sv = tuple(r[:] for r in s_r)
            flag = scal_in[0]
            Yn, QY, grad, f, gradnorm, pgradnorm = self._step_core(
                ops, Yv, sv, flag)

            for i in range(3):
                outs[i][:] = Yn[i]
            for i in range(3):
                outs[3 + i][:] = QY[i]
            for i in range(3):
                outs[6 + i][:] = grad[i]
            outs[9][0] = f
            outs[9][1] = gradnorm
            outs[9][2] = pgradnorm

        scal = jnp.stack([do_retract.astype(jnp.float32)])
        out = self._call(kernel, 2, scal, 3, 3, *Y, *s)
        Yn, QY, grad, sc = out[0:3], out[3:6], out[6:9], out[9]
        return Yn, QY, grad, sc[0], sc[1], sc[2]

    # -- tCG kernel: the whole inner loop ------------------------------------
    @functools.partial(jax.jit, static_argnums=0)
    def tcg(self, grad, Y, nablaF, delta, max_iters):
        """Full Steihaug–Toint solve; returns (s, mdec, hit, iters, step_norm).

        Mirrors `cora_tpu.solve.tnt.steihaug_toint_tcg` exactly (M-norm
        bookkeeping, superlinear stopping rule)."""
        nck = len(self._ckeys)

        def kernel(*refs):
            g_r = refs[0:3]
            Y_r = refs[3:6]
            nF_r = refs[6:9]
            consts = refs[9:9 + nck]
            capinv = refs[9 + nck]
            scal_in = refs[10 + nck]
            outs = refs[11 + nck:]
            s_out, scal_out = outs[0:3], outs[3]
            ops = self._ops(consts, capinv)

            gv = tuple(r[:] for r in g_r)
            Yv = tuple(r[:] for r in Y_r)
            nFv = tuple(r[:] for r in nF_r)
            delta_v = scal_in[0]
            miters = scal_in[1].astype(jnp.int32)
            s, mdec, hit, k, step_norm = self._tcg_core(
                ops, gv, Yv, nFv, delta_v, miters)

            for i in range(3):
                s_out[i][:] = s[i]
            scal_out[0] = mdec
            scal_out[1] = hit.astype(jnp.float32)
            scal_out[2] = k.astype(jnp.float32)
            scal_out[3] = step_norm

        scal = jnp.stack([
            delta.astype(jnp.float32),
            max_iters.astype(jnp.float32),
        ])
        out = self._call(kernel, 3, scal, 1, 4, *grad, *Y, *nablaF)
        s, sc = out[0:3], out[3]
        return s, sc[0], sc[1] > 0, sc[2].astype(jnp.int32), sc[3]

    # -- chunk kernel: the whole TNT outer loop in one dispatch --------------
    @functools.partial(jax.jit, static_argnums=0,
                       static_argnames=("history_len",))
    def chunk(self, Y, grad, nablaF, fscal, iscal, hists, history_len):
        """Run TNT outer iterations until `stop_at`/termination, entirely
        on-chip: per outer iteration the tCG inner solve, the fused
        retract+objective+gradient step, and the trust-region/status/ramp
        logic (identical to `cora_tpu.solve.tnt._tnt_chunk`) execute with
        all operands VMEM-resident — the constant tiles are loaded ONCE
        per chunk instead of twice per outer iteration.

        fscal (8,)  f32: [f, gradnorm, pgradnorm, Delta, lift_grad_norm,
                          stall_tol, 0, 0]
        iscal (12,) i32: [k, status, finish, dec_streak, step_streak,
                          stop_at, tcg_cap, ramp_until, ramp_tcg,
                          stall_window, 0, 0]
        hists: 5 arrays (history_len,) — f, g, pg, s (f32) and inner (i32).
        """
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from cora_tpu.solve.tnt import (
            DELTA_TOL,
            GRAD_TOL,
            PRECON_GRAD_TOL,
            RAMP_EXIT,
            REL_DECREASE,
            RUNNING,
            STEPSIZE,
        )

        p = self.params
        nck = len(self._ckeys)
        f32 = jnp.float32
        tiny = np.float32(np.finfo(np.float32).tiny)
        STREAK = 3

        def kernel(*refs):
            Y_r = refs[0:3]
            g_r = refs[3:6]
            nF_r = refs[6:9]
            consts = refs[9:9 + nck]
            capinv = refs[9 + nck]
            fs = refs[10 + nck]
            isc = refs[11 + nck]
            h_in = refs[12 + nck:17 + nck]
            outs = refs[17 + nck:17 + nck + 16]
            scratch = refs[17 + nck + 16:]
            s_s, r_s, d_s = scratch[0:3], scratch[3:6], scratch[6:9]
            Y_o, g_o, nF_o = outs[0:3], outs[3:6], outs[6:9]
            fs_o, isc_o = outs[9], outs[10]
            h_out = outs[11:16]
            ops = self._ops(consts, capinv)

            def read3(rr):
                return tuple(x[:] for x in rr)

            def write3(rr, vals):
                for x, v in zip(rr, vals):
                    x[:] = v

            # the HBM buffers are input/output-aliased, but each side
            # gets its OWN VMEM window — the output windows start
            # undefined and must be seeded from the inputs
            for dst, srcr in zip(Y_o, Y_r):
                dst[:] = srcr[:]
            for dst, srcr in zip(g_o, g_r):
                dst[:] = srcr[:]
            for dst, srcr in zip(nF_o, nF_r):
                dst[:] = srcr[:]

            # carry histories through (the plateau detector reads lagged
            # f values from the output ref inside the loop body)
            def copy_h(i, carry):
                for a, b in zip(h_in, h_out):
                    b[i] = a[i]
                return carry

            # int32 bounds: with x64 enabled a Python-int bound makes an
            # i64 loop counter, which Mosaic cannot lower
            jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(history_len), copy_h,
                jnp.int32(0))

            stop_at = isc[5]
            tcg_cap = isc[6]
            ramp_until = isc[7]
            ramp_tcg = isc[8]
            stall_window = isc[9]
            lift_grad_norm = fs[4]
            stall_tol = fs[5]

            # seed the scalar outputs from the inputs, then (first chunk
            # of a solve, isc[10] == 1) evaluate f/grad/nablaF/status
            # in-kernel — folding the init step into the chunk saves one
            # dispatch + one blocking host sync per staircase level
            fs_o[0] = fs[0]
            fs_o[1] = fs[1]
            fs_o[2] = fs[2]
            fs_o[3] = fs[3]
            isc_o[1] = isc[1]

            import jax.experimental.pallas as _pl

            @_pl.when(isc[10] == 1)
            def _init():
                Yv = read3(Y_o)
                zz = _tree3(jnp.zeros_like, Yv)
                _, QY0, g0, f0, gn0, pgn0 = self._step_core(
                    ops, Yv, zz, jnp.int32(0))
                write3(g_o, g0)
                write3(nF_o, QY0)
                fs_o[0] = f0
                fs_o[1] = gn0
                fs_o[2] = pgn0
                isc_o[1] = jnp.where(
                    gn0 <= p.gradient_tolerance,
                    jnp.int32(GRAD_TOL),
                    jnp.where(
                        pgn0 <= p.preconditioned_gradient_tolerance,
                        jnp.int32(PRECON_GRAD_TOL),
                        jnp.int32(RUNNING),
                    ),
                )

            def cond(c):
                return jnp.logical_and(c[4] < stop_at, c[5] == RUNNING)

            def body(c):
                (f, gradnorm, pgradnorm, Delta, k, status,
                 finish, dec_streak, step_streak) = c

                in_ramp = jnp.logical_and(
                    jnp.logical_not(finish), k < ramp_until)
                mdec, hit_boundary, inner_k, step_norm = self._tcg_core_ref(
                    ops, s_s, r_s, d_s, g_o, Y_o, nF_o, Delta,
                    jnp.where(in_ramp, ramp_tcg, tcg_cap),
                )
                Yv = read3(Y_o)
                Yp, QYp, gradp, f_prop, gn_prop, pgn_prop = self._step_core(
                    ops, Yv, read3(s_s), None)

                rho = (f - f_prop) / jnp.where(mdec == 0, tiny, mdec)
                accept = jnp.logical_and(rho >= p.eta1, mdec > 0)

                write3(Y_o, _tree3(
                    lambda a, b: jnp.where(accept, a, b), Yp, Yv))
                write3(g_o, _tree3(
                    lambda a, b: jnp.where(accept, a, b), gradp, read3(g_o)))
                write3(nF_o, _tree3(
                    lambda a, b: jnp.where(accept, a, b), QYp, read3(nF_o)))
                f_new = jnp.where(accept, f_prop, f)
                gradnorm = jnp.where(accept, gn_prop, gradnorm)
                pgradnorm = jnp.where(accept, pgn_prop, pgradnorm)

                very_successful = rho >= p.eta2
                Delta_new = jnp.where(
                    jnp.logical_not(accept),
                    f32(p.alpha1) * Delta,
                    jnp.where(
                        jnp.logical_and(very_successful, hit_boundary),
                        f32(p.alpha2) * Delta,
                        Delta,
                    ),
                )

                # int literals MUST be explicit int32: a weak Python int
                # inside jnp.where promotes to i64 under x64, and Mosaic
                # cannot lower the i64->i32 narrowing (infinite recursion
                # in _convert_helper)
                i32 = jnp.int32
                rel_decrease = (f - f_prop) / (jnp.abs(f) + tiny)
                small_decrease = jnp.logical_and(
                    accept, rel_decrease < p.relative_decrease_tolerance)
                small_step = jnp.logical_and(
                    accept, step_norm < p.stepsize_tolerance)
                dec_streak = jnp.where(
                    small_decrease, dec_streak + i32(1),
                    jnp.where(accept, i32(0), dec_streak))
                step_streak = jnp.where(
                    small_step, step_streak + i32(1),
                    jnp.where(accept, i32(0), step_streak))
                status = jnp.where(
                    gradnorm <= p.gradient_tolerance,
                    i32(GRAD_TOL),
                    jnp.where(
                        pgradnorm <= p.preconditioned_gradient_tolerance,
                        i32(PRECON_GRAD_TOL),
                        jnp.where(
                            dec_streak >= i32(STREAK),
                            i32(REL_DECREASE),
                            jnp.where(
                                step_streak >= i32(STREAK),
                                i32(STEPSIZE),
                                jnp.where(
                                    Delta_new < p.delta_tolerance,
                                    i32(DELTA_TOL), i32(RUNNING)),
                            ),
                        ),
                    ),
                )

                # histories (written before the plateau read below)
                h_out[0][k] = f_new
                h_out[1][k] = gradnorm
                h_out[2][k] = pgradnorm
                h_out[3][k] = jnp.where(accept, step_norm, f32(0.0))
                h_out[4][k] = inner_k

                # adaptive ramp end: hard budget OR objective plateau
                f_lag = h_out[0][jnp.maximum(k - stall_window, i32(0))]
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
                    lift_now, i32(RAMP_EXIT),
                    jnp.where(promote, i32(RUNNING), status))
                finish = jnp.logical_or(finish, promote)
                Delta_new = jnp.where(promote, f32(p.delta0), Delta_new)
                dec_streak = jnp.where(promote, i32(0), dec_streak)
                step_streak = jnp.where(promote, i32(0), step_streak)

                return (f_new, gradnorm, pgradnorm,
                        Delta_new, k + i32(1), status, finish, dec_streak,
                        step_streak)

            # state tiles live in the (input-aliased) output refs and the
            # tCG scratch; the while_loop carries ONLY scalars — value-
            # carried tiles blow Mosaic's stack allocator (62 MiB at
            # plaza2 size)
            init = (
                fs_o[0], fs_o[1], fs_o[2], fs_o[3],
                isc[0], isc_o[1],
                isc[2] > 0,
                isc[3], isc[4],
            )
            (f, gradnorm, pgradnorm, Delta, k, status, finish,
             dec_streak, step_streak) = jax.lax.while_loop(cond, body, init)

            fs_o[0] = f
            fs_o[1] = gradnorm
            fs_o[2] = pgradnorm
            fs_o[3] = Delta
            isc_o[0] = k
            isc_o[1] = status
            # bool->int32 convert_element_type recurses in Mosaic lowering;
            # select instead
            isc_o[2] = jnp.where(finish, jnp.int32(1), jnp.int32(0))
            isc_o[3] = dec_streak
            isc_o[4] = step_streak

        shapes = self._tile_shapes()
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        const_args = [self.consts[k] for k in self._ckeys]
        in_specs = (
            self._tile_specs(9)
            + self._tile_specs(nck)
            + [smem] * 8  # capinv, fscal, iscal, 5 histories
        )
        out_shape = tuple(
            jax.ShapeDtypeStruct(shapes[i % 3], jnp.float32) for i in range(9)
        ) + (
            jax.ShapeDtypeStruct((4,), jnp.float32),
            jax.ShapeDtypeStruct((5,), jnp.int32),
            jax.ShapeDtypeStruct((history_len,), jnp.float32),
            jax.ShapeDtypeStruct((history_len,), jnp.float32),
            jax.ShapeDtypeStruct((history_len,), jnp.float32),
            jax.ShapeDtypeStruct((history_len,), jnp.float32),
            jax.ShapeDtypeStruct((history_len,), jnp.int32),
        )
        out_specs = tuple(self._tile_specs(9)) + (smem,) * 7
        shapes3 = self._tile_shapes()
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            # state tiles alias their outputs (they double as the loop's
            # mutable state buffers); CG vectors live in scratch
            input_output_aliases={i: i for i in range(9)},
            scratch_shapes=[
                pltpu.VMEM(shapes3[i % 3], jnp.float32) for i in range(9)
            ],
            compiler_params=pltpu.CompilerParams(
                # the default scoped-vmem limit is 16 MiB; v5e has 128 MiB
                # of VMEM — let the allocator use what the chip has
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(*Y, *grad, *nablaF, *const_args, self.capinv, fscal, iscal, *hists)
        Y_o, g_o, nF_o = out[0:3], out[3:6], out[6:9]
        fs_o, isc_o = out[9], out[10]
        return Y_o, g_o, nF_o, fs_o, isc_o, out[11:16]

    # -- escape-ladder kernel: all ±α saddle-escape trials in one dispatch ---
    @functools.partial(jax.jit, static_argnums=0)
    def ladder(self, Y, Ydot, signed_alphas):
        """Evaluate (f, |grad|, |pgrad|) at retract(Y, α·Ẏ) for every
        signed step length in one kernel (reference saddleEscape
        backtracking, `src/CORA.cpp:245-350`; 48 sequential XLA trials
        cost ~0.45 s in dispatch overhead through the tunnel)."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        nck = len(self._ckeys)
        A = int(signed_alphas.shape[0])

        def kernel(*refs):
            Y_r = refs[0:3]
            Yd_r = refs[3:6]
            consts = refs[6:6 + nck]
            capinv = refs[6 + nck]
            al = refs[7 + nck]
            out = refs[8 + nck]
            ops = self._ops(consts, capinv)
            Yv = tuple(x[:] for x in Y_r)
            Ydv = tuple(x[:] for x in Yd_r)

            def body(i, carry):
                a = al[i]
                sv = _tree3(lambda t: a * t, Ydv)
                _, _, _, f, gn, pgn = self._step_core(ops, Yv, sv, None)
                out[i] = f
                out[A + i] = gn
                out[2 * A + i] = pgn
                return carry

            jax.lax.fori_loop(jnp.int32(0), jnp.int32(A), body, jnp.int32(0))

        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        const_args = [self.consts[k] for k in self._ckeys]
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3 * A,), jnp.float32),
            in_specs=(self._tile_specs(6) + self._tile_specs(nck)
                      + [smem, smem]),
            out_specs=smem,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )(*Y, *Ydot, *const_args, self.capinv,
          signed_alphas.astype(jnp.float32))
        return out[:A], out[A:2 * A], out[2 * A:]
