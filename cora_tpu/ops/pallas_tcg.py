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

# VMEM budget guard: inputs + scratch must fit on-chip (~16 MiB/core on
# v5e); beyond this the caller falls back to the XLA path
VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _const_items(plan: TilePlan):
    """Deterministic ordering of the constant bundle (capinv goes to SMEM)."""
    keys = [k for k in sorted(plan.const.keys()) if k != "capinv"]
    return keys


def plan_vmem_bytes(plan: TilePlan) -> int:
    const = sum(
        plan.const[k].size * 4 for k in _const_items(plan)
    )
    state = 3 * (2 * plan.q * plan.r + 2 * plan.S * plan.r) * plan.n_pad * 4
    work = 8 * (2 * plan.q * plan.r + 2 * plan.S * plan.r) * plan.n_pad * 4
    return const + state + work


def kernel_supported(plan: TilePlan) -> str | None:
    if plan_vmem_bytes(plan) > VMEM_BUDGET_BYTES:
        return f"VMEM estimate {plan_vmem_bytes(plan)/2**20:.1f} MiB over budget"
    return None


def _mk_roll(n_pad):
    from jax.experimental.pallas import tpu as pltpu

    def roll(x, s):
        s = int(s) % n_pad
        if s == 0:
            return x
        return pltpu.roll(x, shift=np.int32(s), axis=1)

    return roll


def _tree3(fn, *trees):
    return tuple(fn(*parts) for parts in zip(*trees))


class PallasTNT:
    """Kernel bundle for one (problem, plan, rank, TNT params).

    Hashable by identity so it can ride through `jax.jit` as a static
    argument; all array data it owns is passed to the kernels as
    operands via `self.consts`.
    """

    def __init__(self, plan: TilePlan, params, interpret: bool = False):
        self.plan = plan
        self.params = params  # HashableParams (kappa_fgr, theta used in-kernel)
        self.interpret = bool(interpret)
        self.consts = {
            k: jnp.asarray(plan.const[k]) for k in _const_items(plan)
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
        return TileOps(self.plan, C, _mk_roll(self.plan.n_pad), jnp)

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
            Yn_r = ops.retract(Yv, sv)
            Yn = _tree3(lambda a, b: jnp.where(flag > 0, a, b), Yn_r, Yv)

            QY = ops.qv(*Yn)
            f = 0.5 * ops.dot(Yn, QY)
            grad = ops.tangent_project(Yn, QY)
            gradnorm = jnp.sqrt(ops.dot(grad, grad))
            pg = ops.tangent_project(Yn, ops.precon_solve(grad))
            ip = ops.dot(grad, pg)
            pgradnorm = jnp.where(
                ip > 0, jnp.sqrt(jnp.maximum(ip, 0.0)), gradnorm)

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
        kappa = float(self.params.kappa_fgr)
        theta = float(self.params.theta)

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
            f32 = jnp.float32
            eps = jnp.asarray(np.finfo(np.float32).tiny, f32)

            z0 = ops.tangent_project(Yv, ops.precon_solve(gv))
            rz0 = ops.dot(gv, z0)
            # x**theta as exp(theta*log x) — Mosaic has no powf lowering;
            # the argument is > 0 by construction (sqrt + tiny)
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

            for i in range(3):
                s_out[i][:] = s[i]
            scal_out[0] = mdec
            scal_out[1] = hit.astype(f32)
            scal_out[2] = k.astype(f32)
            scal_out[3] = jnp.sqrt(ops.dot(s, s))

        scal = jnp.stack([
            delta.astype(jnp.float32),
            max_iters.astype(jnp.float32),
        ])
        out = self._call(kernel, 3, scal, 1, 4, *grad, *Y, *nablaF)
        s, sc = out[0:3], out[3]
        return s, sc[0], sc[1] > 0, sc[2].astype(jnp.int32), sc[3]
