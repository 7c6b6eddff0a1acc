"""Preconditioners for the tCG inner loop.

The reference supports {None, Jacobi, BlockCholesky, RegularizedCholesky}
(`CORA_types.h:77`, `src/CORA_problem.cpp:512-623`). TPU-native lineup:

  * ``none`` / ``jacobi``      — trivial, fully on device.
  * ``block_jacobi``           — batched d×d rotation-block inverses +
                                 scalar rows; a TPU-friendly strengthening
                                 of Jacobi with no host factorization.
  * ``block_cholesky`` / ``regularized_cholesky``
        — the reference's CHOLMOD factorizations are replaced by a
          banded-Cholesky + Woodbury scheme (`cora_tpu.precond.banded`):
          the graph is near-banded under the natural odometry ordering,
          so Q+λI factors into a banded factor (applied on device as a
          blocked triangular solve over `lax.scan`) plus a low-rank
          capacitance correction for the few dense landmark columns.

Every preconditioner is exposed as a callable ``V ↦ P(V)`` on the
ambient space; the solver composes it with the tangent projection
(reference `src/CORA.cpp:87-92`).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from cora_tpu.graph.data import ProblemData
from cora_tpu.types import Preconditioner


class PrecondOp:
    """A preconditioner as (static apply-function, operand pytree).

    ``fn(pd, fac, V) -> P·V`` where ``fac`` is a pytree of device
    arrays. Solvers pass ``fac`` through jit as an *operand* — not a
    closure constant — so lowering never embeds (or pulls device→host)
    megabytes of factor data into the MLIR module, and one compiled
    program serves every factor of the same shape. Instances are also
    directly callable (``P(V)``) for non-jit composition.
    """

    def __init__(self, fn: Callable, fac: Any, pd: ProblemData):
        self.fn = fn
        self.fac = fac
        self.pd = pd

    def __call__(self, V):
        return self.fn(self.pd, self.fac, V)


def _identity_fn(pd, fac, V):
    return V


def _diag_fn(pd, fac, V):
    return fac * V


def _block_jacobi_fn(pd, fac, V):
    import jax.numpy as jnp

    from cora_tpu.ops.linalg import bmm

    r = V.shape[1]
    Vrot = V[: pd.rot_size].reshape(pd.n, pd.d, r)
    Prot = bmm(fac["inv_blocks"], Vrot)
    return jnp.concatenate(
        [Prot.reshape(pd.rot_size, r), fac["inv_scalar"] * V[pd.rot_size:]],
        axis=0,
    )


_IMPL_WRAP_CACHE: dict = {}


def implicit_precond(full: "PrecondOp") -> "PrecondOp":
    """Implicit-formulation wrapper: lift the reduced [rot|sphere] state
    with zero translations, apply the full preconditioner, truncate
    (reference `CORA_problem.cpp:869-903`). The wrapped fn is cached per
    inner fn so jit sees a stable static callable."""
    fn = _IMPL_WRAP_CACHE.get(full.fn)
    if fn is None:
        inner = full.fn

        def fn(pd, fac, V):
            import jax.numpy as jnp

            pad = jnp.zeros((pd.num_translations, V.shape[1]), V.dtype)
            lifted = jnp.concatenate([V, pad], axis=0)
            return inner(pd, fac, lifted)[: pd.rot_range_size]

        _IMPL_WRAP_CACHE[inner] = fn
    return PrecondOp(fn, full.fac, full.pd)


def make_preconditioner(
    problem,
    pd: ProblemData,
    kind: Preconditioner,
    dtype=None,
    reg_chol_max_cond: float = 1e6,
) -> Callable:
    """Build a preconditioner apply-function for `problem`.

    The returned callable is hashable-stable (one object per problem build)
    so jit caches compiled solvers across TNT calls.
    """
    dtype = dtype or pd.dtype()
    if kind == Preconditioner.NONE:
        return identity_preconditioner()
    if kind == Preconditioner.JACOBI:
        return jacobi_preconditioner(pd)
    if kind == Preconditioner.BLOCK_JACOBI:
        return block_jacobi_preconditioner(pd)
    if kind == Preconditioner.BLOCK_CHOLESKY:
        from cora_tpu.precond.banded import block_cholesky_preconditioner

        return block_cholesky_preconditioner(problem, pd, dtype=dtype)
    if kind == Preconditioner.REGULARIZED_CHOLESKY:
        from cora_tpu.precond.banded import banded_cholesky_preconditioner

        return banded_cholesky_preconditioner(
            problem, pd, max_cond=reg_chol_max_cond
        )
    raise ValueError(f"unknown preconditioner {kind}")


def identity_preconditioner(pd: ProblemData | None = None) -> Callable:
    return PrecondOp(_identity_fn, None, pd)


def jacobi_preconditioner(pd: ProblemData) -> Callable:
    """P = diag(Q)^{-1} (reference `CORA_problem.cpp:616-618`)."""
    import jax.numpy as jnp

    from cora_tpu.ops.quadratic import jacobi_diagonal

    diag = jacobi_diagonal(pd)
    inv_diag = jnp.where(diag > 0, 1.0 / diag, 1.0)[:, None]
    return PrecondOp(_diag_fn, inv_diag, pd)


def block_jacobi_preconditioner(pd: ProblemData, eps: float = 1e-3) -> Callable:
    """Batched d×d rotation-block diagonal of Q11, plus scalar rows.

    A strictly stronger diagonal approximation than Jacobi that stays
    embarrassingly parallel: the d×d diagonal blocks of the rotation
    connection Laplacian + TᵀΩT are inverted in a batch on device.
    """
    import jax
    import jax.numpy as jnp

    from cora_tpu.ops.quadratic import _segsum, jacobi_diagonal

    d, n = pd.d, pd.n
    dt = pd.dtype()

    # rotation-block diagonal: degree * I + Σ_e τ_e t_e t_eᵀ (from-pose only)
    deg = jnp.zeros((n,), dt)
    if pd.num_rot_edges:
        deg = deg + _segsum(pd.rot_kappa, pd.rot_i, n, pd.chain_rot)
        deg = deg + _segsum(pd.rot_kappa, pd.rot_j, n)
    blocks = deg[:, None, None] * jnp.eye(d, dtype=dt)
    if pd.num_pose_meas:
        outer = pd.pm_tau[:, None, None] * (
            pd.pm_t[:, :, None] * pd.pm_t[:, None, :]
        )
        blocks = blocks + _segsum(outer, pd.pm_ti, n, pd.chain_pm)
    blocks = blocks + eps * jnp.eye(d, dtype=dt)
    inv_blocks = jnp.linalg.inv(blocks)  # (n, d, d)

    diag = jacobi_diagonal(pd)
    scalar_part = diag[pd.rot_size:]
    inv_scalar = jnp.where(scalar_part > 0, 1.0 / (scalar_part + eps), 1.0)[:, None]
    return PrecondOp(
        _block_jacobi_fn,
        {"inv_blocks": inv_blocks, "inv_scalar": inv_scalar},
        pd,
    )
