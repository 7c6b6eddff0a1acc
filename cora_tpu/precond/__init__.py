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

from typing import Callable

import numpy as np

from cora_tpu.graph.data import ProblemData
from cora_tpu.types import Preconditioner


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


def identity_preconditioner() -> Callable:
    def apply(V):
        return V

    return apply


def jacobi_preconditioner(pd: ProblemData) -> Callable:
    """P = diag(Q)^{-1} (reference `CORA_problem.cpp:616-618`)."""
    import jax.numpy as jnp

    from cora_tpu.ops.quadratic import jacobi_diagonal

    diag = jacobi_diagonal(pd)
    inv_diag = jnp.where(diag > 0, 1.0 / diag, 1.0)[:, None]

    def apply(V):
        return inv_diag * V

    return apply


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

    def apply(V):
        r = V.shape[1]
        Vrot = V[: pd.rot_size].reshape(n, d, r)
        from cora_tpu.ops.linalg import bmm

        Prot = bmm(inv_blocks, Vrot)
        return jnp.concatenate(
            [Prot.reshape(pd.rot_size, r), inv_scalar * V[pd.rot_size:]], axis=0
        )

    return apply
