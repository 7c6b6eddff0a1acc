"""The data-matrix operator ``Y ↦ QY`` — the hot path of everything.

The reference computes this as a generic sparse row-major SpMM
(`src/CORA_problem.cpp:742-757`). Here Q stays in factored edge form and
QY is computed directly from the measurement model:

With Y split into rotation rows Yrot (n,d,r), unit-bearing rows Ysph
(m,r) and translation rows Ytr (n+l,r):

  pose edge e=(i,j):   u_e = t_j − t_i − t_eᵀ Y_i           (residual op)
    (QY)_rot[i] += κ_e (Y_i − R_e Y_j)                     (conn. Laplacian)
    (QY)_rot[j] += κ_e (Y_j − R_eᵀ Y_i)
    (QY)_rot[i] += −t_e ⊗ (τ_e u_e)
    (QY)_tr[j]  += τ_e u_e ;  (QY)_tr[i] −= τ_e u_e
  range edge e=(i,j):  v_e = r_e y_e + t_j − t_i
    (QY)_sph[e]  = ω_e r_e v_e
    (QY)_tr[j]  += ω_e v_e ;  (QY)_tr[i] −= ω_e v_e

This is algebraically identical to the blocked Q of
`CORA_problem.h:147-183` (validated against the reference's DataMatrix
fixtures in tests/test_operators.py) but maps onto TPU as batched small
GEMMs + segment-sums, which XLA fuses into a handful of kernels. For
pure odometry chains (every reference dataset) the gathers degenerate to
static slices — no scatter/gather at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cora_tpu.ops.linalg import bmm, bmm_T

from cora_tpu.graph.data import ProblemData


def _segsum(x, idx, num, sorted_hint=False):
    return jax.ops.segment_sum(
        x, idx, num_segments=num, indices_are_sorted=sorted_hint
    )


def split_state(pd: ProblemData, Y: jax.Array):
    """(N, r) → (Yrot (n,d,r), Ysph (m,r), Ytr (n+l,r))."""
    r = Y.shape[1]
    nd = pd.rot_size
    Yrot = Y[:nd].reshape(pd.n, pd.d, r)
    Ysph = Y[nd:nd + pd.m]
    Ytr = Y[nd + pd.m:]
    return Yrot, Ysph, Ytr


def join_state(pd: ProblemData, Yrot, Ysph, Ytr) -> jax.Array:
    r = Ysph.shape[-1] if pd.m else Yrot.shape[-1] if pd.n else Ytr.shape[-1]
    return jnp.concatenate([Yrot.reshape(pd.rot_size, r), Ysph, Ytr], axis=0)


def _chain_pad(x_head, n):
    """Scatter edge contributions of a chain (i→i+1) without gathers."""
    # x_head has length n-1 and accumulates onto nodes 0..n-2 (or 1..n-1)
    zeros = jnp.zeros_like(x_head[:1])
    return jnp.concatenate([x_head, zeros], axis=0), jnp.concatenate([zeros, x_head], axis=0)


def data_matrix_product(pd: ProblemData, Y: jax.Array) -> jax.Array:
    """Explicit-formulation product QY for Y of shape (N, r)."""
    r = Y.shape[1]
    Yrot, Ysph, Ytr = split_state(pd, Y)

    out_rot = jnp.zeros_like(Yrot)
    out_tr = jnp.zeros_like(Ytr)

    # ---- rotation connection Laplacian ----
    if pd.num_rot_edges:
        if pd.chain_rot:
            Yi, Yj = Yrot[:-1], Yrot[1:]
        else:
            Yi, Yj = Yrot[pd.rot_i], Yrot[pd.rot_j]
        k = pd.rot_kappa[:, None, None]
        RYj = bmm(pd.rot_R, Yj)
        RtYi = bmm_T(pd.rot_R, Yi)
        ci = k * (Yi - RYj)
        cj = k * (Yj - RtYi)
        if pd.chain_rot:
            a, b = _chain_pad(ci, pd.n)[0], _chain_pad(cj, pd.n)[1]
            out_rot = out_rot + a + b
        else:
            out_rot = out_rot + _segsum(ci, pd.rot_i, pd.n, True)
            out_rot = out_rot + _segsum(cj, pd.rot_j, pd.n)

    # ---- translational (pose) measurements: T' Ωt T / T' Ωt At / At' Ωt At ----
    if pd.num_pose_meas:
        if pd.chain_pm:
            Yci = Yrot[:-1]
            du = Ytr[1:pd.n] - Ytr[:pd.n - 1]
        else:
            Yci = Yrot[pd.pm_ti]  # from-state is always a pose: valid rot index
            du = Ytr[pd.pm_tj] - Ytr[pd.pm_ti]
        u = du - jnp.sum(pd.pm_t[:, :, None] * Yci, axis=1)
        w = pd.pm_tau[:, None] * u
        contrib_rot = -pd.pm_t[:, :, None] * w[:, None, :]  # (E,d,r) outer products
        if pd.chain_pm:
            out_rot = out_rot.at[: pd.n - 1].add(contrib_rot)
            wpad_lo, wpad_hi = _chain_pad(w, pd.n)
            pad_l = jnp.zeros((pd.l, r), w.dtype)
            out_tr = out_tr + jnp.concatenate([wpad_hi - wpad_lo, pad_l], axis=0)
        else:
            out_rot = out_rot + _segsum(contrib_rot, pd.pm_ti, pd.n, True)
            out_tr = out_tr + _segsum(w, pd.pm_tj, pd.num_translations)
            out_tr = out_tr - _segsum(w, pd.pm_ti, pd.num_translations, True)

    # ---- range measurements ----
    if pd.m:
        v = pd.rng_r[:, None] * Ysph + Ytr[pd.rng_tj] - Ytr[pd.rng_ti]
        wr = pd.rng_omega[:, None] * v
        out_sph = pd.rng_r[:, None] * wr
        out_tr = out_tr + _segsum(wr, pd.rng_tj, pd.num_translations)
        out_tr = out_tr - _segsum(wr, pd.rng_ti, pd.num_translations)
    else:
        out_sph = Ysph

    return join_state(pd, out_rot, out_sph, out_tr)


def evaluate_objective(pd: ProblemData, Y: jax.Array) -> jax.Array:
    """f(Y) = ½ tr(Yᵀ Q Y) (reference `CORA_problem.cpp:759-762`)."""
    return 0.5 * jnp.vdot(Y, data_matrix_product(pd, Y))


def euclidean_gradient(pd: ProblemData, Y: jax.Array) -> jax.Array:
    """∇F(Y) = QY (reference `CORA_problem.cpp:764-770`)."""
    return data_matrix_product(pd, Y)


def jacobi_diagonal(pd: ProblemData) -> jax.Array:
    """diag(Q) as an (N,) vector, computed from the factored form.

    Used by the Jacobi preconditioner (reference `CORA_problem.cpp:616-618`)
    and by the block-Jacobi variant.
    """
    # rotation rows: conn-Laplacian diagonal κ per incident edge (each edge
    # adds κ to all d rows of both endpoint blocks) + T'ΩtT diagonal:
    # for edge e from pose i, adds τ_e * t_e[k]^2 to row (i*d + k)
    diag_rot = jnp.zeros((pd.n, pd.d), dtype=pd.dtype())
    if pd.num_rot_edges:
        k = pd.rot_kappa[:, None] * jnp.ones((1, pd.d), dtype=pd.dtype())
        diag_rot = diag_rot + _segsum(k, pd.rot_i, pd.n, pd.chain_rot)
        diag_rot = diag_rot + _segsum(k, pd.rot_j, pd.n)
    if pd.num_pose_meas:
        tsq = pd.pm_tau[:, None] * pd.pm_t ** 2
        diag_rot = diag_rot + _segsum(tsq, pd.pm_ti, pd.n, pd.chain_pm)

    # sphere rows: ω_e r_e²
    diag_sph = pd.rng_omega * pd.rng_r ** 2

    # translation rows: Laplacian degrees
    diag_tr = jnp.zeros((pd.num_translations,), dtype=pd.dtype())
    if pd.num_pose_meas:
        diag_tr = diag_tr + _segsum(pd.pm_tau, pd.pm_ti, pd.num_translations, pd.chain_pm)
        diag_tr = diag_tr + _segsum(pd.pm_tau, pd.pm_tj, pd.num_translations)
    if pd.m:
        diag_tr = diag_tr + _segsum(pd.rng_omega, pd.rng_ti, pd.num_translations)
        diag_tr = diag_tr + _segsum(pd.rng_omega, pd.rng_tj, pd.num_translations)

    return jnp.concatenate([diag_rot.reshape(-1), diag_sph, diag_tr])
