"""Problem formulations: translation-explicit and translation-implicit.

The implicit (marginalized) formulation (reference
`fillImplicitFormulationMatrices` / `dataMatrixProduct`,
`src/CORA_problem.cpp:714-757`) eliminates the translational states
analytically: with Q partitioned as

    [ Qmain  B  ]        Qmain: rotation+sphere block (dn+m)
    [ Bᵀ     L  ]        L: translation Laplacian (n+l), last state pinned

the reduced operator is  Q̃Y = Qmain·Y − B·L⁻¹·Bᵀ·Y  on states of height
dn+m, and translations are recovered as t = −L⁻¹·Bᵀ·Y
(`getTranslationExplicitSolution`, `CORA_problem.cpp:1168-1197`).

TPU-native realization: both Qmain·Y + Bᵀ·Y and B·v fall out of the
*factored explicit operator* applied to zero-padded states (no separate
sparse matrices), and L⁻¹ is the same banded-Cholesky + Woodbury
machinery as the preconditioner (`cora_tpu.precond.banded`), applied on
device via associative scans. The reference's per-product CHOLMOD
triangular solve becomes a log-depth batched recurrence.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from cora_tpu.graph.data import ProblemData


BW_CAP_LRED = 512  # pathological non-banded graphs are rejected


def _lred_factor(problem, pd: ProblemData):
    """Factor the reduced translation Laplacian L (last state pinned).

    Pose-translation nodes form the band under a reverse Cuthill–McKee
    ordering of their coupling graph (odometry chains + pose↔pose range
    edges; RCM interleaves multi-robot chains so inter-robot couplings
    land near the diagonal — the CHOLMOD-ordering analog of the
    reference, `src/CORA_problem.cpp:714-757`); landmark columns are
    high-degree Woodbury spikes. Returns a host factor for the device
    apply (v ↦ L⁻¹v) on (n+l−1)-row blocks. This is a *direct solver*
    (the implicit formulation needs exactness), so the band is factored
    with `require_exact` and graphs beyond `BW_CAP_LRED` are rejected.
    """
    import scipy.sparse.csgraph as csgraph

    from cora_tpu.precond import banded as bd

    n_tr = pd.num_translations
    Q = problem.data_matrix()
    off = pd.rot_range_size
    L = Q[off:, off:].tocsr()[: n_tr - 1, : n_tr - 1].tocsr()

    n_band = min(pd.n, n_tr - 1)  # pose translations in the band
    l_sp = (n_tr - 1) - n_band  # remaining landmarks as spikes

    # fill-reducing ordering of the pose-translation coupling graph
    A = L[:n_band, :n_band]
    order = (
        np.asarray(
            csgraph.reverse_cuthill_mckee(A.tocsr(), symmetric_mode=True),
            dtype=np.int64,
        )
        if n_band
        else np.zeros(0, dtype=np.int64)
    )
    B_band = A[order][:, order].tocsr()
    C = L[order, n_band:].toarray() if l_sp else np.zeros((n_band, 0))
    E = L[n_band:, n_band:].toarray() if l_sp else np.zeros((0, 0))

    coo = sp.tril(B_band).tocoo()
    bw = int((coo.row - coo.col).max()) if coo.nnz else 0
    if bw > BW_CAP_LRED:
        raise NotImplementedError(
            "translation Laplacian is not banded even under the RCM "
            f"ordering (bandwidth {bw} > {BW_CAP_LRED}); the implicit "
            "formulation requires banded+spikes structure"
        )
    w = max(2 * (bw + 1), 2)
    Lc, Mc, Linv, BinvC, n_dropped, _cb = bd.banded_spd_factor(
        B_band, C, bw, w, require_exact=True
    )
    if l_sp:
        cap = E - C.T @ BinvC
        cap_chol = np.linalg.cholesky(0.5 * (cap + cap.T))
        cap_inv = np.linalg.inv(cap_chol.T) @ np.linalg.inv(cap_chol)
    else:
        cap_inv = np.zeros((0, 0))

    perm = np.concatenate([order, np.arange(n_band, n_tr - 1)])
    inv_perm = np.empty(n_tr - 1, dtype=np.int64)
    inv_perm[perm] = np.arange(n_tr - 1)
    return bd.BandedFactorHost(
        q=w, n_blocks=Lc.shape[0], band_len=n_band,
        perm=perm, inv_perm=inv_perm,
        L=Lc, M=Mc, Linv=Linv, s_sph=np.zeros(0),
        BinvC=BinvC, cap_inv=cap_inv, C=C, E=E,
        n_dropped=n_dropped, lam=0.0,
    )


def _make_lred_apply(F, dtype):
    """Device solve v ↦ L⁻¹ v for the reduced translation Laplacian."""
    import jax.numpy as jnp
    from jax import lax

    n, q = F.n_blocks, F.q
    nb_len = F.band_len
    Linv = jnp.asarray(F.Linv, dtype)
    LinvT = jnp.asarray(np.swapaxes(F.Linv, 1, 2), dtype)
    A_fwd = jnp.asarray(-np.einsum("nab,nbc->nac", F.Linv, F.M), dtype)
    Mshift = np.zeros_like(F.M)
    if n > 1:
        Mshift[:-1] = np.swapaxes(F.M[1:], 1, 2)
    A_bwd = jnp.asarray(
        -np.einsum("nab,nbc->nac", np.swapaxes(F.Linv, 1, 2), Mshift), dtype
    )
    BinvC = jnp.asarray(F.BinvC, dtype)
    cap_inv = jnp.asarray(F.cap_inv, dtype)
    C = jnp.asarray(F.C, dtype)
    l_sp = F.C.shape[1]

    from cora_tpu.ops.linalg import bmm

    def _affine_scan(A, c, reverse=False):
        def combine(x, y):
            A1, b1 = x
            A2, b2 = y
            return bmm(A2, A1), bmm(A2, b1) + b2

        _, bs = lax.associative_scan(combine, (A, c), axis=0, reverse=reverse)
        return bs

    def solve_band(b):
        if n == 0:
            return b
        r = b.shape[1]
        pad = jnp.zeros((n * q - nb_len, r), b.dtype)
        bb = jnp.concatenate([b, pad], axis=0).reshape(n, q, r)
        u = _affine_scan(A_fwd, bmm(Linv, bb))
        x = _affine_scan(A_bwd, bmm(LinvT, u), reverse=True)
        return x.reshape(n * q, r)[:nb_len]

    perm = jnp.asarray(F.perm)

    def apply(v):  # v: (n_tr - 1, r)
        v = v[perm]  # RCM band order (landmark tail unchanged)
        rhs_b, rhs_lm = v[:nb_len], v[nb_len:]
        y1 = solve_band(rhs_b)
        if l_sp:
            y2 = bmm(cap_inv, rhs_lm - bmm(C.T, y1))
            x = jnp.concatenate([y1 - bmm(BinvC, y2), y2], axis=0)
        else:
            x = jnp.concatenate([y1, rhs_lm], axis=0)
        return jnp.zeros_like(x).at[perm].set(x)

    return apply


class ImplicitOperators:
    """Marginalized quadratic-form operator and translation recovery.

    `full_product` overrides the full-height explicit product Q·Z — the
    mesh-distributed solve passes the edge-sharded operator here
    (`cora_tpu.parallel.sharding`), so the marginalized products ride the
    same psum-per-application path while the banded L⁻¹ apply stays
    replicated math (it is a host-factored direct solve)."""

    def __init__(self, problem, pd: ProblemData, dtype=None,
                 full_product=None):
        self.pd = pd
        dtype = dtype or pd.dtype()
        self._lred_solve = _make_lred_apply(_lred_factor(problem, pd), dtype)
        self._dtype = dtype
        if full_product is None:
            from cora_tpu.ops.quadratic import data_matrix_product

            def full_product(Z, _pd=pd):
                return data_matrix_product(_pd, Z)

        self._full = full_product

    def _bt_y(self, Y):
        """[Qmain·Y ; Bᵀ·Y] via the explicit factored operator on [Y; 0]."""
        pd = self.pd
        pad = jnp.zeros((pd.num_translations, Y.shape[1]), Y.dtype)
        full = self._full(jnp.concatenate([Y, pad], axis=0))
        return full[: pd.rot_range_size], full[pd.rot_range_size:]

    def _b_v(self, v_red):
        """B·v via the explicit operator on [0; v] (v lifted, pinned row 0)."""
        pd = self.pd
        v_full = jnp.concatenate(
            [v_red, jnp.zeros((1, v_red.shape[1]), v_red.dtype)], axis=0
        )
        zero_top = jnp.zeros((pd.rot_range_size, v_red.shape[1]), v_red.dtype)
        full = self._full(jnp.concatenate([zero_top, v_full], axis=0))
        return full[: pd.rot_range_size]

    def product(self, Y):
        """Q̃·Y = Qmain·Y − B·L⁻¹·Bᵀ·Y (reference `dataMatrixProduct`)."""
        top, bt = self._bt_y(Y)
        v = self._lred_solve(bt[:-1])
        return top - self._b_v(v)

    def translation_explicit_solution(self, Y):
        """Recover the full explicit state [Y; t] with t = −L⁻¹BᵀY and the
        pinned translation at zero (reference `CORA_problem.cpp:1168-1197`)."""
        _, bt = self._bt_y(Y)
        t = -self._lred_solve(bt[:-1])
        zero = jnp.zeros((1, Y.shape[1]), Y.dtype)
        return jnp.concatenate([Y, t, zero], axis=0)


def make_operator(problem, pd: ProblemData, formulation, dtype=None,
                  full_product=None) -> Callable:
    """The quadratic-form operator for the requested formulation."""
    from cora_tpu.types import Formulation

    if formulation == Formulation.EXPLICIT:
        from cora_tpu.ops.quadratic import data_matrix_product

        def op(Y):
            return data_matrix_product(pd, Y)

        op.implicit = None
        return op

    impl = ImplicitOperators(problem, pd, dtype, full_product=full_product)

    def op(Y):
        return impl.product(Y)

    op.implicit = impl
    return op
