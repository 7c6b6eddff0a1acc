"""Pose-pair tile layout for the fused Pallas tCG kernel.

TPU-native hot-loop design (round 4): the per-iteration cost of the tCG
inner loop on (N, r) canonical state is kernel-dispatch-bound (~26 us
per op dispatch inside a device loop, (N,4) operands use ~3% of VPU
lanes). This module re-lays the state out so that the ENTIRE tCG loop
runs inside one Pallas kernel with every operand resident in VMEM:

  * Pose tile  P[(p*q + a)*r + j, c]  with q = d+1, lane c = pose-PAIR
    index, parity p in {0,1} (pose g = 2c+p), a < d a rotation row,
    a == d the translation row, j the rank column. Lanes ride the
    128-wide vector axis; a chain edge (g, g+1) is a lane roll.
  * Sphere tile S[(p*Smax + s)*r + j, c]: range measurements of pose g
    in "slots"; the unit-bearing variable of the s-th range of pose g.
  * Landmark tile L[j, k] (r, 128): landmark translations.

All per-pose algebra (rotation-block products, Stiefel/Oblique tangent
projections, Weingarten terms) becomes r-row "group" slices times
(1, n_pad) coefficient rows; the banded preconditioner solve becomes a
log-depth doubling scan whose per-level block propagators are
precomputed host-side (`factor_banded`, identity pose ordering).

Every function here is written as pure jnp on arrays with the lane-roll
operation passed in, so the SAME code runs (a) as an XLA/CPU reference
under tests and (b) inside the Pallas kernel (`cora_tpu.ops.pallas_tcg`)
with `pltpu.roll`.

Reference hot loop being accelerated: `src/CORA_problem.cpp:742-867`
(data-matrix product + Riemannian Hessian), `src/CORA_preconditioners.cpp:46-83`
(block-Cholesky solves) inside the vendored TNT tCG iteration.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from cora_tpu.graph.data import ProblemData

LANES = 128
S_MAX = 8  # max range slots per pose the kernel supports
L_MAX = 16  # max landmarks (each adds O(S) group-ops per Hv)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# plan
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TilePlan:
    """Static layout metadata + host-built constant tiles (numpy f32)."""

    d: int
    q: int  # d + 1
    w: int  # scan block rows = 2q (one pose pair)
    r: int  # rank (static per staircase level)
    n: int  # poses
    nb: int  # pose pairs = ceil(n/2)
    n_pad: int  # lanes (nb rounded up to 128)
    S: int  # sphere slots per pose
    l: int  # landmarks
    m: int  # ranges
    N: int  # canonical state height
    levels: int  # doubling-scan levels = ceil(log2(nb))
    lam: float  # preconditioner regularization actually used
    const: dict  # name -> np.ndarray (2D, lanes last) constant tiles
    # conversion index arrays (host numpy)
    col_idx: np.ndarray  # (2q, n_pad) canonical row of pose group e, lane c
    col_mask: np.ndarray  # (2q, n_pad) 1.0 where valid
    sph_idx: np.ndarray  # (2S, n_pad) canonical row of sphere slot
    sph_mask: np.ndarray  # (2S, n_pad)
    lm_idx: np.ndarray  # (l,) canonical rows of landmarks

    @property
    def shapes(self):
        return dict(
            P=(2 * self.q * self.r, self.n_pad),
            S=(2 * self.S * self.r, self.n_pad),
            L=(max(self.r, 8), LANES),
        )


def plan_supported(pd: ProblemData) -> str | None:
    """None if the fused-kernel layout covers this problem, else a reason.

    Coverage: (masked-)chain graphs — every rel-pose edge connects pose i
    to i+1 (per-robot odometry chains; all reference datasets except
    mrclam's inter-robot ranges), ranges go pose -> landmark, bounded
    slots/landmarks.
    """
    if pd.d not in (2, 3):
        return f"d={pd.d} unsupported"
    if pd.n < 2:
        return "fewer than 2 poses"
    rot_i = np.asarray(pd.rot_i)
    rot_j = np.asarray(pd.rot_j)
    if pd.num_rot_edges:
        if not (rot_j == rot_i + 1).all():
            return "non-chain rotation edge"
        if len(np.unique(rot_i)) != len(rot_i):
            return "duplicate rotation chain edge"
    pm_ti = np.asarray(pd.pm_ti)
    pm_tj = np.asarray(pd.pm_tj)
    if pd.num_pose_meas:
        if not ((pm_tj == pm_ti + 1) & (pm_ti < pd.n) & (pm_tj < pd.n)).all():
            return "non-chain translational measurement"
        if len(np.unique(pm_ti)) != len(pm_ti):
            return "duplicate translational chain edge"
    if pd.m:
        ti = np.asarray(pd.rng_ti)
        tj = np.asarray(pd.rng_tj)
        if not (ti < pd.n).all():
            return "range from non-pose"
        if not (tj >= pd.n).all():
            return "pose-to-pose range"
        slots = np.bincount(ti, minlength=pd.n).max()
        if slots > S_MAX:
            return f"{slots} ranges on one pose (> {S_MAX})"
    if pd.l > L_MAX:
        return f"{pd.l} landmarks (> {L_MAX})"
    return None


def build_tile_plan(
    problem, pd: ProblemData, rank: int, max_cond: float = 1e6,
    lam: float | None = None, dtype=np.float32,
) -> TilePlan:
    """Build the full constant-tile bundle for one (problem, rank).

    The banded preconditioner factor is rebuilt with the IDENTITY pose
    ordering (chains are already banded; the kernel's lane order must
    match the band order), λ = ‖Q‖₂/(κ−1) exactly as the XLA
    RegularizedCholesky path (reference `CORA_problem.cpp:590-591`).
    """
    from cora_tpu.precond.banded import (
        banded_spd_factor,
        build_permutation,
        estimate_spectral_norm,
        factor_banded,
    )
    import scipy.sparse as sp

    reason = plan_supported(pd)
    if reason is not None:
        raise ValueError(f"tile plan unsupported: {reason}")

    d, n, l, m = pd.d, pd.n, pd.l, pd.m
    q, w, r = d + 1, 2 * (d + 1), int(rank)
    nb = (n + 1) // 2
    n_pad = _round_up(max(nb, 1), LANES)
    ti = np.asarray(pd.rng_ti)
    S = int(np.bincount(ti, minlength=n).max()) if m else 1
    S = max(S, 1)
    levels = max(int(math.ceil(math.log2(nb))), 0) if nb > 1 else 0
    N = pd.size

    f = lambda x: np.asarray(x, np.float64)  # noqa: E731
    const: dict[str, np.ndarray] = {}

    def rows(nrows):
        return np.zeros((nrows, n_pad), np.float64)

    # ---- chain edge coefficients (edge at pose g = 2c+p) ----
    kap = rows(2)
    Rt = np.zeros((2 * d * d, n_pad), np.float64)
    tau = rows(2)
    tvec = np.zeros((2 * d, n_pad), np.float64)
    if pd.num_rot_edges:
        g = np.asarray(pd.rot_i)
        p, c = g % 2, g // 2
        kap[p, c] = f(pd.rot_kappa)
        R = f(pd.rot_R)  # (E, d, d)
        for a in range(d):
            for b in range(d):
                Rt[p * d * d + a * d + b, c] = R[:, a, b]
    if pd.num_pose_meas:
        g = pm_g = np.asarray(pd.pm_ti)
        p, c = g % 2, g // 2
        tau[p, c] = f(pd.pm_tau)
        t = f(pd.pm_t)
        for a in range(d):
            tvec[p * d + a, c] = t[:, a]
    const["kap"], const["R"], const["tau"], const["tvec"] = kap, Rt, tau, tvec

    # ---- range slots ----
    rr = rows(2 * S)
    om = rows(2 * S)
    lmsel = np.zeros((2 * S * max(l, 1), n_pad), np.float64)
    sph_idx = np.full((2 * S, n_pad), N, np.int64)
    if m:
        order = np.argsort(ti, kind="stable")
        slot_of = np.zeros(m, np.int64)
        counts: dict[int, int] = {}
        for e in order:
            pe = int(ti[e])
            slot_of[e] = counts.get(pe, 0)
            counts[pe] = counts.get(pe, 0) + 1
        tj = np.asarray(pd.rng_tj)
        p, c = ti % 2, ti // 2
        srow = p * S + slot_of
        rr[srow, c] = f(pd.rng_r)
        om[srow, c] = f(pd.rng_omega)
        k_lm = tj - n  # landmark index
        lmsel[srow * max(l, 1) + k_lm, c] = 1.0
        sph_idx[srow, c] = n * d + np.arange(m)
    const["rr"], const["om"], const["lmsel"] = rr, om, lmsel

    # ---- banded preconditioner factor, identity pose ordering ----
    Q = problem.data_matrix()
    Qnorm = estimate_spectral_norm(Q)
    if lam is None:
        lam = Qnorm / (max_cond - 1.0)
    F = factor_banded(None, pd, Q, lam, order=np.arange(n, dtype=np.int64))
    if F.q != w:
        raise ValueError(f"factor block {F.q} != pose-pair width {w}")
    if F.n_blocks != nb and F.n_blocks != 0:
        raise ValueError(f"factor blocks {F.n_blocks} != pairs {nb}")

    def blocks_to_tile(Bk):  # (nb, w, w) -> (w*w, n_pad)
        t = np.zeros((w * w, n_pad), np.float64)
        t[:, :Bk.shape[0]] = Bk.transpose(1, 2, 0).reshape(w * w, -1)
        return t

    Linv = F.Linv  # (nb, w, w)
    LinvT = np.swapaxes(Linv, 1, 2)
    A_fwd = -np.einsum("nab,nbc->nac", Linv, F.M)
    const["Linv"] = blocks_to_tile(Linv)
    const["LinvT"] = blocks_to_tile(LinvT)

    def scan_levels(A):
        # 3D (levels, w*w, n_pad): level k is dynamically indexed on the
        # LEADING dim inside the kernel's level fori_loop (dynamic
        # sublane offsets would need 8-alignment Mosaic can't prove)
        out = np.zeros((max(levels, 1), w * w, n_pad), np.float64)
        Ak = A.copy()
        for k in range(levels):
            s = 1 << k
            Az = Ak.copy()
            Az[:s] = 0.0
            out[k] = blocks_to_tile(Az)
            if s < nb:
                An = Ak.copy()
                An[s:] = np.einsum("nab,nbc->nac", Ak[s:], Ak[:nb - s])
                Ak = An
        return out

    # forward-substitution doubling propagators ONLY: the backward
    # (L^T) solve is evaluated as the EXACT ADJOINT of the forward
    # network, so the preconditioner is symmetric PSD by construction
    # (P = (L̃^{-1})^T L̃^{-1}) regardless of storage rounding, and the
    # AB tile bundle disappears (half the constant VMEM)
    const["AF"] = scan_levels(A_fwd)
    scanmask = np.zeros((max(levels, 1), 1, n_pad), np.float64)
    for k in range(levels):
        scanmask[k, 0, :max(nb - (1 << k), 0)] = 1.0
    const["scanmask"] = scanmask

    # sphere pivots + coupling values in slot layout
    spiv_inv = rows(2 * S)
    cval = rows(2 * S)
    if m:
        p, c = ti % 2, ti // 2
        srow = p * S + slot_of
        spiv_inv[srow, c] = 1.0 / F.s_sph
        cval[srow, c] = f(pd.rng_omega) * f(pd.rng_r)
    const["spiv_inv"], const["cval"] = spiv_inv, cval

    # Woodbury landmark columns: band order == pair layout rows
    Ct = np.zeros((w * max(l, 1), n_pad), np.float64)
    BinvCt = np.zeros((w * max(l, 1), n_pad), np.float64)
    if l:
        nq = F.band_len
        for k in range(l):
            col = np.zeros(nb * w)
            col[:nq] = F.C[:, k]
            Ct[k * w:(k + 1) * w, :nb] = col.reshape(nb, w).T
            col[:nq] = F.BinvC[:, k]
            BinvCt[k * w:(k + 1) * w, :nb] = col.reshape(nb, w).T
    const["C"], const["BinvC"] = Ct, BinvCt
    capinv = np.zeros((max(l, 1), max(l, 1)), np.float64)
    if l:
        capinv[:l, :l] = F.cap_inv
    const["capinv"] = capinv  # small (l, l) — goes to SMEM params
    # one-hot lane rows for landmark-column writes (Pallas TPU has no
    # scatter: column k updates become `col * lmhot[k]` broadcasts)
    lmhot = np.zeros((max(l, 1), LANES), np.float64)
    for k in range(l):
        lmhot[k, k] = 1.0
    const["lmhot"] = lmhot

    # ---- conversion index maps ----
    g = np.arange(2 * n_pad).reshape(n_pad, 2).T  # g[p, c] = 2c + p
    col_idx = np.full((2 * q, n_pad), N, np.int64)
    for p in range(2):
        for a in range(q):
            gi = g[p]
            valid = gi < n
            rowsrc = np.where(
                a < d, gi * d + a, n * d + m + gi
            )
            col_idx[p * q + a, valid] = rowsrc[valid]
    col_mask = (col_idx < N).astype(np.float64)
    sph_mask = (sph_idx < N).astype(np.float64)
    lm_idx = n * d + m + n + np.arange(l)

    cast = {k: v.astype(dtype) for k, v in const.items()}
    return TilePlan(
        d=d, q=q, w=w, r=r, n=n, nb=nb, n_pad=n_pad, S=S, l=l, m=m, N=N,
        levels=levels, lam=float(lam), const=cast,
        col_idx=col_idx, col_mask=col_mask.astype(dtype),
        sph_idx=sph_idx, sph_mask=sph_mask.astype(dtype), lm_idx=lm_idx,
    )


# ---------------------------------------------------------------------------
# canonical (N, r) <-> tiles  (XLA-side, once per tCG solve)
# ---------------------------------------------------------------------------


def to_tiles(plan: TilePlan, Y):
    """Canonical (N, r) state -> (P, S, L) tiles."""
    import jax.numpy as jnp

    r = plan.r
    Yt = Y.T  # (r, N)

    def gather(idx, mask):
        idx_c = jnp.asarray(np.minimum(idx, plan.N - 1))
        vals = Yt[:, idx_c]  # (r, rows, n_pad)
        vals = vals * jnp.asarray(mask)[None]
        return vals.transpose(1, 0, 2).reshape(idx.shape[0] * r, idx.shape[1])

    P = gather(plan.col_idx, plan.col_mask)
    S = gather(plan.sph_idx, plan.sph_mask)
    L = jnp.zeros((max(r, 8), LANES), Y.dtype)
    if plan.l:
        L = L.at[:r, :plan.l].set(Yt[:, jnp.asarray(plan.lm_idx)])
    return P, S, L


def from_tiles(plan: TilePlan, P, S, L):
    """(P, S, L) tiles -> canonical (N, r) state."""
    import jax.numpy as jnp

    r = plan.r
    out = jnp.zeros((r, plan.N + 1), P.dtype)

    def scatter(out, tile, idx):
        vals = tile.reshape(idx.shape[0], r, idx.shape[1]).transpose(1, 0, 2)
        idx_s = jnp.asarray(np.minimum(idx, plan.N))  # sentinel row N drops
        return out.at[:, idx_s].set(vals, mode="drop")

    out = scatter(out, P, plan.col_idx)
    out = scatter(out, S, plan.sph_idx)
    if plan.l:
        out = out.at[:, jnp.asarray(plan.lm_idx)].set(L[:r, :plan.l])
    return out[:, :plan.N].T


# ---------------------------------------------------------------------------
# tile math — pure jnp, lane-roll passed in, identical in-kernel and on host
# ---------------------------------------------------------------------------
# Convention: C is the constants mapping (arrays or Pallas refs — both
# support row slicing), tiles are VALUES (2q*r, n_pad)/(2S*r, n_pad)/(r?,128),
# `roll(x, s)` implements np.roll along lanes (axis=1).


def _row(Carr, i):
    return Carr[i:i + 1, :]


def _grp(T, e, r):
    return T[e * r:(e + 1) * r, :]


class TileOps:
    """All hot-loop math on the tile layout.

    Instantiated with static plan metadata and the constants mapping;
    methods are pure functions of tile values (safe inside jit, Pallas
    kernels, and lax.while_loop bodies). `dynrow` reads one coefficient
    row at a TRACED index (host: dynamic_slice; kernel: ref `pl.ds`).
    """

    def __init__(self, plan: TilePlan, C, roll, jnp, dynrow=None):
        self.plan = plan
        self.C = C
        self.roll = roll
        self.jnp = jnp
        if dynrow is None:
            import jax.lax as _lax

            def dynrow(arr, i):
                # dynamic LEADING-dim index of a 3D constant -> 2D block
                return _lax.dynamic_index_in_dim(arr, i, 0, keepdims=False)

        self.dynrow = dynrow

    # -- helpers ------------------------------------------------------------
    def rot(self, P, p, a):
        return _grp(P, p * self.plan.q + a, self.plan.r)

    def tr(self, P, p):
        return _grp(P, p * self.plan.q + self.plan.d, self.plan.r)

    def sph(self, S, p, s):
        return _grp(S, p * self.plan.S + s, self.plan.r)

    def crow(self, name, i):
        return _row(self.C[name], i)

    def _lm_cols_tile(self, cols, like):
        """Landmark columns [(r,1) per k] -> a tile shaped like `like`.

        Pallas TPU has no scatter; column writes become one-hot lane-row
        broadcasts (`lmhot` constants)."""
        jnp = self.jnp
        parts = None
        for k, c in enumerate(cols):
            t = c * self.crow("lmhot", k)  # (r, LANES)
            parts = t if parts is None else parts + t
        if parts is None:
            return jnp.zeros_like(like)
        pad = like.shape[0] - parts.shape[0]
        if pad:
            parts = jnp.concatenate(
                [parts, jnp.zeros((pad, like.shape[1]), parts.dtype)], axis=0)
        return parts

    def _edge_coefs(self, p):
        """Forward-edge coefficient rows at parity p (edge g -> g+1)."""
        d = self.plan.d
        kap = self.crow("kap", p)
        tau = self.crow("tau", p)
        R = [[self.crow("R", p * d * d + a * d + b) for b in range(d)]
             for a in range(d)]
        t = [self.crow("tvec", p * d + a) for a in range(d)]
        return kap, tau, R, t

    def _prev_row(self, name, i, p):
        """Row of the edge ENTERING parity-p poses (edge at g-1)."""
        if p == 1:
            return self.crow(name, i)  # parity-0 edge, same lane
        return self.roll(self.crow(name, i), 1)  # parity-1 edge, lane c-1

    def _next_grp(self, T, getter, p, *args):
        """State group of pose g+1 as seen from parity-p pose g."""
        if p == 0:
            return getter(T, 1, *args)
        return self.roll(getter(T, 0, *args), -1)

    def _prev_grp(self, T, getter, p, *args):
        if p == 1:
            return getter(T, 0, *args)
        return self.roll(getter(T, 1, *args), 1)

    # -- Q product ----------------------------------------------------------
    def qv(self, P, S, L):
        """(P,S,L) -> Q(P,S,L): the data-matrix product in tile form
        (reference `CORA_problem.cpp:742-757`, factored edge kernels as in
        `cora_tpu.ops.quadratic.data_matrix_product`)."""
        jnp = self.jnp
        plan = self.plan
        d, q, r, Smax, l = plan.d, plan.q, plan.r, plan.S, plan.l
        oP = [jnp.zeros_like(self.rot(P, 0, 0))] * (2 * q)
        oS = [jnp.zeros_like(self.sph(S, 0, 0))] * (2 * Smax)
        lm_cols = [None] * l

        def addP(p, a, v):
            oP[p * q + a] = oP[p * q + a] + v

        def addS(p, s, v):
            oS[p * Smax + s] = oS[p * Smax + s] + v

        for p in range(2):
            kap, tau, R, t = self._edge_coefs(p)
            rot_here = [self.rot(P, p, a) for a in range(d)]
            rot_next = [self._next_grp(P, self.rot, p, a) for a in range(d)]
            tr_here = self.tr(P, p)
            tr_next = self._next_grp(P, self.tr, p)

            # rotation connection Laplacian, outgoing side:
            #   out_rot[g] += kap * (Y_g - R Y_{g+1})
            for a in range(d):
                RYn = rot_next[0] * R[a][0]
                for b in range(1, d):
                    RYn = RYn + rot_next[b] * R[a][b]
                addP(p, a, kap * (rot_here[a] - RYn))

            # translational measurement, outgoing side:
            #   u = t_{g+1} - t_g - t_e^T Yrot_g ; w = tau u
            u = tr_next - tr_here
            for a in range(d):
                u = u - t[a] * rot_here[a]
            wv = tau * u
            for a in range(d):
                addP(p, a, -t[a] * wv)
            addP(p, d, -wv)

            # incoming side (edge at g-1 writes onto pose g):
            kapP = self._prev_row("kap", 1 - p, p)
            tauP = self._prev_row("tau", 1 - p, p)
            RP = [[self._prev_row("R", (1 - p) * d * d + a * d + b, p)
                   for b in range(d)] for a in range(d)]
            tP = [self._prev_row("tvec", (1 - p) * d + a, p) for a in range(d)]
            rot_prev = [self._prev_grp(P, self.rot, p, a) for a in range(d)]
            tr_prev = self._prev_grp(P, self.tr, p)
            #   out_rot[g] += kap_{g-1} (Y_g - R^T Y_{g-1})
            for a in range(d):
                RtY = rot_prev[0] * RP[0][a]
                for b in range(1, d):
                    RtY = RtY + rot_prev[b] * RP[b][a]
                addP(p, a, kapP * (rot_here[a] - RtY))
            #   out_tr[g] += w_{g-1}
            uP = tr_here - tr_prev
            for a in range(d):
                uP = uP - tP[a] * rot_prev[a]
            addP(p, d, tauP * uP)

            # ranges: v = r y + t_lm - t_pose
            for s in range(Smax):
                srow = p * Smax + s
                rr = self.crow("rr", srow)
                omg = self.crow("om", srow)
                y = self.sph(S, p, s)
                tlm = jnp.zeros_like(y)
                for k in range(l):
                    sel = self.crow("lmsel", srow * max(l, 1) + k)
                    tlm = tlm + sel * L[:r, k:k + 1]
                v = rr * y + tlm - tr_here
                wv = omg * v
                addS(p, s, rr * wv)
                addP(p, d, -wv)
                for k in range(l):
                    sel = self.crow("lmsel", srow * max(l, 1) + k)
                    c = jnp.sum(sel * wv, axis=1, keepdims=True)
                    lm_cols[k] = c if lm_cols[k] is None else lm_cols[k] + c

        oL = self._lm_cols_tile(lm_cols, L)
        return jnp.concatenate(oP, axis=0), jnp.concatenate(oS, axis=0), oL

    # -- inner products ------------------------------------------------------
    def dot(self, A, B):
        """⟨A, B⟩ summed over all three tiles (padding rows are zero)."""
        jnp = self.jnp
        acc = jnp.sum(A[0] * B[0]) + jnp.sum(A[1] * B[1])
        return acc + jnp.sum(A[2] * B[2])

    # -- tangent projection --------------------------------------------------
    def tangent_project(self, Y, V):
        """Blockwise projection onto T_Y (reference `CORA_problem.cpp:782-820`)."""
        jnp = self.jnp
        plan = self.plan
        d, q, r, Smax = plan.d, plan.q, plan.r, plan.S
        YP, YS, _ = Y
        VP, VS, VL = V
        oP = []
        for p in range(2):
            yr = [self.rot(YP, p, a) for a in range(d)]
            vr = [self.rot(VP, p, a) for a in range(d)]
            # sym(Y V^T)[a][b] rows then V - sym Y
            sym = [[None] * d for _ in range(d)]
            for a in range(d):
                for b in range(a, d):
                    ab = jnp.sum(yr[a] * vr[b], axis=0, keepdims=True)
                    ba = jnp.sum(yr[b] * vr[a], axis=0, keepdims=True)
                    sym[a][b] = sym[b][a] = 0.5 * (ab + ba)
            for a in range(d):
                acc = vr[a]
                for b in range(d):
                    acc = acc - sym[a][b] * yr[b]
                oP.append(acc)
            oP.append(self.tr(VP, p))
        oS = []
        for p in range(2):
            for s in range(Smax):
                y = self.sph(YS, p, s)
                v = self.sph(VS, p, s)
                inner = jnp.sum(y * v, axis=0, keepdims=True)
                oS.append(v - inner * y)
        return jnp.concatenate(oP, axis=0), jnp.concatenate(oS, axis=0), VL

    # -- Riemannian Hessian-vector product ----------------------------------
    def hvp(self, Y, nablaF, dotY):
        """Proj_TY(Q dY - Weingarten terms) (reference `CORA_problem.cpp:822-867`)."""
        jnp = self.jnp
        plan = self.plan
        d, q, r, Smax = plan.d, plan.q, plan.r, plan.S
        HP, HS, HL = self.qv(*dotY)
        YP, YS, _ = Y
        GP, GS, _ = nablaF
        dP, dS, _ = dotY
        # Stiefel: H -= sym(Y G^T) dY per pose block
        outP = []
        for p in range(2):
            yr = [self.rot(YP, p, a) for a in range(d)]
            gr = [self.rot(GP, p, a) for a in range(d)]
            dr = [self.rot(dP, p, a) for a in range(d)]
            hr = [self.rot(HP, p, a) for a in range(d)]
            sym = [[None] * d for _ in range(d)]
            for a in range(d):
                for b in range(a, d):
                    ab = jnp.sum(yr[a] * gr[b], axis=0, keepdims=True)
                    ba = jnp.sum(yr[b] * gr[a], axis=0, keepdims=True)
                    sym[a][b] = sym[b][a] = 0.5 * (ab + ba)
            for a in range(d):
                acc = hr[a]
                for b in range(d):
                    acc = acc - sym[a][b] * dr[b]
                outP.append(acc)
            outP.append(self.tr(HP, p))
        # Oblique: H_s - <g, y> dY_s per sphere row
        outS = []
        for p in range(2):
            for s in range(Smax):
                y = self.sph(YS, p, s)
                g = self.sph(GS, p, s)
                dy = self.sph(dS, p, s)
                h = self.sph(HS, p, s)
                inner = jnp.sum(g * y, axis=0, keepdims=True)
                outS.append(h - inner * dy)
        H = (jnp.concatenate(outP, axis=0), jnp.concatenate(outS, axis=0), HL)
        return self.tangent_project(Y, H)

    # -- preconditioner solve ------------------------------------------------
    def _band_matvec(self, name_or_rows, u, offset=0):
        """out[e] = sum_ein A[e, ein] * u[ein] with A rows from C[name]."""
        jnp = self.jnp
        w, r = self.plan.w, self.plan.r
        out = []
        for e in range(w):
            acc = None
            for ein in range(w):
                row = self.crow(name_or_rows, offset + e * w + ein)
                term = row * _grp(u, ein, r)
                acc = term if acc is None else acc + term
            out.append(acc)
        return jnp.concatenate(out, axis=0)

    def precon_solve(self, V):
        """(P,S,L) -> M^{-1}(P,S,L): sphere elimination -> banded doubling
        scan -> Woodbury landmark correction -> sphere back-substitution
        (mirrors `cora_tpu.precond.banded.banded_apply` exactly; the band
        order IS the pose-pair tile order)."""
        jnp = self.jnp
        plan = self.plan
        d, q, w, r, Smax, l = plan.d, plan.q, plan.w, plan.r, plan.S, plan.l
        VP, VS, VL = V

        # 1) sphere elimination: w_s = v_s / pivot; band rhs on pose
        #    translations gets +cval*w_s; landmark rhs gets -sum cval*w_s
        w_sph = []
        trc = [jnp.zeros_like(self.tr(VP, 0)), jnp.zeros_like(self.tr(VP, 1))]
        lm_corr = [None] * l
        for p in range(2):
            for s in range(Smax):
                srow = p * Smax + s
                ws = self.crow("spiv_inv", srow) * self.sph(VS, p, s)
                w_sph.append(ws)
                cw = self.crow("cval", srow) * ws
                trc[p] = trc[p] + cw
                for k in range(l):
                    sel = self.crow("lmsel", srow * max(l, 1) + k)
                    c = jnp.sum(sel * cw, axis=1, keepdims=True)
                    lm_corr[k] = c if lm_corr[k] is None else lm_corr[k] + c
        lm_rhs = VL - self._lm_cols_tile(lm_corr, VL)
        rhs = []
        for p in range(2):
            for a in range(d):
                rhs.append(self.rot(VP, p, a))
            rhs.append(self.tr(VP, p) + trc[p])
        rhs_b = jnp.concatenate(rhs, axis=0)

        y1 = self._solve_B(rhs_b)

        # 3) Woodbury landmark correction
        if l:
            z = []  # (r,) per landmark: rhs_lm - C^T y1
            for k in range(l):
                acc = None
                for e in range(w):
                    row = self.crow("C", k * w + e)
                    term = row * _grp(y1, e, r)
                    acc = term if acc is None else acc + term
                z.append(lm_rhs[:r, k:k + 1]
                         - jnp.sum(acc, axis=1, keepdims=True))
            capinv = self.C["capinv"]
            y2 = []
            for ko in range(l):
                acc = None
                for ki in range(l):
                    term = capinv[ko, ki] * z[ki]
                    acc = term if acc is None else acc + term
                y2.append(acc)
            x_b = y1
            for k in range(l):
                upd = []
                for e in range(w):
                    row = self.crow("BinvC", k * w + e)
                    upd.append(row * y2[k])
                x_b = x_b - jnp.concatenate(upd, axis=0)
            hotany = None
            for k in range(l):
                h = self.crow("lmhot", k)
                hotany = h if hotany is None else hotany + h
            oL = VL * (1.0 - hotany) + self._lm_cols_tile(y2, VL)
        else:
            x_b, oL = y1, VL

        # 4) sphere back-substitution:
        #    x_s = (v_s - cval*(x_lm - x_tpose)) / pivot
        oS = []
        x_tr = [_grp(x_b, 0 * q + d, r), _grp(x_b, 1 * q + d, r)]
        for p in range(2):
            for s in range(Smax):
                srow = p * Smax + s
                xlm = jnp.zeros_like(x_tr[p])
                for k in range(l):
                    sel = self.crow("lmsel", srow * max(l, 1) + k)
                    xlm = xlm + sel * oL[:r, k:k + 1]
                oS.append(self.crow("spiv_inv", srow) * (
                    self.sph(VS, p, s)
                    - self.crow("cval", srow) * (xlm - x_tr[p])))
        return x_b, jnp.concatenate(oS, axis=0), oL

    def _band_matvec_lvl(self, lvl, u, transpose=False):
        """`_band_matvec` against one level's (w², n_pad) coefficient
        block (value); transpose=True gives the exact adjoint
        out[b] = Σ_a A[a,b]·u[a]."""
        jnp = self.jnp
        w, r = self.plan.w, self.plan.r
        out = []
        for a in range(w):
            acc = None
            for b in range(w):
                idx = (b * w + a) if transpose else (a * w + b)
                row = lvl[idx:idx + 1, :]
                term = row * _grp(u, b, r)
                acc = term if acc is None else acc + term
            out.append(acc)
        return jnp.concatenate(out, axis=0)

    def _solve_B(self, rhs_b):
        """Banded solve B^{-1} = (L̃^{-1})^T L̃^{-1} with L̃^{-1} the
        forward doubling network (Linv block matvec + AF propagators) and
        its backward sweep the EXACT ADJOINT of that network: reversed
        level order, transposed coefficient blocks, negated rolls. The
        composed operator is symmetric PSD by construction — rounding in
        the stored propagators perturbs L̃ but can never break
        ⟨c, B^{-1} c⟩ = ‖L̃^{-1}c‖² ≥ 0 (a one-sided factor evaluated
        forward and adjoint). Level loops run as fori_loops with dynamic
        propagator-row indexing: unrolling all levels blew Mosaic's
        VMEM stack allocator at plaza2 size."""
        import jax.lax as lax

        jnp = self.jnp
        L = self.plan.levels
        i32 = jnp.int32
        u = self._band_matvec("Linv", rhs_b)
        if L:
            def fwd(k, u):
                s = jnp.left_shift(i32(1), k)
                lvl = self.dynrow(self.C["AF"], k)
                return u + self._band_matvec_lvl(lvl, self.roll(u, s))

            u = lax.fori_loop(i32(0), i32(L), fwd, u)

            def bwd(j, x):
                k = i32(L - 1) - j
                s = jnp.left_shift(i32(1), k)
                lvl = self.dynrow(self.C["AF"], k)
                mask = self.dynrow(self.C["scanmask"], k)
                return x + mask * self.roll(
                    self._band_matvec_lvl(lvl, x, transpose=True), -s)

            u = lax.fori_loop(i32(0), i32(L), bwd, u)
        return self._band_matvec("LinvT", u)

    # -- retraction / manifold projection ------------------------------------
    def project_manifold(self, A):
        """Blockwise metric projection: Stiefel polar per pose (closed form
        for d=2, Newton–Schulz for d=3), sphere row normalization
        (reference `CORA_problem.cpp:905-938`)."""
        jnp = self.jnp
        plan = self.plan
        d, q, r, Smax = plan.d, plan.q, plan.r, plan.S
        AP, AS, AL = A
        tiny = jnp.asarray(np.finfo(np.float32).tiny, AP.dtype)
        oP = []
        for p in range(2):
            ar = [self.rot(AP, p, a) for a in range(d)]
            G = [[jnp.sum(ar[a] * ar[b], axis=0, keepdims=True)
                  for b in range(d)] for a in range(d)]
            if d == 2:
                # closed-form (A A^T)^{-1/2} for 2x2 SPD: with s=sqrt(det),
                # M^{1/2} = (M + s I)/sqrt(tr + 2s) => invert directly.
                # Degenerate (singular) blocks get a trace-relative shift
                # — M^{-1/2} is unbounded there (mirrors
                # `cora_tpu.ops.manifolds._inv_sqrt_psd`)
                tr0 = G[0][0] + G[1][1]
                det0 = G[0][0] * G[1][1] - G[0][1] * G[0][1]
                shift = jnp.where(
                    det0 < 1e-6 * jnp.maximum(tr0 * tr0, tiny),
                    1e-3 * tr0, jnp.zeros_like(tr0))
                G00 = G[0][0] + shift
                G11 = G[1][1] + shift
                t = G00 + G11
                det = G00 * G11 - G[0][1] * G[0][1]
                s = jnp.sqrt(jnp.maximum(det, tiny))
                denom = jnp.sqrt(jnp.maximum(t + 2.0 * s, tiny))
                # inv(M + sI) = [[G11+s, -G01], [-G01, G00+s]] / det(M+sI)
                dd = jnp.maximum((G00 + s) * (G11 + s)
                                 - G[0][1] * G[0][1], tiny)
                c = denom / dd
                I00, I11 = c * (G11 + s), c * (G00 + s)
                I01 = -c * G[0][1]
                oP.append(I00 * ar[0] + I01 * ar[1])
                oP.append(I01 * ar[0] + I11 * ar[1])
            else:
                # QDWH polar iteration on the rows directly — the same
                # algorithm (and precomputed weight schedule) as
                # `cora_tpu.ops.manifolds._polar_qdwh`, unrolled per
                # lane, pow/eigh-free, with a closed-form 3×3 Cholesky
                # solve per iteration. No Gram squaring, so the kernel
                # and XLA retractions agree to ~ε even on the
                # ill-conditioned blocks of large-α saddle-escape trial
                # points (advisor r4).
                from cora_tpu.ops.manifolds import qdwh_weights

                fro2 = G[0][0] + G[1][1] + G[2][2]
                sinv = 1.0 / jnp.sqrt(jnp.maximum(fro2, tiny))
                x = [ar[a] * sinv for a in range(d)]
                for aw, bw, cw in qdwh_weights(1e-4, 8):
                    # Z = I + c·XXᵀ (6 unique entries, (1, lanes) each)
                    z00 = 1.0 + cw * jnp.sum(x[0] * x[0], axis=0,
                                             keepdims=True)
                    z01 = cw * jnp.sum(x[0] * x[1], axis=0, keepdims=True)
                    z02 = cw * jnp.sum(x[0] * x[2], axis=0, keepdims=True)
                    z11 = 1.0 + cw * jnp.sum(x[1] * x[1], axis=0,
                                             keepdims=True)
                    z12 = cw * jnp.sum(x[1] * x[2], axis=0, keepdims=True)
                    z22 = 1.0 + cw * jnp.sum(x[2] * x[2], axis=0,
                                             keepdims=True)
                    l11 = jnp.sqrt(jnp.maximum(z00, tiny))
                    l21 = z01 / l11
                    l31 = z02 / l11
                    l22 = jnp.sqrt(jnp.maximum(z11 - l21 * l21, tiny))
                    l32 = (z12 - l31 * l21) / l22
                    l33 = jnp.sqrt(
                        jnp.maximum(z22 - l31 * l31 - l32 * l32, tiny))
                    y1 = x[0] / l11
                    y2 = (x[1] - l21 * y1) / l22
                    y3 = (x[2] - l31 * y1 - l32 * y2) / l33
                    s3 = y3 / l33
                    s2 = (y2 - l32 * s3) / l22
                    s1 = (y1 - l21 * s2 - l31 * s3) / l11
                    bc = bw / cw
                    abc = aw - bc
                    x = [bc * x[0] + abc * s1,
                         bc * x[1] + abc * s2,
                         bc * x[2] + abc * s3]
                for a in range(d):
                    oP.append(x[a])
            oP.append(self.tr(AP, p))
        oS = []
        for p in range(2):
            for s in range(Smax):
                y = self.sph(AS, p, s)
                nrm = jnp.sqrt(jnp.sum(y * y, axis=0, keepdims=True))
                oS.append(y / jnp.maximum(nrm, tiny))
        return jnp.concatenate(oP, axis=0), jnp.concatenate(oS, axis=0), AL

    def retract(self, Y, V):
        jnp = self.jnp
        return self.project_manifold(
            (Y[0] + V[0], Y[1] + V[1], Y[2] + V[2]))

    def axpy(self, alpha, X, Y):
        return (Y[0] + alpha * X[0], Y[1] + alpha * X[1], Y[2] + alpha * X[2])

    def scale(self, alpha, X):
        return (alpha * X[0], alpha * X[1], alpha * X[2])


def make_host_ops(plan: TilePlan) -> TileOps:
    """TileOps bound to jnp arrays + jnp.roll (XLA/CPU reference path)."""
    import jax.numpy as jnp

    C = {k: jnp.asarray(v) for k, v in plan.const.items()}

    def roll(x, s):
        return jnp.roll(x, s, axis=1)

    return TileOps(plan, C, roll, jnp)
