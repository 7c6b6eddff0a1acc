"""Multi-chip distribution: edge-sharded Q products under `shard_map`.

The reference is single-threaded C++ (SURVEY.md §2.3); distribution is a
green-field TPU-native design:

  * the state Y (N×r, tall-skinny — hundreds of KB even for 100k-pose
    graphs) is **replicated** across the mesh;
  * the measurement edge lists (where all the FLOPs and memory traffic
    are) are **sharded** along a `graph` mesh axis;
  * each device computes the partial Q·Y contribution of its edge shard
    as the same gather → block-GEMM → segment-sum kernel, followed by a
    single `psum` over the mesh — one ICI collective per operator
    application (tCG step / LOBPCG block);
  * tCG/LOBPCG inner products and Gram matrices act on the replicated
    output, so the whole trust-region solve jits over the mesh with
    exactly one collective per Hessian-vector product.

Edge arrays are zero-padded to a multiple of the mesh size; padding edges
carry zero precision, so they contribute nothing (branch-free masking).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cora_tpu.graph.data import ProblemData
from cora_tpu.ops.linalg import bmm, bmm_T

AXIS = "graph"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = devices or jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _pad_to(x: np.ndarray, total: int):
    pad = total - x.shape[0]
    if pad == 0:
        return x
    return np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def pad_problem_data(pd: ProblemData, num_shards: int) -> ProblemData:
    """Zero-pad edge arrays so each family divides evenly across shards.

    Padding edges point at index 0 with zero precision (κ=τ=ω=0), so they
    are mathematically inert.
    """

    def up(k):
        return 0 if k == 0 else int(-(-k // num_shards) * num_shards)

    Er, Ep, M = up(pd.num_rot_edges), up(pd.num_pose_meas), up(pd.m)
    np_ = lambda a, n: _pad_to(np.asarray(a), n)
    return dataclasses.replace(
        pd,
        chain_rot=False,
        chain_pm=False,
        rot_i=np_(pd.rot_i, Er), rot_j=np_(pd.rot_j, Er),
        rot_R=np_(pd.rot_R, Er), rot_kappa=np_(pd.rot_kappa, Er),
        pm_ti=np_(pd.pm_ti, Ep), pm_tj=np_(pd.pm_tj, Ep),
        pm_t=np_(pd.pm_t, Ep), pm_tau=np_(pd.pm_tau, Ep),
        rng_ti=np_(pd.rng_ti, M), rng_tj=np_(pd.rng_tj, M),
        rng_r=np_(pd.rng_r, M), rng_omega=np_(pd.rng_omega, M),
    )


def shard_problem_data(pd: ProblemData, mesh: Mesh) -> ProblemData:
    """Place padded edge arrays with their leading axis sharded over the mesh."""
    num = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    pdp = pad_problem_data(pd, num)
    edge_sharding = NamedSharding(mesh, P(AXIS))

    def put(x):
        return jax.device_put(jnp.asarray(x), edge_sharding)

    return dataclasses.replace(
        pdp,
        rot_i=put(pdp.rot_i), rot_j=put(pdp.rot_j),
        rot_R=put(pdp.rot_R), rot_kappa=put(pdp.rot_kappa),
        pm_ti=put(pdp.pm_ti), pm_tj=put(pdp.pm_tj),
        pm_t=put(pdp.pm_t), pm_tau=put(pdp.pm_tau),
        rng_ti=put(pdp.rng_ti), rng_tj=put(pdp.rng_tj),
        rng_r=put(pdp.rng_r), rng_omega=put(pdp.rng_omega),
    )


def _partial_product(pd: ProblemData, rng_e: jax.Array, Y: jax.Array) -> jax.Array:
    """Partial QY from a local edge shard (generic gather path). `rng_e`
    carries the *global* sphere-row index of each local range edge so the
    Q22 diagonal terms scatter correctly under sharding."""
    r = Y.shape[1]
    nd = pd.rot_size
    Yrot = Y[:nd].reshape(pd.n, pd.d, r)
    Ysph = Y[nd:nd + pd.m]
    Ytr = Y[nd + pd.m:]

    out_rot = jnp.zeros_like(Yrot)
    out_tr = jnp.zeros_like(Ytr)
    out_sph = jnp.zeros_like(Ysph)

    seg = partial(jax.ops.segment_sum)

    if pd.rot_i.shape[0]:
        Yi, Yj = Yrot[pd.rot_i], Yrot[pd.rot_j]
        k = pd.rot_kappa[:, None, None]
        RYj = bmm(pd.rot_R, Yj)
        RtYi = bmm_T(pd.rot_R, Yi)
        out_rot = out_rot + seg(k * (Yi - RYj), pd.rot_i, num_segments=pd.n)
        out_rot = out_rot + seg(k * (Yj - RtYi), pd.rot_j, num_segments=pd.n)

    if pd.pm_ti.shape[0]:
        Yci = Yrot[pd.pm_ti]
        u = Ytr[pd.pm_tj] - Ytr[pd.pm_ti] - jnp.sum(pd.pm_t[:, :, None] * Yci, axis=1)
        w = pd.pm_tau[:, None] * u
        out_rot = out_rot + seg(
            -pd.pm_t[:, :, None] * w[:, None, :], pd.pm_ti, num_segments=pd.n
        )
        nt = pd.num_translations
        out_tr = out_tr + seg(w, pd.pm_tj, num_segments=nt)
        out_tr = out_tr - seg(w, pd.pm_ti, num_segments=nt)

    if pd.rng_ti.shape[0]:
        ys = Ysph[rng_e]
        v = pd.rng_r[:, None] * ys + Ytr[pd.rng_tj] - Ytr[pd.rng_ti]
        wr = pd.rng_omega[:, None] * v
        out_sph = out_sph + seg(pd.rng_r[:, None] * wr, rng_e, num_segments=pd.m)
        nt = pd.num_translations
        out_tr = out_tr + seg(wr, pd.rng_tj, num_segments=nt)
        out_tr = out_tr - seg(wr, pd.rng_ti, num_segments=nt)

    return jnp.concatenate([out_rot.reshape(nd, r), out_sph, out_tr], axis=0)


# ---------------------------------------------------------------------------
# Block-row sharded operator (round 5)
#
# The edge-sharded operator above is exact but every device still touches
# all N output rows (full-height segment_sum + full (N, r) psum), so
# per-device work does not shrink with the mesh (measured efficiency
# 0.003 on the 8-device CPU mesh, VERDICT r4). The block-row design
# partitions POSES into contiguous blocks (SLAM trajectories are chains,
# so almost every edge is block-interior), assigns each edge to the
# owner of its first endpoint, and keeps all output accumulation LOCAL:
#
#   * per-device segment-sums over O(N/K) local rows;
#   * contributions to rows owned elsewhere (cross-block chain/loop
#     edges, landmark translations, inter-robot ranges) land in a small
#     SEPARATOR buffer — the only psum, O(σ·r) with σ ≪ N;
#   * the replicated (N, r) output is re-assembled with one all_gather
#     of the row blocks (N·r total bytes over ICI — latency ~N·r·4/BW,
#     independent of mesh size).
#
# Per-device cost: O(E/K + N/K + σ) compute, O(N + σ·K) communication —
# against O(E/K + N) compute and O(N·K) reduce traffic before.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RowBlockPlan:
    """Host-precomputed block-row partition (numpy; device-constant).

    Arrays with leading dim K are sharded over the mesh so each device
    receives its row. `sep_*` describe the shared separator row-units.
    """

    K: int
    B: int          # poses per block (last block zero-padded)
    m_loc: int      # max sphere rows owned by any device
    n_sep_rot: int
    n_sep_tr: int
    # per-device edge lists, (K, E_fam) each, zero-precision padded
    rot_i: np.ndarray; rot_j: np.ndarray; rot_R: np.ndarray; rot_kappa: np.ndarray
    rot_ti_loc: np.ndarray; rot_tj_loc: np.ndarray  # local/sep rot targets
    pm_ti: np.ndarray; pm_tj: np.ndarray; pm_t: np.ndarray; pm_tau: np.ndarray
    pm_ci_loc: np.ndarray; pm_ti_loc: np.ndarray; pm_tj_loc: np.ndarray
    rng_ti: np.ndarray; rng_tj: np.ndarray; rng_r: np.ndarray; rng_omega: np.ndarray
    rng_s_glob: np.ndarray  # global sphere row of each local range edge
    rng_s_loc: np.ndarray; rng_ti_loc: np.ndarray; rng_tj_loc: np.ndarray
    # global reassembly indices (replicated)
    sep_rot_ids: np.ndarray  # (σr,) global pose ids of the rot separators
    sep_tr_ids: np.ndarray   # (σt_pose,) global pose-translation separator ids
    sep_tr_sel: np.ndarray   # (σt_pose,) their slots within sep_tr
    sph_unperm: np.ndarray   # (m,) flat index into (K·m_loc) gathered sphere rows
    lm_sel: np.ndarray       # (l,) separator-tr slots of the landmark rows


def build_rowblock_plan(pd: ProblemData, K: int) -> RowBlockPlan:
    d, n, l, m = pd.d, pd.n, pd.l, pd.m
    B = -(-n // K) if n else 1
    owner = lambda p: np.minimum(
        np.asarray(p, np.int64) // B, K - 1).astype(np.int32)

    rot_i = np.asarray(pd.rot_i); rot_j = np.asarray(pd.rot_j)
    pm_ti = np.asarray(pd.pm_ti); pm_tj = np.asarray(pd.pm_tj)
    rng_ti = np.asarray(pd.rng_ti); rng_tj = np.asarray(pd.rng_tj)

    def edge_owner(a, b):
        # primary endpoint: a pose when available (landmark rows have no
        # owner block)
        a = np.asarray(a); b = np.asarray(b)
        prim = np.where(a < n, a, np.where(b < n, b, 0))
        return owner(prim)

    own_rot = edge_owner(rot_i, rot_j)
    own_pm = edge_owner(pm_ti, pm_tj)
    own_rng = edge_owner(rng_ti, rng_tj)

    # ---- separator units: rows an edge touches outside its own block ----
    def remote_pose(units, owners):
        u = np.asarray(units)
        return u[(u < n) & (owner(u) != owners)]

    sep_rot = np.unique(np.concatenate([
        remote_pose(rot_i, own_rot), remote_pose(rot_j, own_rot),
        remote_pose(pm_ti, own_pm),  # rot row of the pm edge's pose
    ])) if (rot_i.size or pm_ti.size) else np.zeros(0, np.int64)
    tr_units = [np.asarray(u)[(np.asarray(u) >= n) | (owner(u) != o)]
                for u, o in ((pm_ti, own_pm), (pm_tj, own_pm),
                             (rng_ti, own_rng), (rng_tj, own_rng))]
    # every landmark row is a separator (touched from many blocks)
    sep_tr = np.unique(np.concatenate(tr_units + [np.arange(n, n + l)])) \
        if (l or any(t.size for t in tr_units)) else np.zeros(0, np.int64)
    sep_rot_pos = {int(p): i for i, p in enumerate(sep_rot)}
    sep_tr_pos = {int(t): i for i, t in enumerate(sep_tr)}
    n_sr, n_st = len(sep_rot), len(sep_tr)

    # sphere-row ownership follows the owning edge; local order = edge order
    sph_local_idx = np.zeros(m, np.int64)
    m_loc = 1
    for k in range(K):
        sel = np.nonzero(own_rng == k)[0]
        sph_local_idx[sel] = np.arange(len(sel))
        m_loc = max(m_loc, len(sel))
    sph_unperm = (own_rng.astype(np.int64) * m_loc + sph_local_idx
                  if m else np.zeros(0, np.int64))

    def local_or_sep(units, owners, pos, n_local_units, n_sep, is_tr):
        """Target index in [0, n_local+n_sep+1): local unit, separator
        slot (offset n_local), or the inert dump slot (last)."""
        u = np.asarray(units, np.int64)
        loc = u - owners.astype(np.int64) * B
        if is_tr:
            is_local = (u < n) & (owner(u) == owners)
        else:
            is_local = owner(u) == owners
        sep_idx = np.array([pos.get(int(x), -1) for x in u], np.int64)
        tgt = np.where(is_local, loc, n_local_units + sep_idx)
        return np.where((is_local) | (sep_idx >= 0), tgt,
                        n_local_units + n_sep)

    rot_ti_loc = local_or_sep(rot_i, own_rot, sep_rot_pos, B, n_sr, False)
    rot_tj_loc = local_or_sep(rot_j, own_rot, sep_rot_pos, B, n_sr, False)
    pm_ci_loc = local_or_sep(pm_ti, own_pm, sep_rot_pos, B, n_sr, False)
    pm_ti_loc = local_or_sep(pm_ti, own_pm, sep_tr_pos, B, n_st, True)
    pm_tj_loc = local_or_sep(pm_tj, own_pm, sep_tr_pos, B, n_st, True)
    rng_ti_loc = local_or_sep(rng_ti, own_rng, sep_tr_pos, B, n_st, True)
    rng_tj_loc = local_or_sep(rng_tj, own_rng, sep_tr_pos, B, n_st, True)

    def bucket(owners, arrays, fill=0.0):
        """(K, E_max) per-device edge buckets, padded inert."""
        E_max = 1
        sels = []
        for k in range(K):
            sel = np.nonzero(owners == k)[0]
            sels.append(sel)
            E_max = max(E_max, len(sel))
        outs = []
        for a in arrays:
            a = np.asarray(a)
            out = np.full((K, E_max) + a.shape[1:],
                          fill, a.dtype if a.dtype != np.int64 else np.int64)
            for k, sel in enumerate(sels):
                out[k, : len(sel)] = a[sel]
            outs.append(out)
        return outs

    (b_rot_i, b_rot_j, b_rot_R, b_rot_k, b_rot_ti, b_rot_tj) = bucket(
        own_rot, [rot_i, rot_j, np.asarray(pd.rot_R),
                  np.asarray(pd.rot_kappa), rot_ti_loc, rot_tj_loc])
    (b_pm_ti, b_pm_tj, b_pm_t, b_pm_tau, b_pm_ci, b_pm_til, b_pm_tjl) = bucket(
        own_pm, [pm_ti, pm_tj, np.asarray(pd.pm_t), np.asarray(pd.pm_tau),
                 pm_ci_loc, pm_ti_loc, pm_tj_loc])
    (b_rng_ti, b_rng_tj, b_rng_r, b_rng_om, b_rng_sg, b_rng_s, b_rng_til,
     b_rng_tjl) = bucket(
        own_rng, [rng_ti, rng_tj, np.asarray(pd.rng_r),
                  np.asarray(pd.rng_omega), np.arange(m, dtype=np.int64),
                  sph_local_idx, rng_ti_loc, rng_tj_loc])
    # padded edges: zero precision makes them inert; point targets at dumps
    for k in range(K):
        cnt = int((own_rot == k).sum())
        b_rot_k[k, cnt:] = 0
        b_rot_ti[k, cnt:] = B + n_sr
        b_rot_tj[k, cnt:] = B + n_sr
        cnt = int((own_pm == k).sum())
        b_pm_tau[k, cnt:] = 0
        b_pm_ci[k, cnt:] = B + n_sr
        b_pm_til[k, cnt:] = B + n_st
        b_pm_tjl[k, cnt:] = B + n_st
        cnt = int((own_rng == k).sum())
        b_rng_om[k, cnt:] = 0
        b_rng_s[k, cnt:] = m_loc  # dump sphere slot
        b_rng_til[k, cnt:] = B + n_st
        b_rng_tjl[k, cnt:] = B + n_st

    sep_tr_sel = np.nonzero(sep_tr < n)[0] if n_st else np.zeros(0, np.int64)
    lm_sel = np.array([sep_tr_pos[n + i] for i in range(l)], np.int64)

    i32 = lambda a: np.ascontiguousarray(a, np.int32)
    return RowBlockPlan(
        K=K, B=B, m_loc=m_loc, n_sep_rot=n_sr, n_sep_tr=n_st,
        rot_i=i32(b_rot_i), rot_j=i32(b_rot_j),
        rot_R=np.ascontiguousarray(b_rot_R), rot_kappa=np.ascontiguousarray(b_rot_k),
        rot_ti_loc=i32(b_rot_ti), rot_tj_loc=i32(b_rot_tj),
        pm_ti=i32(b_pm_ti), pm_tj=i32(b_pm_tj),
        pm_t=np.ascontiguousarray(b_pm_t), pm_tau=np.ascontiguousarray(b_pm_tau),
        pm_ci_loc=i32(b_pm_ci), pm_ti_loc=i32(b_pm_til), pm_tj_loc=i32(b_pm_tjl),
        rng_ti=i32(b_rng_ti), rng_tj=i32(b_rng_tj),
        rng_r=np.ascontiguousarray(b_rng_r), rng_omega=np.ascontiguousarray(b_rng_om),
        rng_s_glob=i32(b_rng_sg),
        rng_s_loc=i32(b_rng_s), rng_ti_loc=i32(b_rng_til), rng_tj_loc=i32(b_rng_tjl),
        sep_rot_ids=i32(sep_rot), sep_tr_ids=i32(sep_tr[sep_tr_sel]
                                                 if n_st else sep_tr),
        sep_tr_sel=i32(sep_tr_sel),
        sph_unperm=i32(sph_unperm), lm_sel=i32(lm_sel),
    )


def make_blockrow_operator(pd: ProblemData, mesh: Mesh, plan=None):
    """Replicated-in / replicated-out Q·Y with block-row local work.

    See the section comment above for the design; exactness is tested
    against the dense product in `tests/test_sharding.py`.
    """
    K = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if plan is None:
        plan = build_rowblock_plan(pd, K)
    d, n, l, m = pd.d, pd.n, pd.l, pd.m
    B, m_loc = plan.B, plan.m_loc
    n_sr, n_st = plan.n_sep_rot, plan.n_sep_tr
    nd = pd.rot_size
    shard = NamedSharding(mesh, P(AXIS))

    replicated = ("sph_unperm", "lm_sel", "sep_rot_ids", "sep_tr_ids",
                  "sep_tr_sel")
    dev = {
        f.name: jax.device_put(jnp.asarray(getattr(plan, f.name)), shard)
        for f in dataclasses.fields(plan)
        if isinstance(getattr(plan, f.name), np.ndarray)
        and f.name not in replicated
    }
    specs = {k: P(AXIS) for k in dev}
    plan_sph_unperm = jnp.asarray(plan.sph_unperm)
    plan_lm_sel = jnp.asarray(plan.lm_sel)
    plan_sep_rot_ids = jnp.asarray(plan.sep_rot_ids)
    plan_sep_tr_ids = jnp.asarray(plan.sep_tr_ids)
    plan_sep_tr_sel = jnp.asarray(plan.sep_tr_sel)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(specs, P(None, None)),
        out_specs=P(None, None),
        # the output IS replicated (all_gather + psum assemble identical
        # values on every device) but the static varying-axes checker
        # cannot infer that through all_gather
        check_vma=False,
    )
    def product(c, Y):
        r = Y.shape[1]
        sq = lambda a: a[0]  # drop the sharded leading axis (block of 1)
        Yrot = Y[:nd].reshape(n, d, r)
        Ysph = Y[nd:nd + m]
        Ytr = Y[nd + m:]
        seg = jax.ops.segment_sum

        rot_buf = jnp.zeros((B + n_sr + 1, d, r), Y.dtype)
        tr_buf = jnp.zeros((B + n_st + 1, r), Y.dtype)
        sph_buf = jnp.zeros((m_loc + 1, r), Y.dtype)

        ri, rj = sq(c["rot_i"]), sq(c["rot_j"])
        if pd.num_rot_edges:
            Yi, Yj = Yrot[ri], Yrot[rj]
            R = sq(c["rot_R"])
            kap = sq(c["rot_kappa"])[:, None, None]
            RYj = bmm(R, Yj)
            RtYi = bmm_T(R, Yi)
            rot_buf = rot_buf + seg(
                kap * (Yi - RYj), sq(c["rot_ti_loc"]),
                num_segments=B + n_sr + 1)
            rot_buf = rot_buf + seg(
                kap * (Yj - RtYi), sq(c["rot_tj_loc"]),
                num_segments=B + n_sr + 1)

        pti, ptj = sq(c["pm_ti"]), sq(c["pm_tj"])
        if pd.num_pose_meas:
            Yci = Yrot[pti]
            t = sq(c["pm_t"])
            u = Ytr[ptj] - Ytr[pti] - jnp.sum(t[:, :, None] * Yci, axis=1)
            w = sq(c["pm_tau"])[:, None] * u
            rot_buf = rot_buf + seg(
                -t[:, :, None] * w[:, None, :], sq(c["pm_ci_loc"]),
                num_segments=B + n_sr + 1)
            tr_buf = tr_buf + seg(
                w, sq(c["pm_tj_loc"]), num_segments=B + n_st + 1)
            tr_buf = tr_buf - seg(
                w, sq(c["pm_ti_loc"]), num_segments=B + n_st + 1)

        gti, gtj = sq(c["rng_ti"]), sq(c["rng_tj"])
        if m:
            ys = Ysph[sq(c["rng_s_glob"])]
            rr = sq(c["rng_r"])[:, None]
            v = rr * ys + Ytr[gtj] - Ytr[gti]
            wr = sq(c["rng_omega"])[:, None] * v
            sph_buf = sph_buf + seg(
                rr * wr, sq(c["rng_s_loc"]), num_segments=m_loc + 1)
            tr_buf = tr_buf + seg(
                wr, sq(c["rng_tj_loc"]), num_segments=B + n_st + 1)
            tr_buf = tr_buf - seg(
                wr, sq(c["rng_ti_loc"]), num_segments=B + n_st + 1)

        # ONE collective per application: fuse the local row blocks AND
        # the separator contributions into a single all_gather, then do
        # the (cheap, replicated) separator reduction and reassembly on
        # every device — a psum + 3 gathers paid 4× the virtual-mesh
        # rendezvous floor for nothing
        local = jnp.concatenate([
            rot_buf[:B].reshape(B * d, r),
            tr_buf[:B],
            sph_buf[:m_loc],
            rot_buf[B:B + n_sr].reshape(n_sr * d, r),
            tr_buf[B:B + n_st],
        ], axis=0)
        g = jax.lax.all_gather(local, AXIS)  # (K, L, r)
        sep_off = B * d + B + m_loc
        sep = jnp.sum(g[:, sep_off:], axis=0)
        sep_rot = sep[: n_sr * d].reshape(n_sr, d, r)
        sep_tr = sep[n_sr * d:]

        g_rot = g[:, : B * d].reshape(K * B, d, r)[:n]
        g_tr = g[:, B * d: B * d + B].reshape(K * B, r)[:n]
        if n_sr:
            g_rot = g_rot.at[plan_sep_rot_ids].add(sep_rot)
        if plan_sep_tr_ids.shape[0]:
            g_tr = g_tr.at[plan_sep_tr_ids].add(sep_tr[plan_sep_tr_sel])
        g_sph = g[:, B * d + B: sep_off].reshape(K * m_loc, r)
        sph_out = g_sph[plan_sph_unperm] if m else jnp.zeros((0, r), Y.dtype)
        lm_out = sep_tr[plan_lm_sel] if l else jnp.zeros((0, r), Y.dtype)
        return jnp.concatenate(
            [g_rot.reshape(n * d, r), sph_out, g_tr, lm_out], axis=0)

    def op(Y):
        return product(dev, Y)

    return op


def make_sharded_operator(pd_sharded: ProblemData, mesh: Mesh):
    """Q·Y with edges sharded over the mesh and one psum per application.

    NOTE: `pd_sharded` must come from `shard_problem_data`. The sphere
    rows of the local partial product only involve the local range-edge
    shard, so every term (including Q22) sums correctly under psum.
    """
    edge_arrays = [
        "rot_i", "rot_j", "rot_R", "rot_kappa",
        "pm_ti", "pm_tj", "pm_t", "pm_tau",
        "rng_ti", "rng_tj", "rng_r", "rng_omega",
    ]
    pd_spec = dataclasses.replace(
        pd_sharded, **{f: P(AXIS) for f in edge_arrays}  # type: ignore[arg-type]
    )
    # global sphere-row index of every (padded) range edge; padding edges
    # have ω=0 so their target row is irrelevant
    m_pad = pd_sharded.rng_ti.shape[0]
    rng_e = jax.device_put(
        jnp.asarray(np.arange(m_pad) % max(pd_sharded.m, 1), jnp.int32),
        NamedSharding(mesh, P(AXIS)),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(pd_spec, P(AXIS), P(None, None)),
        out_specs=P(None, None),
    )
    def product(pd_local, rng_e_local, Y):
        out = _partial_product(pd_local, rng_e_local, Y)
        return jax.lax.psum(out, AXIS)

    def op(Y):
        return product(pd_sharded, rng_e, Y)

    return op
