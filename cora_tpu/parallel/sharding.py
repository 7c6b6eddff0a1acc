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
