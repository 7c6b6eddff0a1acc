"""Solution rounding and gauge alignment.

Parity with the reference:
  * `projectSolution` (`src/CORA.cpp:352-441`): thin SVD of the rank-r
    solution, keep the top d singular pairs, majority-vote determinant
    sign fix with a reflector, per-block SO(d) projection, sphere-row
    renormalization.
  * `alignEstimateToOrigin` (`src/CORA_problem.cpp:1236-1306`): rotate so
    the first rotation block is the identity, then center translations.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cora_tpu.graph.data import ProblemData
from cora_tpu.ops import manifolds as mf
from cora_tpu.ops.quadratic import join_state, split_state


def project_solution(pd: ProblemData, Y: jnp.ndarray, verbose: bool = False):
    """Round a rank-r solution to rank d (reference `projectSolution`)."""
    d = pd.d
    U, s, _ = jnp.linalg.svd(Y, full_matrices=False)
    Yd = U[:, :d] * s[None, :d]

    Yrot, Ysph, Ytr = split_state(pd, Yd)

    if pd.n:
        # majority vote over block determinants (`CORA.cpp:379-413`)
        dets = jnp.linalg.det(Yrot[:, :, :d])
        ng0 = jnp.sum(dets > 0)
        reflect = ng0 < pd.n / 2
        reflector = jnp.where(
            reflect,
            jnp.concatenate([jnp.ones(d - 1, Yd.dtype), -jnp.ones(1, Yd.dtype)]),
            jnp.ones(d, Yd.dtype),
        )
        Yrot = Yrot * reflector[None, None, :]
        Ysph = Ysph * reflector[None, :]
        Ytr = Ytr * reflector[None, :]
        Yrot = mf.project_to_SOd(Yrot)

    Ysph = mf.oblique_project(Ysph)
    return join_state(pd, Yrot, Ysph, Ytr)


def align_estimate_to_origin(pd: ProblemData, Y: jnp.ndarray) -> jnp.ndarray:
    """Gauge-fix a rank-d solution (reference `alignEstimateToOrigin`)."""
    d = pd.d
    Y_aligned = Y
    if pd.n:
        first_rot = Y[:d, :d]
        Y_aligned = Y @ first_rot.T
    # center translations at the origin
    Yrot, Ysph, Ytr = split_state(pd, Y_aligned)
    Ytr = Ytr - jnp.mean(Ytr, axis=0, keepdims=True)
    return join_state(pd, Yrot, Ysph, Ytr)


def check_variables_are_valid(pd: ProblemData, Y, atol=1e-6) -> None:
    """Sanity checks on manifold feasibility (reference
    `checkVariablesAreValid`, `CORA_problem.cpp:1199-1234`)."""
    Y = np.asarray(Y)
    d = pd.d
    Yrot = Y[: pd.rot_size].reshape(pd.n, d, -1)
    for i in range(pd.n):
        RRt = Yrot[i] @ Yrot[i].T
        if not np.allclose(RRt, np.eye(d), atol=atol):
            raise ValueError(f"pose {i}: R Rᵀ is not the identity")
        if Y.shape[1] == d and abs(np.linalg.det(Yrot[i]) - 1) > atol:
            raise ValueError(f"pose {i}: det(R) != 1")
    Ysph = Y[pd.rot_size: pd.rot_size + pd.m]
    norms = np.linalg.norm(Ysph, axis=1)
    if pd.m and not np.allclose(norms, 1.0, atol=atol):
        raise ValueError("range bearing variable is not unit-norm")
