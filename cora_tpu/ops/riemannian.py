"""Riemannian calculus on the full product manifold, in stacked-state form.

Combines the blockwise manifold ops (`cora_tpu.ops.manifolds`) with the
factored Q-operator (`cora_tpu.ops.quadratic`) to provide exactly the
closures the trust-region solver needs (reference
`src/CORA_problem.cpp:742-938` and the functors built in
`src/CORA.cpp:52-125`):

  * tangent_space_projection
  * riemannian_gradient
  * riemannian_hvp  (Hessian-vector product)
  * project_to_manifold / retract (projection-based, Absil–Malick)
  * random_initial_guess
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cora_tpu.graph.data import ProblemData
from cora_tpu.ops import manifolds as mf
from cora_tpu.ops.quadratic import (
    data_matrix_product,
    join_state,
    split_state,
)


def tangent_space_projection(pd: ProblemData, Y: jax.Array, V: jax.Array) -> jax.Array:
    """Blockwise projection onto T_Y (reference `CORA_problem.cpp:782-820`)."""
    Yrot, Ysph, Ytr = split_state(pd, Y)
    Vrot, Vsph, Vtr = split_state(pd, V)
    Prot = mf.stiefel_tangent_project(Yrot, Vrot)
    Psph = mf.oblique_tangent_project(Ysph, Vsph)
    return join_state(pd, Prot, Psph, Vtr)


def riemannian_gradient(pd: ProblemData, Y: jax.Array, nablaF=None, op=None) -> jax.Array:
    if nablaF is None:
        nablaF = op(Y) if op is not None else data_matrix_product(pd, Y)
    return tangent_space_projection(pd, Y, nablaF)


def riemannian_hvp(
    pd: ProblemData, Y: jax.Array, nablaF: jax.Array, dotY: jax.Array, op=None
) -> jax.Array:
    """Riemannian Hessian-vector product (reference `CORA_problem.cpp:822-867`).

    Hess f(Y)[Ẏ] = Proj_{T_Y}( Q Ẏ − blockwise Weingarten corrections )

    `op` selects the quadratic-form operator (explicit Q by default; the
    marginalized operator in implicit mode). All blockwise manifold terms
    are layout-driven and work on either state height.
    """
    H = op(dotY) if op is not None else data_matrix_product(pd, dotY)
    Yrot, Ysph, Ytr = split_state(pd, Y)
    Grot, Gsph, _ = split_state(pd, nablaF)
    Hrot, Hsph, Htr = split_state(pd, H)
    drot, dsph, _ = split_state(pd, dotY)

    Hrot = Hrot - mf.stiefel_hess_correction(Yrot, Grot, drot)
    Hrot = mf.stiefel_tangent_project(Yrot, Hrot)

    # oblique correction: rows weighted by ⟨∇F_row, Y_row⟩
    inner = jnp.sum(Gsph * Ysph, axis=-1, keepdims=True)
    Hsph = mf.oblique_tangent_project(Ysph, Hsph - inner * dsph)

    return join_state(pd, Hrot, Hsph, Htr)


def project_to_manifold(pd: ProblemData, A: jax.Array) -> jax.Array:
    """Blockwise metric projection (reference `CORA_problem.cpp:905-934`)."""
    Arot, Asph, Atr = split_state(pd, A)
    return join_state(
        pd, mf.stiefel_project(Arot), mf.oblique_project(Asph), Atr
    )


def retract(pd: ProblemData, Y: jax.Array, V: jax.Array) -> jax.Array:
    """Projection-based retraction (reference `CORA_problem.cpp:936-938`)."""
    return project_to_manifold(pd, Y + V)


def random_initial_guess(pd: ProblemData, rank: int, key, height=None) -> jax.Array:
    """Random point on the manifold (reference `CORA_problem.cpp:1023-1028`).

    Matches the reference's `Matrix::Random` (uniform in [-1,1]) followed
    by manifold projection; translations stay uniform. The Stiefel
    projection runs as a HOST float64 SVD (polar = U Vᵀ): a uniform
    random d×r block can be numerically singular, where the device
    polar-decomposition projection (`stiefel_project`) is undefined —
    the reference's JacobiSVD path (`StiefelProduct.cpp:8-36`) has the
    same always-orthonormal property. Init runs once per solve; the
    iterative retraction path never sees singular blocks.
    `height` overrides the state height (rot_range_size implicit mode).
    """
    import numpy as np

    h = height or pd.size
    A = np.array(jax.random.uniform(
        key, (h, rank), dtype=jnp.float64, minval=-1.0, maxval=1.0
    ))
    nd = pd.rot_size
    blocks = A[:nd].reshape(pd.n, pd.d, rank)
    U, _, Vt = np.linalg.svd(blocks, full_matrices=False)
    A[:nd] = (U @ Vt).reshape(nd, rank)
    if pd.m:
        sph = A[nd:nd + pd.m]
        A[nd:nd + pd.m] = sph / np.maximum(
            np.linalg.norm(sph, axis=1, keepdims=True), 1e-30)
    return jnp.asarray(A, pd.dtype())
