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

    Matches the reference's `Matrix::Random` (uniform in [-1,1]) followed by
    manifold projection; translations stay uniform. `height` overrides the
    state height (rot_range_size for the implicit formulation).
    """
    A = jax.random.uniform(
        key, (height or pd.size, rank), dtype=pd.dtype(), minval=-1.0, maxval=1.0
    )
    return project_to_manifold(pd, A)
