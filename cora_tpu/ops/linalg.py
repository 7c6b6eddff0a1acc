"""Small-matrix linear algebra primitives tuned for TPU.

Every matmul in the solver's hot path contracts a tiny dimension (d ≤ 3
rotation blocks, (d+1)-sized preconditioner blocks, rank r ≤ 10). On TPU
those would be dispatched to the MXU at its *default bfloat16* input
precision — numerically fatal for this solver (κ ~ 1e4 rotation
precisions; Newton–Schulz iterations diverge) — and forcing
`highest` precision globally lowers every dot to a 6-pass decomposition
that blows up Mosaic compile times.

The TPU-native answer: contract tiny dimensions by *unrolling* into VPU
multiply-adds — full float32 accuracy, no MXU involvement, and a few HLO
ops instead of a dot_general. `bmm` unrolls when the contracted dim is
small and falls back to a highest-precision einsum otherwise (the only
large contractions live in LOBPCG's Rayleigh–Ritz, where the 6-pass cost
is negligible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

UNROLL_LIMIT = 12


def bmm(A: jax.Array, B: jax.Array) -> jax.Array:
    """Batched matmul (..., a, k) @ (..., k, c) with small-k unrolling."""
    k = A.shape[-1]
    if k <= UNROLL_LIMIT:
        return sum(
            A[..., :, i:i + 1] * B[..., i:i + 1, :] for i in range(k)
        )
    return jnp.einsum(
        "...ak,...kc->...ac", A, B, precision=jax.lax.Precision.HIGHEST
    )


def bmm_T(A: jax.Array, B: jax.Array) -> jax.Array:
    """Batched (..., k, a)ᵀ @ (..., k, c) = Aᵀ B with small-k unrolling."""
    k = A.shape[-2]
    if k <= UNROLL_LIMIT:
        return sum(
            A[..., i:i + 1, :].swapaxes(-1, -2) * B[..., i:i + 1, :]
            for i in range(k)
        )
    return jnp.einsum(
        "...ka,...kc->...ac", A, B, precision=jax.lax.Precision.HIGHEST
    )


def contract(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full inner product ⟨a, b⟩ as an elementwise multiply + sum (VPU,
    full precision at the array dtype — never routed through the MXU)."""
    return jnp.sum(a * b)


def rowdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Row-wise inner products over the last axis."""
    return jnp.sum(a * b, axis=-1)
