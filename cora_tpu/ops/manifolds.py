"""Batched manifold geometry for the product manifold
``Stiefel(d,r)^n × Oblique(r)^m × R^{(n+l)×r}``.

The reference implements these as per-block loops with Eigen JacobiSVD
(`src/StiefelProduct.cpp`, `src/ObliqueManifold.cpp`). Here every
operation is batched over blocks with fixed shapes:

  * Stiefel blocks live in the state as (n, d, r) row-blocks Y_i with
    Y_i Y_iᵀ = I_d (the transpose of the reference's p×kn layout).
  * The SVD-based projection U Vᵀ is computed via the polar
    decomposition ``(A Aᵀ)^{-1/2} A`` using a batched d×d eigh —
    equivalent for full-rank A (Absil–Malick Prop. 7) and far cheaper
    on TPU than a batched SVD.
  * Oblique (unit-sphere) rows are plain row normalizations.

Everything is jit/vmap-friendly and used unchanged inside lax.while_loop
solver bodies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cora_tpu.ops.linalg import bmm


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def _inv_sqrt_psd_eigh(M, eps=0.0):
    """Batched inverse matrix square root of small SPD matrices via eigh."""
    w, V = jnp.linalg.eigh(M)
    w = jnp.maximum(w, jnp.finfo(M.dtype).tiny)
    inv_sqrt_w = 1.0 / jnp.sqrt(w + eps)
    return jnp.einsum("...ab,...b,...cb->...ac", V, inv_sqrt_w, V)


def _inv_sqrt_psd(M, iters: int = 25):
    """Batched M^{-1/2}: exact closed form for d=2, trace-scaled
    Newton–Schulz for d≥3.

    Pure d×d arithmetic — compiles to a tiny fused program and runs on
    the MXU/VPU, unlike `eigh` whose QR-iteration lowering dominated the
    compile time of the TNT while-loop on TPU.

    d=2 closed form: with s = √det(M), M^{1/2} = (M + sI)/√(tr + 2s), so
    M^{-1/2} = inv(M + sI)·√(tr + 2s) — exact and robust for ANY SPD
    input (the float32 Newton–Schulz loses stability above condition
    ~1/√ε ≈ 4·10³, and a uniform-random rank-2 block at a staircase
    random init CAN be that singular — one such block at plaza2 scale
    blew a whole solve to f ~ 10²⁴).

    d≥3: Newton–Schulz with a degeneracy guard — near-singular blocks
    (det/tr^d below threshold, i.e. random-init garbage, never a
    retraction of an on-manifold point) get a trace-relative shift that
    caps the condition number inside the float32 stability region.
    """
    d = M.shape[-1]
    tiny = jnp.finfo(M.dtype).tiny
    if d == 1:
        return 1.0 / jnp.sqrt(jnp.maximum(M, tiny))
    if d == 2:
        a = M[..., 0, 0]
        b = M[..., 0, 1]
        c = M[..., 1, 1]
        # degeneracy guard: a singular block has unbounded M^{-1/2} —
        # shift it (only it) into a bounded regime. Healthy blocks
        # (retraction inputs, M ≈ I) are exact.
        tr0 = a + c
        det0 = a * c - b * b
        shift = jnp.where(
            det0 < 1e-6 * jnp.maximum(tr0 * tr0, tiny), 1e-3 * tr0, 0.0)
        a = a + shift
        c = c + shift
        s = jnp.sqrt(jnp.maximum(a * c - b * b, tiny))
        t = jnp.sqrt(jnp.maximum(a + c + 2.0 * s, tiny))
        det_sh = jnp.maximum((a + s) * (c + s) - b * b, tiny)
        f = t / det_sh
        out = jnp.stack(
            [
                jnp.stack([f * (c + s), -f * b], axis=-1),
                jnp.stack([-f * b, f * (a + s)], axis=-1),
            ],
            axis=-2,
        )
        return out
    tr = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
    tr = jnp.maximum(tr, tiny)
    I = jnp.eye(d, dtype=M.dtype)
    # degeneracy guard: shift near-singular blocks into the NS stability
    # region (no-op for healthy blocks; retraction inputs are ~I)
    det = jnp.linalg.det(M)[..., None, None]
    degenerate = det / tr**d < 1e-6
    M = jnp.where(degenerate, M + 1e-3 * tr * I, M)
    tr = jnp.where(degenerate, tr * (1.0 + 1e-3 * d), tr)
    Mh = M / tr
    Y, Z = Mh, jnp.broadcast_to(I, M.shape)
    for _ in range(iters):
        T = 0.5 * (3.0 * I - bmm(Z, Y))
        Y = bmm(Y, T)
        Z = bmm(T, Z)
    return Z / jnp.sqrt(tr)


# ---------------------------------------------------------------------------
# Stiefel product: blocks (n, d, r), rows orthonormal
# ---------------------------------------------------------------------------

def stiefel_project(A: jax.Array) -> jax.Array:
    """Project (n,d,r) blocks onto St(d,r): A ↦ (A Aᵀ)^{-1/2} A.

    Reference: SVD projection at `src/StiefelProduct.cpp:8-36`.
    """
    AAT = bmm(A, jnp.swapaxes(A, -1, -2))
    return bmm(_inv_sqrt_psd(AAT), A)


def stiefel_tangent_project(Y: jax.Array, V: jax.Array) -> jax.Array:
    """Proj_{T_Y St}: V ↦ V − sym(Y Vᵀ) Y, batched over (n,d,r) blocks.

    Reference: `StiefelProduct.h:79-81` via SymBlockDiagProduct
    (`src/StiefelProduct.cpp:38-55`).
    """
    YVt = bmm(Y, jnp.swapaxes(V, -1, -2))
    return V - bmm(_sym(YVt), Y)


def stiefel_hess_correction(Y: jax.Array, nablaF: jax.Array, dotY: jax.Array) -> jax.Array:
    """sym(Y ∇Fᵀ) · Ẏ per block — the Weingarten term of the Riemannian
    Hessian (reference `CORA_problem.cpp:839-851`)."""
    YGt = bmm(Y, jnp.swapaxes(nablaF, -1, -2))
    return bmm(_sym(YGt), dotY)


def stiefel_random(key, n: int, d: int, r: int, dtype=jnp.float64) -> jax.Array:
    """Gaussian sample projected to the manifold (`StiefelProduct.cpp:57-69`)."""
    A = jax.random.normal(key, (n, d, r), dtype=dtype)
    return stiefel_project(A)


# ---------------------------------------------------------------------------
# Oblique manifold: rows (m, r), each unit-norm
# ---------------------------------------------------------------------------

def oblique_project(A: jax.Array, eps: float = 0.0) -> jax.Array:
    """Row-normalize (reference `src/ObliqueManifold.cpp:6-14`)."""
    norms = jnp.linalg.norm(A, axis=-1, keepdims=True)
    return A / jnp.maximum(norms, jnp.finfo(A.dtype).tiny)


def oblique_tangent_project(Y: jax.Array, V: jax.Array) -> jax.Array:
    """V ↦ V − ⟨y_i, v_i⟩ y_i per row (reference `ObliqueManifold.cpp:16-27`)."""
    inner = jnp.sum(Y * V, axis=-1, keepdims=True)
    return V - inner * Y


def oblique_random(key, m: int, r: int, dtype=jnp.float64) -> jax.Array:
    A = jax.random.normal(key, (m, r), dtype=dtype)
    return oblique_project(A)


# ---------------------------------------------------------------------------
# SO(d) rounding helpers (used by solution rounding, `CORA_utils.cpp:188-202`)
# ---------------------------------------------------------------------------

def project_to_SOd(M: jax.Array) -> jax.Array:
    """Batched projection of (…,d,d) matrices onto SO(d) via SVD with
    determinant correction."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    # flip the last column of U where the determinant is negative
    flip = jnp.where(det < 0, -1.0, 1.0)
    U = U.at[..., :, -1].multiply(flip[..., None])
    return U @ Vt
