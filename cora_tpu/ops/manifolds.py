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


def _solve_3x3_spd(Z, B):
    """Z⁻¹B for SPD 3×3 blocks via closed-form Cholesky + two unrolled
    triangular solves.

    Numerically stable for the badly-scaled Z = I + cW of the QDWH
    iteration (c up to ~10¹⁰): the Cholesky pivots are Schur complements
    — sums of positives minus one positive quotient — whose error is
    O(ε·c), unlike an adjugate/det inverse whose determinant cancellation
    error is O(ε·c³) and flips sign at large c (observed: inf/NaN blocks
    at α = 10⁶)."""
    tiny = jnp.finfo(Z.dtype).tiny
    z00, z01, z02 = Z[..., 0, 0, None], Z[..., 0, 1, None], Z[..., 0, 2, None]
    z11, z12, z22 = Z[..., 1, 1, None], Z[..., 1, 2, None], Z[..., 2, 2, None]
    l11 = jnp.sqrt(jnp.maximum(z00, tiny))
    l21 = z01 / l11
    l31 = z02 / l11
    l22 = jnp.sqrt(jnp.maximum(z11 - l21 * l21, tiny))
    l32 = (z12 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(z22 - l31 * l31 - l32 * l32, tiny))
    b1, b2, b3 = B[..., 0, :], B[..., 1, :], B[..., 2, :]
    y1 = b1 / l11
    y2 = (b2 - l21 * y1) / l22
    y3 = (b3 - l31 * y1 - l32 * y2) / l33
    s3 = y3 / l33
    s2 = (y2 - l32 * s3) / l22
    s1 = (y1 - l21 * s2 - l31 * s3) / l11
    return jnp.stack([s1, s2, s3], axis=-2)


def qdwh_weights(l0: float, iters: int = 8):
    """The QDWH (a, b, c) weight schedule for a σ_min/σ_max lower bound
    l0. Data-independent — the bound evolves by the same rational map as
    the singular values — so it is computed once in Python floats and
    baked into the compiled program as constants (shared with the Pallas
    tile kernel, `cora_tpu.ops.tiles`)."""
    import math

    ws = []
    l = l0
    for _ in range(iters):
        l2 = min(max(l * l, 1e-300), 1.0)
        dd = (4.0 * (1.0 - l2) / (l2 * l2)) ** (1.0 / 3.0)
        sq = math.sqrt(1.0 + dd)
        a = sq + 0.5 * math.sqrt(
            max(8.0 - 4.0 * dd + 8.0 * (2.0 - l2) / (l2 * sq), 0.0))
        b = 0.25 * (a - 1.0) ** 2
        c = a + b - 1.0
        ws.append((a, b, c))
        l = min(l * (a + b * l2) / (1.0 + c * l2), 1.0)
    return ws


def _polar_qdwh(A, iters: int = 8):
    """Batched left polar factor of wide (…, 3, r) blocks via QDWH —
    dynamically-weighted Halley iteration (Nakatsukasa–Bai–Gygi 2010).

    Works on A directly (singular values, never the squared Gram), so it
    keeps full dtype accuracy on the anisotropic Y + α·uwᵀ blocks that
    large-α saddle-escape trial retractions produce — Gram-based closed
    forms lose those blocks' small eigenvalues to the κ² squaring
    (advisor r4: ‖PPᵀ−I‖ ≈ 1 at α=10³ under the old guarded NS).
    Globally convergent from σ/σ_max ≥ l₀ in ≲6 iterations; each
    iteration is one d×d Gram, one closed-form SPD d×d inverse and one
    d×r product — pure VPU/MXU arithmetic, no eigh/SVD lowering, safe
    inside `lax.while_loop` TNT bodies and mirrored by the Pallas tile
    kernel (`cora_tpu.ops.tiles.TileOps.project_manifold`).

    Exactly singular blocks converge to the partial isometry (pseudo-
    polar) rather than blowing up. Weights use the Cholesky-variant
    bound l₀ chosen per dtype so (I + cW) stays far from overflow.
    """
    dtype = A.dtype
    tiny = jnp.finfo(dtype).tiny
    d = A.shape[-2]
    sigma_max = jnp.sqrt(
        jnp.maximum(jnp.sum(A * A, axis=(-2, -1), keepdims=True), tiny))
    X = A / sigma_max
    l0 = 1e-4 if dtype == jnp.float32 else 1e-8
    I = jnp.eye(d, dtype=dtype)
    for a, b, c in qdwh_weights(l0, iters):
        W = bmm(X, jnp.swapaxes(X, -1, -2))
        X = (b / c) * X + (a - b / c) * _solve_3x3_spd(I + c * W, X)
    return X


def _inv_sqrt_psd(M, iters: int = 25):
    """Batched M^{-1/2}: exact closed form for d=2, trace-scaled
    Newton–Schulz for d≥3 (d≥3 Stiefel blocks go through `_polar_qdwh`
    instead — see `stiefel_project`).

    Pure d×d arithmetic — compiles to a tiny fused program and runs on
    the MXU/VPU, unlike `eigh` whose QR-iteration lowering dominated the
    compile time of the TNT while-loop on TPU.

    d=2 closed form: with s = √det(M), M^{1/2} = (M + sI)/√(tr + 2s), so
    M^{-1/2} = inv(M + sI)·√(tr + 2s) — exact and robust for ANY SPD
    input (the float32 Newton–Schulz loses stability above condition
    ~1/√ε ≈ 4·10³, and a uniform-random rank-2 block at a staircase
    random init CAN be that singular — one such block at plaza2 scale
    blew a whole solve to f ~ 10²⁴).
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
    d=2 uses the exact Gram closed form; d≥3 uses QDWH on A directly
    (robust to the ill-conditioned blocks of large-α escape trials).
    """
    if A.shape[-2] == 3:
        return _polar_qdwh(A)
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
