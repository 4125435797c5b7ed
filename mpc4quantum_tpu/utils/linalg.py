"""Small linear-algebra helpers shared across the engine.

Parity notes: real/complex embeddings follow the convention of the reference
MPC helpers (reference mpc.py:82-98) - `complex_to_real_op` builds the
[[Re, -Im], [Im, Re]] block embedding.
"""

import math

import jax.numpy as jnp


def default_cdtype():
    """Complex dtype matching the currently enabled precision."""
    return jnp.complex128 if jnp.zeros(0).dtype == jnp.float64 else jnp.complex64


def default_rdtype():
    return jnp.zeros(0).dtype


def complex_to_real(z):
    """Complex vector of length n -> real vector of length 2n (Re then Im)."""
    z = jnp.asarray(z)
    return jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=0)


def real_to_complex(x):
    """Real vector of length 2n -> complex vector of length n."""
    x = jnp.asarray(x)
    n = x.shape[0] // 2
    return x[:n] + 1j * x[n:]


def complex_to_real_op(P):
    """Complex operator -> real [[Re, -Im], [Im, Re]] block embedding."""
    P = jnp.asarray(P)
    return jnp.block([[jnp.real(P), -jnp.imag(P)], [jnp.imag(P), jnp.real(P)]])


def real_to_complex_op(P):
    row, col = P.shape
    return P[: row // 2, : col // 2] + 1j * P[row // 2 :, : col // 2]


def cx_mm(a, b):
    """Matmul that never feeds a real->complex CAST into the dot.

    Mixed real x complex matmuls are computed as two real-x-real (or
    complex-part) matmuls joined with lax.complex. On the axon TPU backend a
    batched dot whose operand is a convert-from-real raises UNIMPLEMENTED
    (measured, round 2 probes); mathematically this form is identical and
    costs the same FLOPs (the cast form secretly doubles them anyway).
    """
    import jax

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    a_cx = jnp.issubdtype(a.dtype, jnp.complexfloating)
    b_cx = jnp.issubdtype(b.dtype, jnp.complexfloating)
    if a_cx and not b_cx:
        return jax.lax.complex(jnp.real(a) @ b, jnp.imag(a) @ b)
    if b_cx and not a_cx:
        return jax.lax.complex(a @ jnp.real(b), a @ jnp.imag(b))
    return a @ b


def cx_solve(A, B):
    """Batched linear solve; complex systems are solved through the real
    block embedding [[Re, -Im], [Im, Re]] so only a *real* LU runs on the
    device (complex LU is not implemented on all TPU backend paths, while
    complex add/mul/matmul decompose fine)."""
    import jax

    A = jnp.asarray(A)
    B = jnp.asarray(B)
    if not jnp.issubdtype(A.dtype, jnp.complexfloating):
        if jnp.issubdtype(B.dtype, jnp.complexfloating):
            # real A, complex B: solve both parts against the one real LU
            Xr = jnp.linalg.solve(A, jnp.concatenate([B.real, B.imag], axis=-1))
            m = B.shape[-1]
            return jax.lax.complex(Xr[..., :m], Xr[..., m:])
        return jnp.linalg.solve(A, B)
    d = A.shape[-1]
    Ar = jnp.concatenate(
        [jnp.concatenate([A.real, -A.imag], axis=-1),
         jnp.concatenate([A.imag, A.real], axis=-1)], axis=-2,
    )
    B = B.astype(A.dtype)
    Br = jnp.concatenate([B.real, B.imag], axis=-2)
    Xr = jnp.linalg.solve(Ar, Br)
    return jax.lax.complex(Xr[..., :d, :], Xr[..., d:, :])


def isqrt(n: int) -> int:
    """Integer square root of a python int (static shapes only)."""
    return math.isqrt(n)


def split_blocks(bmatrix, nrows: int, ncols: int):
    """Split a (R, C) block matrix into its (R/nrows * C/ncols, nrows, ncols)
    sub-blocks, ordered row-major over the block grid
    (behavioral parity with reference experiment.py:309-315)."""
    r, c = bmatrix.shape
    return (
        bmatrix.reshape(r // nrows, nrows, c // ncols, ncols)
        .swapaxes(1, 2)
        .reshape(-1, nrows, ncols)
    )


def gj_inverse(K):
    """Exact inverse of a batched (.., n, n) matrix by unpivoted
    Gauss-Jordan in MATRIX form: n serial column-elimination steps of
    whole-tensor elementwise ops (static one-hot row masks, no scatter, no
    LU/Cholesky primitive - batches on the axon TPU backend, where
    factorization lowerings are unavailable under vmap).

    Trace size is O(n) ops (vs the O(n^3) scalar-decomposed form the small
    Pallas QP kernel uses in-kernel, and vs the 2*ns_iters (n, n)-matmul
    Newton-Schulz chain) - measured as the cheap exact inverse for the
    condensed MPC Hessians K = P + (sigma + rho) I, whose rho shift makes
    the unpivoted elimination well-conditioned (SPD, bounded diagonal
    growth).
    """
    import numpy as _np

    n = K.shape[-1]
    if n == 1:
        return 1.0 / K
    Inv = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), K.shape)
    for col in range(n):
        rowmask = _np.zeros((n, 1), bool)
        rowmask[col] = True
        piv = 1.0 / K[..., col:col + 1, col:col + 1]
        prow_K = K[..., col:col + 1, :] * piv
        prow_I = Inv[..., col:col + 1, :] * piv
        fac = K[..., :, col:col + 1]
        K = jnp.where(rowmask, prow_K, K - fac * prow_K)
        Inv = jnp.where(rowmask, prow_I, Inv - fac * prow_I)
    return Inv
