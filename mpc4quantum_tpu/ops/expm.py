"""Batched matrix exponential for small operators.

This is the plant's hot op: propagating a Liouville/Hilbert-space state under
piecewise-constant controls is `x_{t+1} = expm(dt * H(u_t)) x_t`. The matrices
are tiny (4..16) but there are *many* of them (horizon x scenario batch), so
the implementation is natively batched over leading dims - one fused chain of
batched matmuls that XLA maps onto the MXU - rather than a vmap of a
scalar-control scaling-and-squaring loop.

Replaces qutip.mesolve / qutip.propagator (reference experiment.py:209,403):
for zero-order-hold controls (which the reference itself uses via interp1d
kind='previous', reference mpc.py:258) the piecewise propagator is *exact*,
so this is both faster and more accurate than adaptive ODE integration.

Algorithm: Pade-13 with scaling and squaring; the squaring count is dynamic
data (per batch element) but the loop bound is static (`max_squarings`),
with masked squaring so the whole thing scans/jits with fixed shapes.
"""

from functools import partial

import jax
import jax.numpy as jnp

# Pade-13 numerator coefficients (b0..b13).
_B = (
    64764752532480000.0,
    32382376266240000.0,
    7771770303897600.0,
    1187353796428800.0,
    129060195264000.0,
    10559470521600.0,
    670442572800.0,
    33522128640.0,
    1323241920.0,
    40840800.0,
    960960.0,
    16380.0,
    182.0,
    1.0,
)
_THETA_13 = 5.371920351148152


from ..utils.linalg import cx_solve as _solve  # real-embedded complex solve


@partial(jax.jit, static_argnames=("max_squarings",))
def expm_pade(A, max_squarings: int = 16):
    """Matrix exponential of A, batched over leading dimensions.

    :param A: (..., d, d) real or complex.
    :param max_squarings: static bound on the squaring count; norms requiring
        more squarings than this saturate (accuracy degrades gracefully).
    :return: (..., d, d) expm(A).
    """
    A = jnp.asarray(A)
    d = A.shape[-1]
    batch_shape = A.shape[:-2]

    # 1-norm per batch element -> squaring count s with ||A/2^s|| <= theta13.
    norm1 = jnp.max(jnp.sum(jnp.abs(A), axis=-2), axis=-1)
    s = jnp.ceil(jnp.log2(jnp.maximum(norm1 / _THETA_13, 1.0)))
    s = jnp.clip(s, 0, max_squarings)
    scale = jnp.exp2(-s).astype(A.real.dtype)
    As = A * scale[..., None, None]

    eye = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), A.shape)
    A2 = As @ As
    A4 = A2 @ A2
    A6 = A2 @ A4
    U = As @ (
        A6 @ (_B[13] * A6 + _B[11] * A4 + _B[9] * A2)
        + _B[7] * A6
        + _B[5] * A4
        + _B[3] * A2
        + _B[1] * eye
    )
    V = (
        A6 @ (_B[12] * A6 + _B[10] * A4 + _B[8] * A2)
        + _B[6] * A6
        + _B[4] * A4
        + _B[2] * A2
        + _B[0] * eye
    )
    R = _solve(V - U, V + U)

    # Masked squaring: square exactly `s` times under a static loop bound.
    def body(i, R):
        keep = (i < s)[..., None, None]
        return jnp.where(keep, R @ R, R)

    return jax.lax.fori_loop(0, max_squarings, body, R)


@partial(jax.jit, static_argnames=("order", "max_squarings", "fixed_squarings"))
def expm_taylor(A, order: int = 16, max_squarings: int = 16,
                fixed_squarings: int | None = None):
    """Matrix exponential via scaling-and-squaring + Horner Taylor.

    Matmul-only: unlike `expm_pade` there is NO linear solve in the graph, so
    it batches over leading dims as pure (MXU-shaped) matmul chains - the
    safe form for TPU backends whose *batched* LU/triangular lowerings are
    unavailable, and the natural form for large (scenario x horizon) batches.

    Accuracy: with theta = 1.0 the truncation error is ~1/(order+1)! ~ 3e-14
    at order 16 - machine precision in f32, near-machine in f64. Replaces
    qutip.mesolve/propagator (reference experiment.py:209,403) identically to
    expm_pade.

    :param A: (..., d, d) real or complex.
    :param fixed_squarings: if set, scale by exactly 2^-fixed_squarings and
        square that many times unconditionally - python-unrolled, so the
        graph contains NO loop primitive at all (the fully flat TPU form).
        Accurate to ~1/(order+1)! while ||A|| <= 2^fixed_squarings; caller's
        responsibility to bound the norm. If None, the squaring count adapts
        to the per-element norm under a masked fori_loop.
    """
    A = jnp.asarray(A)
    d = A.shape[-1]
    theta = 1.0
    eye = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), A.shape)

    if fixed_squarings is not None:
        As = A * (2.0 ** -fixed_squarings)
        E = eye + As / order
        for k in range(order - 1, 0, -1):
            E = eye + (As @ E) / k
        for _ in range(fixed_squarings):
            E = E @ E
        return E

    norm1 = jnp.max(jnp.sum(jnp.abs(A), axis=-2), axis=-1)
    s = jnp.ceil(jnp.log2(jnp.maximum(norm1 / theta, 1.0)))
    s = jnp.clip(s, 0, max_squarings)
    scale = jnp.exp2(-s).astype(A.real.dtype)
    As = A * scale[..., None, None]

    # Horner: E = I + A(I + A/2 (I + A/3 (...)))
    E = eye + As / order
    for k in range(order - 1, 0, -1):
        E = eye + (As @ E) / k

    def body(i, R):
        keep = (i < s)[..., None, None]
        return jnp.where(keep, R @ R, R)

    return jax.lax.fori_loop(0, max_squarings, body, E)


def step_generators(H0, H1s, us):
    """Assemble per-step generators H(u_t) = H0 + sum_i u_i(t) H1_i.

    :param H0: (d, d); :param H1s: (dim_u, d, d); :param us: (dim_u, n).
    :return: (n, d, d) batched generators.
    """
    H0 = jnp.asarray(H0)
    H1s = jnp.asarray(H1s)
    us = jnp.atleast_2d(us)
    return H0[None] + jnp.einsum("ut,udc->tdc", us.astype(H1s.dtype), H1s)


def propagators_from_controls(H0, H1s, us, dt, hermitian_generator: bool = True):
    """Per-step propagators for piecewise-constant controls.

    :param hermitian_generator: if True, H are Hamiltonians and the propagator
        is expm(-1j * dt * H); if False, H are already generators (e.g.
        Liouville A matrices) and the propagator is expm(dt * H).
    :return: (n, d, d) propagators, one per control column.
    """
    Hs = step_generators(H0, H1s, us)
    if hermitian_generator:
        return expm_pade((-1j * dt) * Hs)
    return expm_pade(dt * Hs)
