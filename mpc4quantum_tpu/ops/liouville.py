"""Liouville-space lifting and bilinear discretization.

`dρ/dt = -i[H0 + Σ_i u_i H1_i, ρ]` is vectorized onto a measurement-operator
basis into `dx/dt = (A0 + Σ_i u_i A_i) x` with x = vec(ρ); the continuous
bilinear system is then Dyson/Taylor-discretized to order k in dt, yielding the
discrete model `x+ = [A | N] [x ; f(u) (kr) x]` over the control-monomial
library.

Math parity with reference vectorize.py:8-75, implemented with fully
vectorized einsum contractions instead of python triple loops, so the whole
construction jits and differentiates. All combinatorics (operator products,
power binning) are static python executed at trace time.
"""

import math
from itertools import product as iproduct

import numpy as np
import jax.numpy as jnp

from .library import control_powers
from ..utils.linalg import default_cdtype


def vectorize_me(H, measure_list) -> jnp.ndarray:
    """Project a Hamiltonian onto a measurement basis as a Liouville generator.

    Returns A with A[j,k] = -i tr(σ_j† [H, σ_k]), the generator of
    dx/dt = A x for the coefficient vector ρ = Σ_k x_k σ_k - the role of
    reference vectorize.py:52-75.

    Deliberate deviation from the reference: the reference projects through
    conjugated structure constants (tr([σ_i,σ_j]† σ_k) with coefficients
    tr(H† σ_i), reference vectorize.py:60-74), which yields -conj(A_true) -
    i.e. a sign flip on the response to purely *imaginary* Hamiltonian terms
    (σ_y drives). That is harmless in the reference's tests only because its
    control boxes are symmetric (the optimizer mirrors the pulse). Here we
    generate the true commutator dynamics; verified against both the explicit
    ODE and the Kronecker identity in tests/test_liouville.py.

    :param H: (d, d) Hamiltonian (array-like).
    :param measure_list: length-m sequence of (d, d) basis operators, or an
        (m, d, d) array. Must be orthonormal under tr(A† B).
    :return: (m, m) complex Liouville generator.
    """
    cdtype = default_cdtype()
    basis = jnp.stack([jnp.asarray(s, dtype=cdtype) for s in measure_list])
    H = jnp.asarray(H, dtype=cdtype)

    # [H, σ_k]: (m, d, d)
    comm = jnp.einsum("ab,kbc->kac", H, basis) - jnp.einsum("kab,bc->kac", basis, H)
    # A[j,k] = -i tr(σ_j† [H, σ_k]) = -i Σ_ab conj(σ_j[a,b]) comm_k[a,b]
    return -1j * jnp.einsum("jab,kab->jk", jnp.conj(basis), comm)


def liouville_generator(H) -> jnp.ndarray:
    """Direct Liouville generator for the row-major vec convention.

    For x = vec(ρ) (row-major flatten, the convention used throughout the
    engine and the reference tests), -i[H, ρ] vectorizes to
    A = -i (H ⊗ I - I ⊗ H^T).  Equivalent to `vectorize_me` with the full
    |i><j| matrix-unit basis but O(d^2) instead of O(d^6) to build.
    """
    H = jnp.asarray(H, dtype=default_cdtype())
    d = H.shape[0]
    eye = jnp.eye(d, dtype=H.dtype)
    return -1j * (jnp.kron(H, eye) - jnp.kron(eye, H.T))


def dissipator(L) -> jnp.ndarray:
    """Lindblad dissipator superoperator for the row-major vec convention.

    D[L] vec(ρ) = vec(L ρ L† − ½{L†L, ρ}). With row-major vec
    (vec(ABC) = (A ⊗ Cᵀ) vec(B)):
        D[L] = L ⊗ conj(L) − ½ ((L†L) ⊗ I + I ⊗ (L†L)ᵀ).
    This is the open-system capability class of the reference's plant
    (qutip.mesolve accepts collapse operators, reference experiment.py:209,
    even though its tests run unitarily).
    """
    L = jnp.asarray(L, dtype=default_cdtype())
    d = L.shape[0]
    eye = jnp.eye(d, dtype=L.dtype)
    LdL = L.conj().T @ L
    return (jnp.kron(L, jnp.conj(L))
            - 0.5 * (jnp.kron(LdL, eye) + jnp.kron(eye, LdL.T)))


def lindblad_generator(H, c_ops=()) -> jnp.ndarray:
    """Full Lindbladian A = -i(H⊗I − I⊗Hᵀ) + Σ_k D[L_k] (row-major vec).

    The drift generator of the master equation
    dρ/dt = -i[H, ρ] + Σ_k (L_k ρ L_k† − ½{L_k†L_k, ρ}); propagate with
    x⁺ = expm(dt·A) x. Trace preservation (1ᵀ_diag A = 0) and the pure-decay
    analytic solution are asserted in tests/test_lindblad.py.
    """
    A = liouville_generator(H)
    for L in c_ops:
        A = A + dissipator(L)
    return A


def discretize_homogeneous(A_cts_list, dt, order: int) -> jnp.ndarray:
    """Order-k Dyson/Taylor discretization of bilinear dynamics.

    Expands exp(dt (A0 + Σ_i u_i A_i)) with u frozen over the step, binning
    every non-commutative operator product of length <= order by its control
    monomial signature (reference vectorize.py:8-49). Returns the blocks
    hstacked over the monomial library ordering of `control_powers`:
    shape (dim_x, dim_x * L) with L = size_of_library(order, dim_u).

    The product enumeration is static python; each bin accumulates jnp
    matmuls, so the result is jit/grad-compatible in (A_cts_list, dt).
    """
    cdtype = default_cdtype()
    A_ops = [jnp.asarray(A, dtype=cdtype) for A in A_cts_list]
    dim_x = A_ops[0].shape[0]
    dim_u = len(A_ops) - 1

    powers_list = control_powers(order, dim_u)  # (L, dim_u), constant first
    # Map monomial signature -> bin index (static dict).
    bin_index = {tuple(row): i for i, row in enumerate(powers_list)}

    bins = [jnp.zeros((dim_x, dim_x), dtype=cdtype) for _ in range(len(powers_list))]
    for an_order in range(order + 1):
        prefactor = (dt**an_order) / math.factorial(an_order)
        for a_product in iproduct(range(len(A_ops)), repeat=an_order):
            entry = jnp.eye(dim_x, dtype=cdtype)
            for i_op in a_product:
                entry = entry @ A_ops[i_op]
            # control-monomial signature of this product (ignore A0 = index 0)
            sig = [0] * dim_u
            for i_op in a_product:
                if i_op > 0:
                    sig[i_op - 1] += 1
            key = tuple(sig)
            if key not in bin_index:
                raise ValueError(
                    "Discretization error: control powers should contribute uniquely."
                )
            bins[bin_index[key]] = bins[bin_index[key]] + prefactor * entry
    return jnp.hstack(bins)
