"""Control-monomial libraries and Khatri-Rao products.

The bilinear model class is `x+ = A x + N (f(u) (kr) x)` where `f(u)` is the
vector of control monomials of total degree 1..order (the constant monomial is
carried by `A`). The *power list* enumerating those monomials is static
combinatorics evaluated at trace time; lifting a control trajectory is then a
single broadcasted power/product - no per-monomial lambdas (contrast reference
linearize.py:123-140, which builds one python lambda per monomial).

Ordering parity: the reference orders monomials by reversed stars-and-bars
(reference linearize.py:92-116) - constant first, then u1, u2, ..., then
second-order terms. `control_powers` reproduces that ordering exactly so that
discretized operators are column-compatible with the reference layout.
"""

from itertools import combinations

import numpy as np
import jax.numpy as jnp


def _multinomial_powers(n: int, k: int):
    """All exponent tuples of the expansion (x_1+...+x_k)^n via stars-and-bars
    (same enumeration as reference linearize.py:92-110)."""
    for bars in combinations(range(n + k - 1), k - 1):
        elem = np.array([-1] + list(bars) + [n + k - 1])
        yield elem[1:] - elem[:-1] - 1


def control_powers(order: int, dim_u: int) -> np.ndarray:
    """Static (L, dim_u) int array of monomial exponents, constant term first.

    Row ordering matches reference linearize.py:113-116 (`create_power_list`):
    powers of (1 + u_1 + ... + u_dim_u)^order with the reversed tuple ordering.
    """
    rows = [p[:-1][::-1] for p in _multinomial_powers(order, dim_u + 1)]
    return np.asarray(rows, dtype=np.int64).reshape(len(rows), dim_u)


def size_of_library(order: int, dim_u: int) -> int:
    """Number of monomials incl. the constant (reference linearize.py:119)."""
    return control_powers(order, dim_u).shape[0]


def lift_controls(us, powers) -> jnp.ndarray:
    """Evaluate a monomial library on a control trajectory.

    :param us: (dim_u, n) real controls.
    :param powers: static (L, dim_u) integer exponents; negative exponents
        evaluate to 0 (the convention used for symbolic derivatives,
        reference linearize.py:123-127).
    :return: (L, n) lifted controls.
    """
    us = jnp.atleast_2d(us)
    powers = np.asarray(powers)
    # The exponents are tiny static ints (<= order), so each monomial is an
    # unrolled chain of multiplies - no pow/reduce-prod in the graph (both
    # are exotic lowerings some TPU backend paths lack when batched, and the
    # multiplies are cheaper anyway). Negative exponent -> monomial is 0.
    cols = []
    for row in powers:
        if (row < 0).any():
            cols.append(jnp.zeros(us.shape[1:], us.dtype))
            continue
        acc = None
        for i, p in enumerate(row):
            for _ in range(int(p)):
                acc = us[i] if acc is None else acc * us[i]
        cols.append(jnp.ones(us.shape[1:], us.dtype) if acc is None else acc)
    return jnp.stack(cols, axis=0)


def diff_library_powers(order: int, dim_u: int):
    """Static data for the gradient of the (non-constant) monomial library.

    Returns (dpowers, dcoefs):
      dpowers: (dim_u, L-1, dim_u) exponents of d(monomial_l)/d(u_i)
      dcoefs:  (dim_u, L-1) multiplying coefficients (the original exponent)
    Same math as reference linearize.py:143-164 (`diff_library`), with the
    (functions, coefficients) pair flattened to arrays.
    """
    plist = control_powers(order, dim_u)[1:]  # drop constant term
    dpowers = np.stack([plist - np.eye(dim_u, dtype=np.int64)[i] for i in range(dim_u)])
    dcoefs = np.stack([plist[:, i] for i in range(dim_u)]).astype(np.float64)
    return dpowers, dcoefs


def diff_lift_controls(us, dpowers, dcoefs) -> jnp.ndarray:
    """Evaluate the monomial-library Jacobian wrt controls.

    :param us: (dim_u, n) controls.
    :return: (dim_u, L-1, n) array J[i, l, t] = d f_l(u_t) / d u_i.
    """
    us = jnp.atleast_2d(us)
    dim_u = us.shape[0]
    cols = [
        jnp.asarray(dcoefs[i])[:, None].astype(us.dtype)
        * lift_controls(us, dpowers[i])
        for i in range(dim_u)
    ]
    return jnp.stack(cols, axis=0)


def krtimes(A, B) -> jnp.ndarray:
    """Khatri-Rao (column-wise Kronecker) product.

    :param A: (La, n); :param B: (Lb, n).
    :return: (La*Lb, n) with out[a*Lb + b, t] = A[a, t] * B[b, t]
        (same layout as reference linearize.py:80-89).
    """
    A = jnp.atleast_2d(A)
    B = jnp.atleast_2d(B)
    n = A.shape[1]
    # broadcast multiply (no einsum/dot): elementwise complex x real mixes
    # lower uniformly on every backend path
    return (A[:, None, :] * B[None, :, :]).reshape(-1, n)
