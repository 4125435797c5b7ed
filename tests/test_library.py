"""Oracle tests for the control-monomial library (vs hand-computed values and
the ordering contract documented from reference linearize.py:92-164)."""

import numpy as np
import jax.numpy as jnp

from mpc4quantum_tpu.ops.library import (
    control_powers,
    size_of_library,
    lift_controls,
    diff_library_powers,
    diff_lift_controls,
    krtimes,
)


def test_power_list_ordering_one_control():
    # order 2, one control: constant, u, u^2 (reference ordering contract)
    p = control_powers(2, 1)
    assert p.tolist() == [[0], [1], [2]]


def test_power_list_ordering_two_controls():
    # order 1, two controls: constant, u1, u2
    p = control_powers(1, 2)
    assert p.tolist() == [[0, 0], [1, 0], [0, 1]]


def test_power_list_order2_two_controls():
    p = control_powers(2, 2)
    # all multinomial powers of total degree <= 2, constant first
    assert p.shape == (6, 2)
    assert p[0].tolist() == [0, 0]
    totals = p.sum(axis=1)
    assert totals.max() == 2
    # every distinct signature appears exactly once
    assert len({tuple(r) for r in p.tolist()}) == 6


def test_size_of_library():
    # binomial(order + dim_u, dim_u) monomials of degree <= order
    assert size_of_library(2, 1) == 3
    assert size_of_library(2, 2) == 6
    assert size_of_library(4, 1) == 5
    assert size_of_library(1, 3) == 4


def test_lift_controls_values():
    us = jnp.array([[0.5, -2.0], [3.0, 0.0]])  # (dim_u=2, n=2)
    powers = control_powers(2, 2)
    lifted = np.asarray(lift_controls(us, powers))
    for l, p in enumerate(powers):
        expect = (np.asarray(us[0]) ** p[0]) * (np.asarray(us[1]) ** p[1])
        np.testing.assert_allclose(lifted[l], expect, rtol=1e-12)


def test_lift_negative_power_is_zero():
    us = jnp.array([[2.0, 3.0]])
    lifted = np.asarray(lift_controls(us, np.array([[-1]])))
    np.testing.assert_allclose(lifted, 0.0)


def test_diff_library_matches_finite_difference():
    order, dim_u = 3, 2
    dpowers, dcoefs = diff_library_powers(order, dim_u)
    u = jnp.array([[0.7], [-1.3]])
    J = np.asarray(diff_lift_controls(u, dpowers, dcoefs))[:, :, 0]  # (dim_u, L-1)

    powers = control_powers(order, dim_u)[1:]
    eps = 1e-6
    for i in range(dim_u):
        up = np.asarray(u[:, 0]).copy()
        um = up.copy()
        up[i] += eps
        um[i] -= eps
        fp = np.prod(up[None, :] ** powers, axis=1)
        fm = np.prod(um[None, :] ** powers, axis=1)
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(J[i], fd, rtol=1e-5, atol=1e-7)


def test_krtimes_layout():
    A = jnp.array([[1.0, 2.0], [3.0, 4.0]])  # (2, n=2)
    B = jnp.array([[5.0, 6.0], [7.0, 8.0], [9.0, 10.0]])  # (3, n=2)
    out = np.asarray(krtimes(A, B))
    assert out.shape == (6, 2)
    # out[a*3 + b, t] = A[a, t] * B[b, t]
    for a in range(2):
        for b in range(3):
            for t in range(2):
                assert out[a * 3 + b, t] == A[a, t] * B[b, t]
