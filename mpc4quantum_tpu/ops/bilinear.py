"""Trajectory-local linearization of discrete bilinear models.

Wraps the discrete model `x+ = A x + N (f(u) (kr) x)` (A from the constant
monomial, N over the non-constant library) and produces the per-timestep
affine models `x_{t+1} = Delta_t + A_t x_t + B_t u_t` that the horizon QP
consumes. Same math as reference linearize.py:8-77 (`WrapModel`), with the
per-step python loop of `get_model_along_traj` (reference linearize.py:61-70)
replaced by one `vmap` over the horizon, and the analytic Jacobians expressed
as single einsum contractions over the unpacked N tensor.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .library import (
    control_powers,
    diff_library_powers,
    lift_controls,
    diff_lift_controls,
    size_of_library,
)
from ..utils.linalg import cx_mm


@struct.dataclass
class BilinearModel:
    """Discrete bilinear model with its (static) monomial library.

    A: (dim_x, dim_x) constant-monomial operator.
    N: (dim_x, Lm, dim_x) unpacked control operator, Lm = L - 1 non-constant
       monomials; N[:, l, :] acts on (f_l(u) * x).
    powers / dpowers / dcoefs: static library data (trace-time constants).
    """

    A: jnp.ndarray
    N: jnp.ndarray
    dim_u: int = struct.field(pytree_node=False)
    order: int = struct.field(pytree_node=False)

    @property
    def dim_x(self) -> int:
        return self.A.shape[0]

    @property
    def polyu_dim(self) -> int:
        return self.N.shape[1]

    @classmethod
    def from_stacked(cls, A_op, N_op, dim_u: int, order: int) -> "BilinearModel":
        """Build from the hstacked operator layout `[A | N_flat]` used by the
        discretizer and DMDc (reference linearize.py:13-32 semantics,
        including the library-dimension validation)."""
        A_op = jnp.asarray(A_op)
        N_op = jnp.asarray(N_op)
        dim_x = A_op.shape[1]
        polyu_dim = N_op.shape[1] // dim_x
        if size_of_library(order, dim_u) - 1 != polyu_dim:
            raise ValueError("Dimension mismatch when wrapping a model operator.")
        # Stacked layout is [N_1 | N_2 | ...] over monomials (krtimes order:
        # monomial-major, state-minor), i.e. column l*dim_x + j multiplies
        # f_l(u) * x_j.
        N = N_op.reshape(dim_x, polyu_dim, dim_x)
        return cls(A=A_op, N=N, dim_u=dim_u, order=order)

    def lib_powers(self) -> np.ndarray:
        return control_powers(self.order, self.dim_u)[1:]

    def lift_u(self, us) -> jnp.ndarray:
        """(dim_u, n) controls -> (Lm, n) non-constant monomials."""
        return lift_controls(us, self.lib_powers())


def _polyu(model: BilinearModel, u) -> jnp.ndarray:
    return model.lift_u(u.reshape(-1, 1))[:, 0]


def bilinear_f(model: BilinearModel, x, u) -> jnp.ndarray:
    """x+ = A x + sum_l f_l(u) N_l x (reference linearize.py:37-41)."""
    polyu = _polyu(model, u).astype(model.N.dtype)
    return model.A @ x + jnp.einsum("l,xly,y->x", polyu, model.N, x)


def bilinear_df_dx(model: BilinearModel, u) -> jnp.ndarray:
    """d f / d x = A + sum_l f_l(u) N_l (reference linearize.py:43-48)."""
    polyu = _polyu(model, u).astype(model.N.dtype)
    return model.A + jnp.einsum("l,xly->xy", polyu, model.N)


def bilinear_df_du(model: BilinearModel, x, u) -> jnp.ndarray:
    """d f / d u = sum_l (N_l x) d f_l / d u (reference linearize.py:50-59)."""
    dpowers, dcoefs = diff_library_powers(model.order, model.dim_u)
    dpolyu = diff_lift_controls(u.reshape(-1, 1), dpowers, dcoefs)[:, :, 0]
    # dpolyu: (dim_u, Lm). Nx: (dim_x, Lm).
    Nx = jnp.einsum("xly,y->xl", model.N, x)
    return jnp.einsum("xl,il->xi", Nx, dpolyu.astype(model.N.dtype))


def _affine_at(model: BilinearModel, x, u):
    A_t = bilinear_df_dx(model, u)
    B_t = bilinear_df_du(model, x, u)
    pred = A_t @ x + B_t @ u.astype(B_t.dtype)
    delta = bilinear_f(model, x, u) - pred
    return A_t, B_t, delta


def model_along_traj(model: BilinearModel, X, U):
    """Per-timestep affine models along a guess trajectory.

    :param X: (dim_x, H) states; :param U: (dim_u, H) controls.
    :return: (A_s, B_s, Delta_s) with shapes (H, dim_x, dim_x),
        (H, dim_x, dim_u), (H, dim_x).

    The horizon axis is batched NATIVELY in single einsum contractions (not
    an inner vmap), replacing the python loop of reference linearize.py:61-70.
    Natively-batched contractions keep the op structure identical whether or
    not an outer scenario vmap wraps this function - double-vmapped
    contractions are both slower and unsupported on some TPU backend paths.

    Exactness note: the model is linear in x, so f(x, u) = df_dx(u) @ x and
    the affine residual collapses to Delta_t = -B_t u_t (same value the
    reference computes via f - A x - B u at linearize.py:65-69).
    """
    dim_x = model.dim_x
    Lm = model.polyu_dim
    H = U.shape[1]
    polyu = model.lift_u(U)                                       # (Lm, H) real
    dpowers, dcoefs = diff_library_powers(model.order, model.dim_u)
    dpolyu = diff_lift_controls(U, dpowers, dcoefs)               # (dim_u, Lm, H) real

    # All contractions as plain (batched) 2-D matmuls + reshapes - the most
    # uniformly supported lowering and the MXU-native form - with mixed
    # real/complex products routed through cx_mm (a dot fed by a
    # real->complex convert is an unimplemented batched lowering on the
    # axon backend; split-real matmuls are also FLOP-cheaper):
    #   A_t = A + sum_l f_l(u_t) N_l      : (H, Lm) @ (Lm, x*y)
    N_flat = jnp.transpose(model.N, (1, 0, 2)).reshape(Lm, dim_x * dim_x)
    A_s = model.A[None] + cx_mm(polyu.T, N_flat).reshape(H, dim_x, dim_x)
    #   (N x)_t[:, l] = N[:, l, :] @ x_t  : (x*l, y) @ (y, H)
    NX = cx_mm(model.N.reshape(dim_x * Lm, dim_x), X)
    NX = jnp.transpose(NX.reshape(dim_x, Lm, H), (2, 0, 1))          # (H, x, Lm)
    #   B_t = (N x)_t @ (d f/d u)_t^T     : batched (x, Lm) @ (Lm, dim_u)
    B_s = cx_mm(NX, jnp.transpose(dpolyu, (2, 1, 0)))                # (H, x, dim_u)
    #   Delta_t = -B_t u_t (model linear in x => f = df_dx x exactly)
    D_s = -cx_mm(B_s, jnp.transpose(U, (1, 0))[:, :, None])[:, :, 0]
    return A_s, B_s, D_s


def model_from_initial(model: BilinearModel, X, U):
    """Freeze the step-0 linearization across the horizon
    (reference linearize.py:72-77)."""
    H = X.shape[1]
    A0, B0, d0 = _affine_at(model, X[:, 0], U[:, 0])
    tile = lambda a: jnp.broadcast_to(a, (H,) + a.shape)
    return tile(A0), tile(B0), tile(d0)
