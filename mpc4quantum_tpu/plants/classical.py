"""Classical demo plants with a fixed-step RK4 integrator.

Replaces scipy.solve_ivp (reference experiment.py:52-151, `CExperiment` and
the VanDerPol / Rotor demos) with a jit/scan-compatible RK4 over ZOH
controls. Each plant carries a Koopman-style lift/proj pair where the
reference defines one (VanDerPol's [x1, x2, x1^2, x1^2 x2] lift,
reference experiment.py:124-132).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ClassicalPlant:
    """ODE plant dx/dt = f(t, x, u) with optional lift/proj adapters."""

    f: Callable = struct.field(pytree_node=False)
    lift: Callable = struct.field(pytree_node=False)
    proj: Callable = struct.field(pytree_node=False)
    dim_x: int = struct.field(pytree_node=False)
    dim_u: int = struct.field(pytree_node=False)
    substeps: int = struct.field(pytree_node=False, default=8)


def _identity(x):
    return x


def rk4_simulate(plant: ClassicalPlant, x0, us, dt, interp: str = "zoh"):
    """Fixed-step RK4 over a control trajectory.

    :param x0: (dim_x,); :param us: (dim_u, n).
    :param interp: control interpolation between samples - "zoh" (piecewise
        constant, the engine-wide convention) or "linear" (the reference
        CExperiment's default: controls passed as arrays are linearly
        interpolated through scipy interp1d, reference experiment.py:87;
        each RK4 stage evaluates u(t) on the segment u_k -> u_{k+1}, the
        last segment holding u_{n-1}).
    :return: (dim_x, n+1) trajectory including x0.
    """
    if interp not in ("zoh", "linear"):
        raise ValueError(f"interp={interp!r}: 'zoh' or 'linear'")
    h = dt / plant.substeps
    n = us.shape[1]
    # segment endpoints: linear interpolates u_k -> u_{k+1} across step k
    # (clamped at the end, matching interp1d's behavior inside the range);
    # zoh holds u_k
    us_next = (jnp.concatenate([us[:, 1:], us[:, -1:]], axis=1)
               if interp == "linear" else us)

    def step(carry, uu):
        x, t0 = carry
        u0, u1 = uu
        # per-stage control: exact on the linear segment (collapses to the
        # constant u0 for zoh since u1 == u0 there)
        u_at = lambda tt: u0 + (u1 - u0) * ((tt - t0) / dt).astype(x.dtype)

        def substep(x, t):
            k1 = plant.f(t, x, u_at(t))
            k2 = plant.f(t + h / 2, x + h / 2 * k1, u_at(t + h / 2))
            k3 = plant.f(t + h / 2, x + h / 2 * k2, u_at(t + h / 2))
            k4 = plant.f(t + h, x + h * k3, u_at(t + h))
            return x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

        for i in range(plant.substeps):
            x = substep(x, t0 + i * h)
        return (x, t0 + dt), x

    (_, _), xs = jax.lax.scan(step, (x0, jnp.zeros((), x0.dtype)),
                              (us.T, us_next.T))
    return jnp.concatenate([x0[None], xs], axis=0).T


def VanDerPol(mu: float, substeps: int = 8) -> ClassicalPlant:
    """Van der Pol oscillator with its Koopman lift
    (reference experiment.py:93-132)."""

    def f(t, x, u):
        x1, x2 = x[0], x[1]
        return jnp.stack([x2, -x1 + mu * (1 - x1**2) * x2 + jnp.reshape(u, (-1,))[0]])

    def lift(x):
        x1, x2 = x[0], x[1]
        return jnp.stack([x1, x2, x1**2, x1**2 * x2])

    def proj(z):
        return z[:2]

    return ClassicalPlant(f=f, lift=lift, proj=proj, dim_x=2, dim_u=1, substeps=substeps)


def Rotor(epsilon: float, substeps: int = 8) -> ClassicalPlant:
    """Controlled-frequency rotation (reference experiment.py:135-151)."""

    def f(t, x, u):
        x1, x2 = x[0], x[1]
        omega = 1 + epsilon * jnp.reshape(u, (-1,))[0]
        return jnp.stack([omega * x2, -omega * x1])

    return ClassicalPlant(f=f, lift=_identity, proj=_identity, dim_x=2, dim_u=1, substeps=substeps)
