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


def rk4_simulate(plant: ClassicalPlant, x0, us, dt):
    """Fixed-step RK4 over a ZOH control trajectory.

    :param x0: (dim_x,); :param us: (dim_u, n).
    :return: (dim_x, n+1) trajectory including x0.
    """
    h = dt / plant.substeps

    def substep(x, tu):
        t, u = tu
        k1 = plant.f(t, x, u)
        k2 = plant.f(t + h / 2, x + h / 2 * k1, u)
        k3 = plant.f(t + h / 2, x + h / 2 * k2, u)
        k4 = plant.f(t + h, x + h * k3, u)
        return x + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    def step(carry, u):
        x, t = carry
        for i in range(plant.substeps):
            x = substep(x, (t + i * h, u))
        return (x, t + dt), x

    (_, _), xs = jax.lax.scan(step, (x0, jnp.zeros((), x0.dtype)), us.T)
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
