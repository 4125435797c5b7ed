"""Open-system (Lindblad) quantum plant: dissipative master-equation
propagation in Liouville space.

The reference's plant is qutip.mesolve (reference experiment.py:209) - a
master-equation solver whose capability class includes collapse operators /
dissipation even though the reference tests run it unitarily. This module
closes that capability-class gap: the plant propagates

    dρ/dt = -i[H0 + Σ_i u_i H1_i, ρ] + Σ_k D[L_k],
    D[L] ρ = L ρ L† − ½{L†L, ρ}

by exact ZOH exponentiation of the (non-unitary) Liouvillian superoperator,
x⁺ = expm(dt (A0 + Σ_i u_i A_i)) x with x = vec(ρ) - the same
piecewise-constant-exact design as plants/quantum.py, one level up (d² × d²
generators instead of d × d Hamiltonians, since dissipative evolution is not
a conjugation). The control generators A_i stay purely Hamiltonian; all
dissipators live in the drift A0. Everything batches over scenario lanes as
matmul chains (expm_taylor for the TPU-batched form).

The MPC model side needs nothing new: `discretize_homogeneous` accepts the
Lindblad drift as A0 directly (the bilinear structure is unchanged; A0 is
just no longer skew-Hermitian), so exact open-system models come from the
same pipeline as closed-system ones (see presets.lindblad_state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.expm import expm_pade, expm_taylor
from ..ops.liouville import lindblad_generator, liouville_generator
from ..utils.linalg import isqrt


@struct.dataclass
class LindbladPlant:
    """Dissipative bilinear plant over vec(ρ) (identity lift/proj).

    Fields are the PRECOMPUTED Liouville-space generators (building them
    needs eager complex kron - do it on the CPU backend at fleet-construction
    time, like every preset does). The Hamiltonian drift and the dissipator
    are kept as SEPARATE superoperators so fleet detuning sweeps
    (parallel/fleet.make_scenario_batch) can scale the coherent part the
    same way they scale a QuantumPlant's H0, leaving the decay channel
    physical:
      AH0: (d², d²) Hamiltonian drift -i[H0, .]
      AD:  (d², d²) summed dissipators Σ_k D[L_k]
      A1s: (dim_u, d², d²) control generators (Hamiltonian commutators)
    """

    AH0: jnp.ndarray
    AD: jnp.ndarray
    A1s: jnp.ndarray
    sigma: jnp.ndarray  # measurement noise scale (scalar array)

    @property
    def A0(self) -> jnp.ndarray:
        """Full drift Lindbladian."""
        return self.AH0 + self.AD

    @property
    def dim_s(self) -> int:
        return isqrt(self.AH0.shape[0])

    @property
    def dim_u(self) -> int:
        return self.A1s.shape[0]

    @classmethod
    def create(cls, H0, H1s, c_ops=(), sigma=0.0):
        """Build from Hamiltonians + collapse operators.

        :param H0: (d, d) drift Hamiltonian.
        :param H1s: sequence of (d, d) control Hamiltonians.
        :param c_ops: sequence of (d, d) collapse operators L_k (e.g.
            sqrt(gamma) * sigma_minus for T1 decay).
        """
        AH0 = liouville_generator(H0)
        AD = lindblad_generator(jnp.zeros_like(jnp.asarray(H0)), c_ops)
        A1s = jnp.stack([liouville_generator(H) for H in H1s])
        rdtype = jnp.zeros(0, AH0.dtype).real.dtype
        return cls(AH0=AH0, AD=AD, A1s=A1s, sigma=jnp.asarray(sigma, rdtype))


def lindblad_lift(plant, x):
    """Identity lift (model space == vec(ρ) experiment space)."""
    return x


def lindblad_proj(plant, z):
    return z


def lindblad_step(plant: LindbladPlant, x_vec, u, dt):
    """One exact ZOH master-equation step: x⁺ = expm(dt A(u)) x."""
    uv = jnp.asarray(u).reshape(-1).astype(plant.A1s.real.dtype)
    A = plant.A0 + jnp.sum(uv[:, None, None] * plant.A1s, axis=0)
    return expm_pade(dt * A) @ x_vec.astype(A.dtype)


def lindblad_step_taylor(plant: LindbladPlant, x_vec, u, dt,
                         fixed_squarings: int = 4, order: int = 16):
    """lindblad_step with the matmul-only Taylor expm (the TPU-batched form;
    see plants/quantum.quantum_step_taylor for the norm-bound contract -
    accurate while ||dt A(u)||_1 <= 2^fixed_squarings; size both budgets
    host-side via `lindblad_norm_bound`)."""
    uv = jnp.asarray(u).reshape(-1).astype(plant.A1s.real.dtype)
    A = plant.A0 + jnp.sum(uv[:, None, None] * plant.A1s, axis=0)
    return expm_taylor(dt * A, order=order,
                       fixed_squarings=fixed_squarings) @ x_vec.astype(A.dtype)


def lindblad_norm_bound(plant: LindbladPlant, dt, sat) -> float:
    """Host-side worst-case ||dt A(u)||_1 over the control box |u| <= sat -
    the Liouvillian analogue of plants/quantum.taylor_norm_bound, for sizing
    the Taylor expm budget of `lindblad_step_taylor`."""
    import numpy as np

    one_norm = lambda M: float(np.max(np.sum(np.abs(np.asarray(M)), axis=-2)))
    A1s = np.asarray(plant.A1s)  # (..., dim_u, d, d): batched lanes OK
    sat_v = np.broadcast_to(np.asarray(sat, float), (A1s.shape[-3],))
    return abs(float(dt)) * (one_norm(plant.A0)
                             + sum(s * one_norm(A1s[..., k, :, :])
                                   for k, s in enumerate(sat_v)))


def lindblad_simulate(plant: LindbladPlant, x0, us, dt, key=None):
    """Propagate over a ZOH control trajectory; (d², n+1) states incl. x0.

    Optional complex Gaussian measurement noise of scale sigma when `key`
    is given (reference experiment.py:212 semantics)."""
    A = plant.A0[None] + jnp.einsum(
        "un,uij->nij", jnp.asarray(us).astype(plant.A1s.real.dtype), plant.A1s)
    Ps = expm_pade(dt * A)  # (n, d², d²) batched

    def step(x, P):
        x_n = P @ x
        return x_n, x_n

    x0c = x0.astype(Ps.dtype)
    _, xs_tail = jax.lax.scan(step, x0c, Ps)
    xs = jnp.concatenate([x0c[None], xs_tail], axis=0).T
    if key is not None:
        kr, ki = jax.random.split(key)
        rdtype = xs.real.dtype
        noise = (jax.random.normal(kr, xs.shape, rdtype)
                 + 1j * jax.random.normal(ki, xs.shape, rdtype))
        xs = xs + plant.sigma * noise
    return xs
