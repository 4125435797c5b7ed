"""Gate-synthesis plant: MPC in process-matrix space.

The state is the flattened process matrix P = U (x) U^* (dim n^4), the
"density matrix of a unitary" (reference experiment.py:336-417, `QSynthesis`).
Simulation propagates the underlying unitary with exact ZOH propagators
(replacing qutip.propagator, reference experiment.py:399-408) and re-lifts.

proj (process -> unitary up to global phase) is made jit-friendly: instead of
the reference's python loop over blocks looking for the first nonzero one
(reference experiment.py:369-387), we select the block with the largest
magnitude pivot by a one-hot contraction - same result up to global phase,
and numerically better conditioned.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.expm import expm_pade, step_generators
from ..utils.linalg import isqrt, split_blocks


@struct.dataclass
class SynthesisPlant:
    """Unitary-synthesis plant dU/dt = -i H(u) U in process-matrix space."""

    H0: jnp.ndarray  # (n, n)
    H1s: jnp.ndarray  # (dim_u, n, n)

    @property
    def dim_s(self) -> int:
        return self.H0.shape[0]

    @property
    def dim_u(self) -> int:
        return self.H1s.shape[0]

    @classmethod
    def create(cls, H0, H1s):
        H0 = jnp.asarray(H0)
        H1s = jnp.stack([jnp.asarray(H, H0.dtype) for H in H1s])
        return cls(H0=H0, H1s=H1s)


def lift_unitary(U_vec):
    """U (n^2,) -> flat process matrix P = U (x) U^* (n^4,)
    (reference experiment.py:355-367)."""
    n = isqrt(U_vec.shape[0])
    U = U_vec.reshape(n, n)
    return jnp.kron(U, U.conj()).reshape(-1)


def proj_process(P_vec):
    """P (n^4,) -> U (n^2,) up to global phase (reference
    experiment.py:369-387, jit-friendly argmax-pivot variant).

    Block (r, c) of P equals U[r, c] * U.conj(); dividing the conjugated
    block by the complex sqrt of its own (r, c) pivot recovers U up to the
    global-phase ambiguity.
    """
    n = isqrt(isqrt(P_vec.shape[0]))
    blocks = split_blocks(P_vec.reshape(n * n, n * n), n, n)  # (n*n, n, n)
    # pivot of block i (block (r,c), flat i = r*n + c) is its own (r, c) entry
    pivots = jnp.stack([blocks[i].reshape(-1)[i] for i in range(n * n)])
    i_best = jnp.argmax(jnp.abs(pivots))
    sel = jax.nn.one_hot(i_best, n * n, dtype=blocks.dtype)
    block = jnp.einsum("i,iab->ab", sel, blocks)
    pivot = jnp.einsum("i,i->", sel, pivots)
    U = block.conj() / jnp.sqrt(pivot)
    return U.reshape(-1)


def synthesis_step(plant: SynthesisPlant, p, u, dt):
    """One exact ZOH step directly in process space:
    P' = (U_k (x) U_k^*) P with U_k = expm(-i dt H(u)) - the process-matrix
    form of right-composing the propagator (reference experiment.py:410-413).
    """
    n = plant.dim_s
    H = plant.H0 + jnp.einsum("u,udc->dc", jnp.asarray(u).reshape(-1).astype(plant.H1s.dtype), plant.H1s)
    Uk = expm_pade((-1j * dt) * H)
    K = jnp.kron(Uk, Uk.conj())
    return (K @ p.reshape(n * n, n * n).astype(K.dtype)).reshape(-1)


def synthesis_step_taylor(plant: SynthesisPlant, p, u, dt,
                          fixed_squarings: int = 4, order: int = 16):
    """synthesis_step with the matmul-only Taylor expm and an elementwise
    generator assembly (no LU solve, no real->complex cast feeding a dot) -
    the form that batches over scenario lanes on the TPU backend. Accurate
    while ||dt*H(u)||_1 <= 2^fixed_squarings; no runtime check - size it
    host-side via plants/quantum.taylor_norm_bound (see
    quantum_step_taylor's docstring for the contract)."""
    from ..ops.expm import expm_taylor

    n = plant.dim_s
    uv = jnp.asarray(u).reshape(-1)
    H = plant.H0 + jnp.sum(uv[:, None, None] * plant.H1s, axis=0)
    Uk = expm_taylor((-1j * dt) * H, order=order,
                     fixed_squarings=fixed_squarings)
    K = jnp.kron(Uk, Uk.conj())
    return (K @ p.reshape(n * n, n * n).astype(K.dtype)).reshape(-1)


def synthesis_simulate(plant: SynthesisPlant, p0, us, dt):
    """Propagate the process state over a ZOH control trajectory.

    :param p0: (n^4,) initial process state (lifted initial unitary).
    :param us: (dim_u, n_steps) controls.
    :return: (n^4, n_steps+1) process trajectory including p0.
    """
    n = plant.dim_s
    U0 = proj_process(p0).reshape(n, n)
    Hs = step_generators(plant.H0, plant.H1s, us)
    Ps = expm_pade((-1j * dt) * Hs)  # per-step propagators

    def step(U, Pk):
        U_next = Pk @ U
        return U_next, U_next

    _, Us = jax.lax.scan(step, U0.astype(Ps.dtype), Ps)
    all_U = jnp.concatenate([U0[None].astype(Ps.dtype), Us], axis=0)
    lift = jax.vmap(lambda U: lift_unitary(U.reshape(-1)))
    return lift(all_U).T
