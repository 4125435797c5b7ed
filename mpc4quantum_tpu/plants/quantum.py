"""Quantum plants: exact piecewise-constant propagation in Hilbert space.

Replaces qutip.mesolve (reference experiment.py:175-212, `QExperiment`) with
unitary conjugation rho' = U rho U^H, U = expm(-i dt H(u)) per step. For the
zero-order-hold controls used throughout (the reference stitches controls
with interp1d kind='previous', reference mpc.py:258), this is *exact* - no
integration error - and it batches over (steps x scenarios) as fused matmul
chains on the MXU.

Measurement-space adapters ("lift"/"proj") mirror the reference plant family:
  - IDENTITY: model space == experiment space (QExperiment).
  - TRUNCATE: 3-level transmon measured in the 2-level subspace - lift
    truncates + renormalizes, proj returns the 2x2 state (keeping the
    reference's quirk that the zero-padded 3x3 is dead code,
    reference experiment.py:215-235).
  - PARTIAL_TRACE: coupled pair lifted to stacked single-qubit states
    [vec(rho_A); vec(rho_B)], proj = tensor product
    (reference experiment.py:238-306).

Measurement noise: i.i.d. complex Gaussian of scale sigma added to observed
states (reference experiment.py:212), drawn from an explicit PRNG key.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.expm import expm_pade, expm_taylor, step_generators
from ..utils.linalg import isqrt


class LiftKind(enum.Enum):
    IDENTITY = "identity"
    TRUNCATE = "truncate"  # d-level plant observed in a k-level subspace
    PARTIAL_TRACE = "partial_trace"  # bipartite plant observed per subsystem


@struct.dataclass
class QuantumPlant:
    """Bilinear quantum plant dρ/dt = -i[H0 + Σ u_i H1_i, ρ].

    Optional expectation-value observation mode (`e_ops`, reference
    experiment.py:196-211): when a list of measurement operators is set, the
    plant is observed through exps_i = tr(E_i ρ) + noise rather than the full
    vec(ρ) - the physically honest, device-shaped measurement. `e_obs`
    holds the stacked observation map (n_e, d^2) with exps = e_obs @ vec(ρ);
    `e_dual` its pseudo-inverse dual frame, used to re-seed the model from
    observations (exact when the operator list is informationally complete,
    least-squares otherwise).

    Reference `QExperiment.set(key, val)` (experiment.py:196-200) is a
    mutable passthrough of qutip.mesolve kwargs; this plant has no ODE
    solver (propagation is exact ZOH expm), so the only physically
    meaningful settings - `sigma`, `e_ops` - are constructor arguments, and
    reconfiguration is `plant.replace(...)` / `QuantumPlant.create(...)`
    (plants are immutable pytrees: per-lane variants are data, which is
    what lets a fleet carry thousands of differently-configured plants).
    """

    H0: jnp.ndarray  # (d, d)
    H1s: jnp.ndarray  # (dim_u, d, d)
    sigma: jnp.ndarray  # measurement noise scale (scalar array)
    e_obs: jnp.ndarray | None = None   # (n_e, d^2) observation map or None
    e_dual: jnp.ndarray | None = None  # (d^2, n_e) dual frame or None
    lift_kind: LiftKind = struct.field(pytree_node=False, default=LiftKind.IDENTITY)
    lift_dim: int = struct.field(pytree_node=False, default=0)  # subspace dim for TRUNCATE

    @property
    def dim_s(self) -> int:
        return self.H0.shape[0]

    @property
    def dim_u(self) -> int:
        return self.H1s.shape[0]

    @classmethod
    def create(cls, H0, H1s, sigma=0.0, lift_kind=LiftKind.IDENTITY, lift_dim=0,
               e_ops=None):
        """:param e_ops: optional list/stack of (d, d) measurement operators;
        enables expectation-value observation (reference experiment.py
        `set('e_ops', ...)`)."""
        H0 = jnp.asarray(H0)
        if hasattr(H1s, "ndim") and getattr(H1s, "ndim", 0) == 3:
            H1s = jnp.asarray(H1s, H0.dtype)
        else:
            H1s = jnp.stack([jnp.asarray(H, H0.dtype) for H in H1s])
        rdtype = jnp.zeros(0, H0.dtype).real.dtype
        e_obs = e_dual = None
        if e_ops is not None:
            # always complex: a real H0 must not strip imaginary parts of
            # measurement operators (e.g. sigma_y)
            cdt = jnp.promote_types(H0.dtype, jnp.complex64)
            E = jnp.stack([jnp.asarray(e, cdt) for e in e_ops]) \
                if not (hasattr(e_ops, "ndim") and getattr(e_ops, "ndim", 0) == 3) else jnp.asarray(e_ops, cdt)
            # tr(E ρ) = Σ_ab E[a,b] ρ[b,a]; row-major vec(ρ)[b*d+a] = ρ[b,a]
            e_obs = jnp.swapaxes(E, -1, -2).reshape(E.shape[0], -1)
            e_dual = jnp.linalg.pinv(e_obs)
        return cls(H0=H0, H1s=H1s, sigma=jnp.asarray(sigma, rdtype),
                   e_obs=e_obs, e_dual=e_dual,
                   lift_kind=lift_kind, lift_dim=lift_dim)


# ---------------------------------------------------------------------------
# lift / proj adapters
# ---------------------------------------------------------------------------


def truncate_lift(rho_vec, dim_full: int, dim_sub: int):
    """rho (dim_full^2,) -> truncated+renormalized (dim_sub^2,)
    (reference experiment.py:225-228)."""
    rho = rho_vec.reshape(dim_full, dim_full)[:dim_sub, :dim_sub]
    tr = jnp.trace(rho)
    return (rho / tr).reshape(-1)


def partial_trace_lift(rho_vec):
    """vec(rho_AB) -> [vec(rho_A); vec(rho_B)] for identical subsystems
    (reference experiment.py:248-285, as two einsum traces)."""
    dim_ab = isqrt(rho_vec.shape[0])
    d = isqrt(dim_ab)
    rho = rho_vec.reshape(d, d, d, d)  # (a, b, a', b') of rho[(a b), (a' b')]
    rho_a = jnp.einsum("ajbj->ab", rho)
    rho_b = jnp.einsum("jajb->ab", rho)
    return jnp.concatenate([rho_a.reshape(-1), rho_b.reshape(-1)])


def tensor_proj(stacked_vec):
    """[vec(rho_A); vec(rho_B)] -> vec(rho_A x rho_B)
    (reference experiment.py:287-306)."""
    d2 = stacked_vec.shape[0] // 2
    d = isqrt(d2)
    rho_a = stacked_vec[:d2].reshape(d, d)
    rho_b = stacked_vec[d2:].reshape(d, d)
    return jnp.kron(rho_a, rho_b).reshape(-1)


def lift_state(plant: QuantumPlant, x):
    """Experiment state -> model space (the lift/proj pair is the adapter the
    MPC driver uses throughout, reference experiment.py:29-37)."""
    if plant.lift_kind is LiftKind.IDENTITY:
        return x
    if plant.lift_kind is LiftKind.TRUNCATE:
        return truncate_lift(x, plant.dim_s, plant.lift_dim)
    if plant.lift_kind is LiftKind.PARTIAL_TRACE:
        return partial_trace_lift(x)
    raise ValueError(plant.lift_kind)


def proj_state(plant: QuantumPlant, z):
    """Model space -> experiment state."""
    if plant.lift_kind is LiftKind.IDENTITY:
        return z
    if plant.lift_kind is LiftKind.TRUNCATE:
        # Deviation from the reference quirk: reference proj builds the
        # zero-padded 3x3 but returns the 2x2 vec (dead code at
        # experiment.py:230-235, shape-inconsistent with the plant space).
        # Fixed shapes require the zero-padded full-space state - which is
        # what that dead code intended.
        k = plant.lift_dim
        d = plant.dim_s
        rho_full = jnp.zeros((d, d), z.dtype)
        rho_full = rho_full.at[:k, :k].set(z.reshape(k, k))
        return rho_full.reshape(-1)
    if plant.lift_kind is LiftKind.PARTIAL_TRACE:
        return tensor_proj(z)
    raise ValueError(plant.lift_kind)


# ---------------------------------------------------------------------------
# propagation
# ---------------------------------------------------------------------------


def quantum_step(plant: QuantumPlant, rho_vec, u, dt):
    """One exact ZOH step: rho' = U rho U^H, U = expm(-i dt H(u))."""
    d = plant.dim_s
    uv = jnp.asarray(u).reshape(-1)
    H = plant.H0 + jnp.sum(uv[:, None, None] * plant.H1s, axis=0)
    U = expm_pade((-1j * dt) * H)
    rho = rho_vec.reshape(d, d)
    return (U @ rho @ U.conj().T).reshape(-1)


def quantum_step_taylor(plant: QuantumPlant, rho_vec, u, dt,
                        fixed_squarings: int = 4, order: int = 16):
    """quantum_step with the matmul-only Taylor expm (no LU solve and no
    loop primitive in the graph): identical to machine precision while
    ||dt*H||_1 <= 2^fixed_squarings (= 16 at the default), and the form that
    batches over scenario lanes on the TPU (batched LU lowerings are
    unavailable there).

    The accuracy bound is the caller's responsibility - there is no runtime
    norm check (a check would put data-dependent control flow back into the
    batched graph). Every preset satisfies it with a wide margin (the largest
    is cnot_state at ||dt*H||_1 ~ 1.6); for plants with much larger
    detune/control scales, check ||dt*H||_1 host-side when building the fleet
    (see `taylor_norm_bound`) and raise `fixed_squarings` accordingly - each
    +1 doubles the norm bound for one extra matmul.

    `order` is the Horner Taylor degree (ops/expm.expm_taylor): the serial
    matmul chain is order-1 + fixed_squarings long, so a host-side norm
    bound lets the fleet drivers run e.g. order=12/squarings=0 (truncation
    ~1e-16 at ||dt*H|| <= 0.8) instead of the conservative 16/4 default -
    an 11-vs-19 matmul chain on a latency-bound path (benchfleet's auto
    expm budget)."""
    d = plant.dim_s
    # generator assembled with an elementwise multiply-add (dim_u is tiny;
    # a real-u contraction against complex H1s would be a cast-fed dot)
    uv = jnp.asarray(u).reshape(-1)
    H = plant.H0 + jnp.sum(uv[:, None, None] * plant.H1s, axis=0)
    U = expm_taylor((-1j * dt) * H, order=order,
                    fixed_squarings=fixed_squarings)
    rho = rho_vec.reshape(d, d)
    return (U @ rho @ U.conj().T).reshape(-1)


def taylor_norm_bound(plant, dt, sat) -> float:
    """Host-side worst-case ||dt*H(u)||_1 over the control box |u| <= sat.

    Cheap eager check for sizing `fixed_squarings` in the *_taylor steps:
    the fixed-squaring Taylor expm is accurate while this bound stays under
    2^fixed_squarings. Call when constructing a plant batch for the hostloop
    driver / bench / CLI (which pick the Taylor step functions)."""
    import numpy as np

    one_norm = lambda M: float(np.max(np.sum(np.abs(np.asarray(M)), axis=-2)))
    H1s = np.asarray(plant.H1s)  # (..., dim_u, d, d): batched lanes OK -
    # pass the fleet's numpy lane batch (complex device arrays cannot cross
    # the axon host boundary; benchfleet converts inside its CPU block)
    sat_v = np.broadcast_to(np.asarray(sat, float), (H1s.shape[-3],))
    return abs(float(dt)) * (one_norm(plant.H0)
                             + sum(s * one_norm(H1s[..., k, :, :])
                                   for k, s in enumerate(sat_v)))


def quantum_expectations(plant: QuantumPlant, xs):
    """Expectation values tr(E_i ρ) of the plant's e_ops over states.

    :param xs: (d^2,) or (d^2, n) vec(ρ) state(s).
    :return: (n_e,) or (n_e, n) expectations (complex; real for Hermitian E).
    """
    if plant.e_obs is None:
        raise ValueError("plant has no e_ops configured")
    return plant.e_obs @ xs.astype(plant.e_obs.dtype)


def quantum_observe(plant: QuantumPlant, x, key=None):
    """Observe the plant state the way a real device would (reference
    experiment.py:210-212): expectation values of the e_ops list plus i.i.d.
    complex Gaussian noise of scale sigma, then re-seed a full state estimate
    through the dual frame x̂ = e_dual @ (e_obs x + noise). Without e_ops this
    is the reference's full-state observation x + noise.

    Exact reconstruction (up to noise) when e_ops spans the operator space;
    the least-squares projection otherwise. Use as the driver's `observe_fn`.
    """
    if plant.e_obs is None:
        if key is None:
            return x
        rdtype = x.real.dtype
        noise = jax.random.normal(key, x.shape, rdtype) \
            + 1j * jax.random.normal(jax.random.fold_in(key, 1), x.shape, rdtype)
        return x + plant.sigma * noise
    exps = quantum_expectations(plant, x)
    if key is not None:
        rdtype = exps.real.dtype
        noise = jax.random.normal(key, exps.shape, rdtype) \
            + 1j * jax.random.normal(jax.random.fold_in(key, 1), exps.shape, rdtype)
        exps = exps + plant.sigma * noise
    return plant.e_dual @ exps


def quantum_simulate(plant: QuantumPlant, x0, us, dt, key=None, use_pallas: bool = False,
                     pallas_interpret: bool = False, interp: str = "zoh",
                     substeps: int = 16):
    """Propagate over a control trajectory, returning all intermediate states.

    :param x0: (d^2,) vec(rho) initial state.
    :param us: (dim_u, n) controls.
    :param key: optional PRNG key; when given, adds complex Gaussian
        measurement noise of scale sigma to the returned trajectory
        (reference experiment.py:212).
    :param use_pallas: compute the per-step propagators with the fused
        batch-on-lanes Pallas kernel (ops/pallas_expm.py) instead of the XLA
        Pade path - the hot-op kernel for large step batches on TPU.
    :param interp: control stitching between samples. "zoh" (piecewise
        constant, the engine-wide convention - exact, one propagator per
        step) or "linear" (the reference QExperiment's arbitrary-interp1d
        control option, reference experiment.py:87, with kind='linear':
        each step interpolates u_k -> u_{k+1}, the last segment holding
        u_{n-1} like the classical plants, plants/classical.py). Linear
        drives have no closed-form propagator; each step is split into
        `substeps` sub-segments propagated at the sub-segment MIDPOINT
        control (exponential midpoint rule) - error O((dt/substeps)^2) per
        step against the true time-ordered propagator, still exactly
        unitary and batched on the MXU.
    :param substeps: sub-segments per step for interp="linear".
    :return: (d^2, n+1) states including x0 - or, when the plant has e_ops
        configured, the (n_e, n+1) expectation-value trajectory (reference
        experiment.py:210-211 `res.expect` mode), noise applied in
        observation space.
    """
    if interp not in ("zoh", "linear"):
        raise ValueError(f"interp={interp!r}: 'zoh' or 'linear'")
    d = plant.dim_s
    if interp == "linear":
        S = int(substeps)
        us = jnp.asarray(us)
        us_next = jnp.concatenate([us[:, 1:], us[:, -1:]], axis=1)
        # midpoint control of each sub-segment of the linear ramp
        frac = (jnp.arange(S, dtype=jnp.float64 if us.real.dtype ==
                           jnp.float64 else jnp.float32) + 0.5) / S
        u_sub = us[:, :, None] + (us_next - us)[:, :, None] * frac[None, None, :]
        u_eff = u_sub.reshape(us.shape[0], -1)  # (dim_u, n*S) time-major
        dt_eff = dt / S
    else:
        S = 1
        u_eff, dt_eff = us, dt
    Hs = step_generators(plant.H0, plant.H1s, u_eff)
    if use_pallas:
        from .. import ops  # local import to keep pallas optional

        Us = ops.pallas_expm.expm_pallas((-1j * dt_eff) * Hs, interpret=pallas_interpret)
    else:
        Us = expm_pade((-1j * dt_eff) * Hs)  # (n, d, d) batched on MXU

    def step(rho, U):
        rho_n = U @ rho @ U.conj().T
        return rho_n, rho_n

    rho0 = x0.reshape(d, d).astype(Us.dtype)
    _, rhos = jax.lax.scan(step, rho0, Us)
    if S > 1:
        rhos = rhos[S - 1 :: S]  # keep the per-step samples only
    xs = jnp.concatenate([rho0.reshape(1, -1), rhos.reshape(rhos.shape[0], -1)], axis=0).T
    if plant.e_obs is not None:
        xs = quantum_expectations(plant, xs)
    if key is not None:
        kr, ki = jax.random.split(key)
        rdtype = xs.real.dtype
        noise = jax.random.normal(kr, xs.shape, dtype=rdtype) + 1j * jax.random.normal(ki, xs.shape, dtype=rdtype)
        xs = xs + plant.sigma * noise
    return xs
