"""Named scenario presets: the five benchmark workloads of BASELINE.json,
with the exact clocks/costs/constraints of the reference's scenario tests
(SURVEY.md section 4 table). Each preset builds everything `mpc()` needs.

| preset           | reference source                          |
|------------------|-------------------------------------------|
| not_state        | test_mpc4quantum.py:607-703                |
| not_state_freq   | test_mpc4quantum.py:705-804 (measure_freq) |
| drag_state       | test_mpc4quantum.py:504-605 (3-level)      |
| crosstalk        | test_mpc4quantum.py:281-397 (2 qubits)     |
| cnot_state       | test_mpc4quantum.py:399-502 (entangling)   |
| not_gate         | test_mpc4quantum.py:47-140 (synthesis)     |
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from .ops.liouville import vectorize_me, discretize_homogeneous
from .models.dmdc import DMDcModel, dmdc_from_operator
from .plants.quantum import QuantumPlant, LiftKind, lift_state, proj_state, quantum_step
from .plants.synthesis import SynthesisPlant, lift_unitary, synthesis_step
from .mpc.driver import MPCConfig
from .solvers.boxqp import BoxQPParams
from . import systems
from .systems import matrix_units, rx_rotation, SX, SZ


@dataclasses.dataclass(frozen=True)
class Scenario:
    """Everything needed to run `mpc(**scenario.mpc_args())`."""

    name: str
    x0: np.ndarray
    model: DMDcModel
    plant: object
    X_targ: jnp.ndarray
    U_targ: jnp.ndarray
    Q: jnp.ndarray
    R: jnp.ndarray
    Qf: jnp.ndarray
    config: MPCConfig
    sat: float
    du: Optional[float]
    target_state: np.ndarray  # for fidelity evaluation
    plant_step_fn: Callable = quantum_step
    lift_fn: Callable = lift_state
    proj_fn: Callable = proj_state
    exit_condition: Optional[Callable] = None

    def mpc_args(self) -> dict:
        return dict(
            x0=jnp.asarray(self.x0), model_state=self.model, plant=self.plant,
            X_targ=self.X_targ, U_targ=self.U_targ, Q=self.Q, R=self.R, Qf=self.Qf,
            config=self.config, sat=self.sat, du=self.du,
            plant_step_fn=self.plant_step_fn, lift_fn=self.lift_fn,
            proj_fn=self.proj_fn, exit_condition=self.exit_condition,
        )


def _const_targets(target, dim_u, n_steps, H):
    X_targ = jnp.asarray(np.tile(np.asarray(target)[:, None], (1, n_steps + H + 1)))
    U_targ = jnp.zeros((dim_u, n_steps + H))
    return X_targ, U_targ


def _model_from_hlist(H_list, dim_s, dt, order):
    basis = matrix_units(dim_s)
    A_cts = [np.asarray(vectorize_me(Hm, basis)) for Hm in H_list]
    A_dst = np.asarray(discretize_homogeneous(A_cts, dt, order))
    dim_x = dim_s * dim_s
    return dmdc_from_operator(jnp.asarray(A_dst), dim_x, dim_x, A_dst.shape[1] - dim_x)


def not_state(order: int = 2, detune: float = 0.99) -> Scenario:
    """Ideal qubit |0>->|1>, 1%-detuned plant: dt=1, H=10, n=20,
    sat=2pi*0.1, du=0.5*sat (reference test_mpc4quantum.py:616-639)."""
    dt, H, n_steps = 1.0, 10, 20
    sat = 2 * np.pi * 0.1
    wq = 2 * np.pi * 4
    qubit = systems.RWAQubit(wQ=wq, wD=wq, wR=wq)
    model = _model_from_hlist(qubit.H_list, 2, dt, order)

    plant_qubit = systems.RWAQubit(wQ=wq * detune, wD=wq, wR=wq)
    plant = QuantumPlant.create(plant_qubit.H_list[0], [plant_qubit.H_list[1]])

    Rx = rx_rotation(1e-4)
    rho0 = (Rx @ np.diag([1.0, 0.0]).astype(complex) @ Rx.conj().T).flatten()
    targ = np.diag([0.0, 1.0]).astype(complex).flatten()
    X_targ, U_targ = _const_targets(targ, 1, n_steps, H)
    Q = jnp.asarray(np.diag([1.0, 0, 0, 1]).astype(complex))
    R = jnp.eye(1) * (1e-2 / sat**2)
    return Scenario(
        name="not_state", x0=rho0, model=model, plant=plant,
        X_targ=X_targ, U_targ=U_targ, Q=Q, R=R, Qf=Q,
        config=MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=1, order=order),
        sat=sat, du=0.5 * sat, target_state=targ,
    )


def not_state_freq(order: int = 1, detune: float = 0.99) -> Scenario:
    """NOT-state with infrequent measurement (measure_freq=5): dt=0.2, H=50,
    n=100 (reference test_mpc4quantum.py:714-717)."""
    dt, H, n_steps = 0.2, 50, 100
    sat = 2 * np.pi * 0.1
    wq = 2 * np.pi * 4
    qubit = systems.RWAQubit(wQ=wq, wD=wq, wR=wq)
    model = _model_from_hlist(qubit.H_list, 2, dt, order)
    plant_qubit = systems.RWAQubit(wQ=wq * detune, wD=wq, wR=wq)
    plant = QuantumPlant.create(plant_qubit.H_list[0], [plant_qubit.H_list[1]])

    Rx = rx_rotation(1e-4)
    rho0 = (Rx @ np.diag([1.0, 0.0]).astype(complex) @ Rx.conj().T).flatten()
    targ = np.diag([0.0, 1.0]).astype(complex).flatten()
    X_targ, U_targ = _const_targets(targ, 1, n_steps, H)
    Q = jnp.asarray(np.diag([1.0, 0, 0, 1]).astype(complex))
    R = jnp.eye(1) * 1e-2
    return Scenario(
        name="not_state_freq", x0=rho0, model=model, plant=plant,
        X_targ=X_targ, U_targ=U_targ, Q=Q, R=R, Qf=Q,
        config=MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=1, order=order,
                         measure_freq=5),
        sat=sat, du=0.1 * sat, target_state=targ,
    )


def drag_state(order: int = 1) -> Scenario:
    """3-level transmon |0>->|1> with leakage-penalized cost - recovers
    DRAG-like pulses: dt=0.25, H=16, n=20, sat=2pi*0.25,
    alpha=-2pi*0.1/dt (reference test_mpc4quantum.py:510-535)."""
    dt, H, n_steps = 0.25, 16, 20
    sat = 2 * np.pi * 0.25
    anharm = -2 * np.pi * 0.1 / dt
    transmon = systems.RWATransmon(alpha=anharm)
    model = _model_from_hlist(transmon.H_list, 3, dt, order)
    plant = QuantumPlant.create(transmon.H_list[0], transmon.H_list[1:])

    # perturb the qubit-subspace block of rho0 (reference :543-546)
    Rx = rx_rotation(1e-4)
    rho0 = np.zeros((3, 3), dtype=complex)
    rho0[0, 0] = 1.0
    rho0[:2, :2] = Rx.conj().T @ rho0[:2, :2] @ Rx
    rho0 = rho0.flatten()
    targ = np.zeros((3, 3), dtype=complex)
    targ[1, 1] = 1.0
    targ = targ.flatten()

    X_targ, U_targ = _const_targets(targ, 2, n_steps, H)
    # leakage-penalized Q: populations of |0> and |1> weighted, |2> free but
    # targeted at 0 (reference :532-535)
    Qd = np.zeros(9)
    Qd[0] = 1.0
    Qd[4] = 1.0
    Q = jnp.asarray(np.diag(Qd).astype(complex))
    r_val = 1e-3 / sat**2
    R = jnp.eye(2) * r_val
    return Scenario(
        name="drag_state", x0=rho0, model=model, plant=plant,
        X_targ=X_targ, U_targ=U_targ, Q=Q, R=R, Qf=Q,
        config=MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=2, order=order),
        sat=sat, du=0.5 * sat, target_state=targ,
    )


def crosstalk(order: int = 1, coupling: float = 0.0) -> Scenario:
    """Two qubits controlled through per-qubit models while the plant carries
    Z(x)Z crosstalk; partial-trace lift, measure_freq=2, warm_start=False:
    dt=0.5, H=20, n=50 (reference test_mpc4quantum.py:281-368).

    Deviation: the reference assembles the block-diagonal model with qubit-2's
    control operator first (test_mpc4quantum.py:318-326) while the plant's
    drive list is qubit-1 first - a control-index swap between model and
    plant. We keep model control i aligned with plant drive i.
    """
    dt, H, n_steps = 0.5, 20, 50
    sat = 2 * np.pi * 0.1
    qubits = systems.RWACrosstalk(coupling)
    basis2 = matrix_units(2)
    A1 = [np.asarray(vectorize_me(Hm, basis2)) for Hm in qubits.H_list_1]
    A2 = [np.asarray(vectorize_me(Hm, basis2)) for Hm in qubits.H_list_2]
    z = np.zeros((4, 4), dtype=complex)
    A_cts = [
        np.block([[A1[0], z], [z, A2[0]]]),
        np.block([[A1[1], z], [z, z]]),   # u1 drives qubit 1
        np.block([[z, z], [z, A2[1]]]),   # u2 drives qubit 2
    ]
    A_dst = np.asarray(discretize_homogeneous(A_cts, dt, order))
    model = dmdc_from_operator(jnp.asarray(A_dst), 8, 8, A_dst.shape[1] - 8)

    plant = QuantumPlant.create(qubits.H_list[0], qubits.H_list[1:],
                                lift_kind=LiftKind.PARTIAL_TRACE)

    Rx1, Rx2 = rx_rotation(-1e-3), rx_rotation(1e-3)
    rho1 = Rx1 @ np.diag([1.0, 0.0]).astype(complex) @ Rx1.conj().T
    rho2 = Rx2 @ np.diag([1.0, 0.0]).astype(complex) @ Rx2.conj().T
    x0 = np.kron(rho1, rho2).flatten()  # experiment space (dim 16)
    targ1 = np.diag([0.0, 1.0]).astype(complex)
    targ2 = np.diag([1.0, 0.0]).astype(complex)
    target = np.concatenate([targ1.flatten(), targ2.flatten()])  # model space

    X_targ, U_targ = _const_targets(target, 2, n_steps, H)
    q_block = np.diag([1.0, 0, 0, 1])
    Q = jnp.asarray(np.block([[q_block, np.zeros((4, 4))],
                              [np.zeros((4, 4)), q_block]]).astype(complex))
    R = jnp.eye(2) * 1e-3
    return Scenario(
        name="crosstalk", x0=x0, model=model, plant=plant,
        X_targ=X_targ, U_targ=U_targ, Q=Q, R=R, Qf=Q,
        config=MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=2, order=order,
                         measure_freq=2, warm_start=False, max_iter=20,
                         # rho0=1.0: this preset's condensed P has diag
                         # ~1e-3 with cond ~1 and the default 0.1*meandiag
                         # penalty under-weights the box - measured
                         # (round-3 rho sweeps, batch 16): rho0=1.0 at
                         # HALF the iteration budget (2x75) reaches
                         # fidelity 0.9997 vs the 2x150 default's 0.9980;
                         # 2x50 is the cliff (0.994). warm_start=False
                         # makes this the every-solve budget (no steady
                         # phase), so it is the preset's whole QP cost.
                         # ns_iters=20: the captured-QP NS ladder reaches
                         # ||I-KX|| ~ 5e-6 by 20 iterations at rho0=1.0
                         # (experiments/sweep_ns_iters.py) - 30 was 1.5x
                         # overbudget on the serial inverse chain.
                         # ONE round (round 4): at rho0=1.0 the mid-solve
                         # rho re-balance is redundant here too - 1x150 ==
                         # 2x75 exactly (fid 0.99926, zero failures, CPU
                         # batch-1024 sweep; 1x120 is the cliff) at one
                         # cold NS chain per solve instead of two: chip
                         # A/B 449 -> 488 r/s (r4_xtalk_rounds.log)
                         qp_params=BoxQPParams(rho0=1.0, max_iter=150,
                                               n_rounds=1, ns_iters=20)),
        sat=sat, du=0.25, target_state=np.kron(targ1, targ2).flatten(),
    )


def cnot_state(order: int = 1) -> Scenario:
    """Entangling state prep on an always-coupled pair with a ramped target:
    dt=0.25, H=50, n=200, sat=2pi*0.05 (reference test_mpc4quantum.py:417-459).
    State dim 16, three controls - the large-dim config."""
    dt, H, n_steps = 0.25, 50, 200
    sat = 2 * np.pi * 0.05
    qubits = systems.RWACoupled()
    model = _model_from_hlist(qubits.H_list, 4, dt, order)
    plant = QuantumPlant.create(qubits.H_list[0], qubits.H_list[1:])

    Rx1, Rx2 = rx_rotation(-1e-2), rx_rotation(1e-2)
    rho0 = np.kron(Rx1 @ np.diag([1.0, 0.0]).astype(complex) @ Rx1.conj().T,
                   Rx2 @ np.diag([1.0, 0.0]).astype(complex) @ Rx2.conj().T)
    rho1 = np.kron(np.diag([1.0, 0.0]), np.diag([0.0, 1.0])).astype(complex)
    x0 = rho0.flatten()
    target = rho1.flatten()

    # ramped target: incline min(1, 2n/n_steps) (reference :446-448)
    incline = np.array([min(1.0, 2 * k / n_steps) for k in range(n_steps + H + 1)])
    X_targ = jnp.asarray(target[:, None] * incline[None, :])
    U_targ = jnp.zeros((3, n_steps + H))
    Qd = np.zeros(16)
    Qd[[0, 5, 10, 15]] = 1.0  # diagonal populations (reference :453-456)
    Q = jnp.asarray(np.diag(Qd).astype(complex))
    R = jnp.eye(3) * 1e-3
    # The dim-16/H=50 condensed QP is ill-conditioned; OSQP-default
    # acceptance costs real fidelity here (0.973 vs 0.994 - measured sweep,
    # round 2). Tightened targets recover >= 0.98 at ~1.2x solve cost.
    qp = BoxQPParams(eps_abs=1e-8, eps_rel=1e-8, max_iter=300, n_rounds=3)
    return Scenario(
        name="cnot_state", x0=x0, model=model, plant=plant,
        X_targ=X_targ, U_targ=U_targ, Q=Q, R=R, Qf=Q,
        config=MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=3, order=order,
                         qp_params=qp),
        sat=sat, du=sat, target_state=target,
    )


def not_gate(order: int = 1, n_steps: int = 50) -> Scenario:
    """NOT-gate synthesis in process-matrix space (dim 16): dt=0.05, H=15,
    n=50, exit when process cost < 1e-2 (reference test_mpc4quantum.py:47-94).

    Note (verified numerically): at the reference's n_steps=50, the maximum
    accumulated rotation is sat*n*dt = 2.5 rad < pi, so the NOT gate cannot
    physically complete and the exit threshold can never fire (minimum
    reachable process cost ~ 0.8; the reference's test is plot-only and never
    asserts it). Pass n_steps >= ~75 to let the exit condition trigger.
    """
    dt, H = 0.05, 15
    sat, du = 1.0, 0.25
    w = np.pi
    qubit = systems.RWAQubit(wQ=w, wD=w, wR=w)
    H0, H1 = qubit.H_list

    # process-space generators: A = kron(-i(kron(h,I)-kron(I,h*)), I_4)
    # (reference test_mpc4quantum.py:63-64)
    I2, I4 = np.eye(2), np.eye(4)
    A_cts = [
        np.kron(-1j * (np.kron(h, I2) - np.kron(I2, h.conj())), I4)
        for h in (H0, H1)
    ]
    A_dst = np.asarray(discretize_homogeneous(A_cts, dt, order))
    model = dmdc_from_operator(jnp.asarray(A_dst), 16, 16, A_dst.shape[1] - 16)

    plant = SynthesisPlant.create(H0, [H1])
    U0 = rx_rotation(1e-3)
    p0 = np.kron(U0, U0.conj()).flatten()
    pf = np.kron(SX, SX.conj()).flatten()

    X_targ, _ = _const_targets(pf, 1, n_steps, H)
    U_targ = jnp.ones((1, n_steps + H)) * 0.5  # nonzero control benchmark (:85)
    Q = jnp.eye(16, dtype=complex)
    Qf = Q * 10.0
    R = jnp.eye(1) * 1e-2

    pf_j = jnp.asarray(pf)

    def exit_condition(p_next, p, u):
        d = p - pf_j
        return jnp.real(jnp.vdot(d, d)) < 1e-2

    identity = lambda plant, z: z
    return Scenario(
        name="not_gate", x0=p0, model=model, plant=plant,
        X_targ=X_targ, U_targ=U_targ, Q=Q, R=R, Qf=Qf,
        config=MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=1, order=order),
        sat=sat, du=du, target_state=pf,
        plant_step_fn=synthesis_step, lift_fn=identity, proj_fn=identity,
        exit_condition=exit_condition,
    )


def lindblad_state(order: int = 2, detune: float = 0.99,
                   gamma: float = 0.005) -> Scenario:
    """T1-limited qubit |0>->|1> state prep: the NOT-state workload on an
    OPEN system (amplitude damping L = sqrt(gamma) sigma_minus in both the
    model and the plant). No reference test runs mesolve dissipatively, but
    its capability class includes collapse operators (reference
    experiment.py:209); this preset exercises that class end-to-end: the
    model is the exact order-k discretization of the Lindbladian drift (the
    same `discretize_homogeneous` pipeline - A0 is just no longer
    skew-Hermitian), the plant propagates the full master equation, and the
    controller holds the state against decay for the whole horizon.

    gamma=0.005 at dt=1 over 20 steps: uncontrolled decay from |1> would
    lose ~9% population; the closed loop re-drives against it.
    """
    from .plants.lindblad import (LindbladPlant, lindblad_step,
                                  lindblad_lift, lindblad_proj)
    from .ops.liouville import lindblad_generator, liouville_generator

    dt, H, n_steps = 1.0, 10, 20
    sat = 2 * np.pi * 0.1
    wq = 2 * np.pi * 4
    qubit = systems.RWAQubit(wQ=wq, wD=wq, wR=wq)
    sminus = np.array([[0.0, 1.0], [0.0, 0.0]], complex)
    c_ops = [np.sqrt(gamma) * sminus]

    # exact open-system model: Lindblad drift + Hamiltonian control generator
    A_cts = [np.asarray(lindblad_generator(qubit.H_list[0], c_ops)),
             np.asarray(liouville_generator(qubit.H_list[1]))]
    A_dst = np.asarray(discretize_homogeneous(A_cts, dt, order))
    model = dmdc_from_operator(jnp.asarray(A_dst), 4, 4, A_dst.shape[1] - 4)

    plant_qubit = systems.RWAQubit(wQ=wq * detune, wD=wq, wR=wq)
    plant = LindbladPlant.create(plant_qubit.H_list[0], [plant_qubit.H_list[1]],
                                 c_ops=c_ops)

    Rx = rx_rotation(1e-4)
    rho0 = (Rx @ np.diag([1.0, 0.0]).astype(complex) @ Rx.conj().T).flatten()
    targ = np.diag([0.0, 1.0]).astype(complex).flatten()
    X_targ, U_targ = _const_targets(targ, 1, n_steps, H)
    Q = jnp.asarray(np.diag([1.0, 0, 0, 1]).astype(complex))
    R = jnp.eye(1) * (1e-2 / sat**2)
    return Scenario(
        name="lindblad_state", x0=rho0, model=model, plant=plant,
        X_targ=X_targ, U_targ=U_targ, Q=Q, R=R, Qf=Q,
        config=MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=1, order=order),
        sat=sat, du=0.5 * sat, target_state=targ,
        plant_step_fn=lindblad_step, lift_fn=lindblad_lift,
        proj_fn=lindblad_proj,
    )


PRESETS = {
    "not_state": not_state,
    "not_state_freq": not_state_freq,
    "drag_state": drag_state,
    "crosstalk": crosstalk,
    "cnot_state": cnot_state,
    "not_gate": not_gate,
    "lindblad_state": lindblad_state,
}
