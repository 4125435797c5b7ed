"""Data-driven end-to-end: learn the model from Blackman-pulse experiment
data (the reference's training harness flow, util_training.py:9-85), then
close the MPC loop with the learned model - no analytic model anywhere."""

import numpy as np
import jax
import jax.numpy as jnp

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.models.dmdc import dmdc_from_operator
from mpc4quantum_tpu.models.training import train_model
from mpc4quantum_tpu.ops.library import control_powers, lift_controls
from mpc4quantum_tpu.plants.quantum import quantum_simulate
from mpc4quantum_tpu.systems import blackman, rx_rotation, SX, SZ


def test_learned_model_controls_the_qubit():
    order, dt = 2, 0.25
    wq = 2 * np.pi * 4
    # plant: ideal resonant qubit (model is LEARNED, so no detuning needed to
    # make the problem nontrivial - the model error is the mismatch)
    plant = m4q.QuantumPlant.create(0.0 * SZ, [0.5 * SX])

    # training data: Blackman drive (reference util_training.py:20-48)
    pulse_width = 6.0
    ts = np.arange(0, 2 * pulse_width, dt)
    us_train = blackman(ts, 0, pulse_width, dt)[None, :]
    rho0 = np.diag([1.0, 0.0]).astype(complex).flatten()
    xs = np.asarray(quantum_simulate(plant, jnp.asarray(rho0), jnp.asarray(us_train), dt))

    X2, X1 = xs[:, 1:], xs[:, :-1]
    powers = control_powers(order, 1)[1:]
    UL1 = np.asarray(lift_controls(jnp.asarray(us_train), powers))
    model, best_rcond, losses = train_model(jnp.asarray(X2), jnp.asarray(X1), jnp.asarray(UL1))
    assert float(jnp.min(losses)) < 1e-3

    # control with the learned model: NOT-state prep
    H, n_steps = 10, 20
    sat = 2 * np.pi * 0.1
    mstate = dmdc_from_operator(model.A, 4, 4, model.A.shape[1] - 4)
    Rx = rx_rotation(1e-4)
    x0 = (Rx @ np.diag([1.0, 0.0]).astype(complex) @ Rx.conj().T).flatten()
    targ = np.diag([0.0, 1.0]).astype(complex).flatten()
    X_targ = jnp.asarray(np.tile(targ[:, None], (1, n_steps + H + 1)))
    U_targ = jnp.zeros((1, n_steps + H))
    Q = jnp.asarray(np.diag([1.0, 0, 0, 1]).astype(complex))
    R = jnp.eye(1) * (1e-2 / sat**2)
    config = m4q.MPCConfig(horizon=H, n_steps=n_steps, dt=dt, dim_u=1, order=order)
    res = m4q.mpc(jnp.asarray(x0), mstate, plant, X_targ, U_targ, Q, R, Q,
                  config, sat=sat, du=0.5 * sat, key=jax.random.PRNGKey(1))
    p1 = float(jnp.real(res.xs[3, -1]))
    assert int(res.exit_code) == 0
    assert p1 > 0.95, f"learned-model control reached only P1={p1}"
