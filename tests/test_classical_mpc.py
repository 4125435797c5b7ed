"""Classical Koopman-MPC end-to-end: stabilize the Van der Pol oscillator
with a DMDc model learned in the reference's Koopman lift
[x1, x2, x1^2, x1^2 x2] (reference experiment.py:124-132). The reference
defines this plant + lift but never closes the loop on it; here the full
real-dtype path of the engine (plant RK4, learned lifted model, condensed
QP, receding horizon) is exercised.

Note: the 4-term lift is not Koopman-closed (d(x1^2)/dt needs x1*x2), so
the open-loop rollout loss is large; one-step accuracy is what the receding
horizon needs, and the loop converges regardless."""

import numpy as np
import jax
import jax.numpy as jnp

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.models.training import train_model
from mpc4quantum_tpu.models.dmdc import dmdc_from_operator
from mpc4quantum_tpu.plants.classical import VanDerPol, rk4_simulate

MU = 1.0
DT = 0.1


def lift4(x):
    x1, x2 = x[0], x[1]
    return jnp.stack([x1, x2, x1**2, x1**2 * x2])


def test_koopman_mpc_stabilizes_vanderpol():
    plant = VanDerPol(mu=MU, substeps=8)
    rng = np.random.default_rng(0)

    # training: one long randomly-driven trajectory (train_model's rollout
    # selection assumes a single contiguous trajectory)
    x0 = np.array([1.0, 0.5])
    us = rng.uniform(-2, 2, size=(1, 400))
    xs = np.asarray(rk4_simulate(plant, jnp.asarray(x0), jnp.asarray(us), DT))
    zs = np.asarray(jax.vmap(lift4, in_axes=1, out_axes=1)(jnp.asarray(xs)))
    model, best_rcond, losses = train_model(
        jnp.asarray(zs[:, 1:]), jnp.asarray(zs[:, :-1]), jnp.asarray(us)
    )
    assert float(jnp.min(losses)) < 100.0  # open-loop rollout over 400 steps

    # control: drive the oscillator from the limit cycle to the origin
    H, n_steps = 20, 60
    sat = 4.0
    mstate = dmdc_from_operator(model.A, 4, 4, model.A.shape[1] - 4)
    x0c = np.array([1.5, 0.0])
    X_targ = jnp.zeros((4, n_steps + H + 1))
    U_targ = jnp.zeros((1, n_steps + H))
    Q = jnp.asarray(np.diag([1.0, 1.0, 0.0, 0.0]))
    R = jnp.eye(1) * 1e-2
    config = m4q.MPCConfig(horizon=H, n_steps=n_steps, dt=DT, dim_u=1, order=1)

    def plant_step(plant, x, u, dt):
        return rk4_simulate(plant, x, u.reshape(-1, 1), dt)[:, -1]

    res = m4q.mpc(jnp.asarray(x0c), mstate, plant, X_targ, U_targ, Q, R, Q, config,
                  sat=sat, key=jax.random.PRNGKey(0),
                  plant_step_fn=plant_step,
                  lift_fn=lambda p, x: lift4(x),
                  proj_fn=lambda p, z: z[:2])
    assert int(res.exit_code) == 0
    xf = np.asarray(res.xs)[:, -1]
    r_final = float(np.linalg.norm(xf))
    assert r_final < 0.2, f"controlled VdP did not reach origin: |x|={r_final}"

    # uncontrolled baseline settles on the limit cycle (|x| ~ 2), so the
    # controller is doing real work
    xs_free = np.asarray(rk4_simulate(plant, jnp.asarray(x0c), jnp.zeros((1, n_steps)), DT))
    assert np.linalg.norm(xs_free[:, -1]) > 1.0


def test_rk4_linear_interp_matches_scipy():
    """Linearly-interpolated controls (the reference CExperiment default,
    reference experiment.py:87) == scipy solve_ivp with the same ramped
    control, to integrator tolerance; zoh stays the engine convention."""
    import scipy.integrate
    from mpc4quantum_tpu.plants.classical import VanDerPol, rk4_simulate

    p = VanDerPol(mu=1.0, substeps=16)
    rng = np.random.default_rng(0)
    us = rng.normal(size=(1, 12)) * 0.5
    x0 = jnp.asarray([0.5, -0.2])
    dt = 0.2
    for interp, tol in (("zoh", 1e-6), ("linear", 1e-6)):
        xs = np.asarray(rk4_simulate(p, x0, jnp.asarray(us), dt, interp=interp))
        ts = np.arange(13) * dt

        def u_of_t(t):
            k = min(int(t / dt), 11)
            if interp == "zoh":
                return us[0, k]
            k1 = min(k + 1, 11)
            return us[0, k] + (us[0, k1] - us[0, k]) * (t - k * dt) / dt

        def rhs(t, x):
            return [x[1], -x[0] + (1 - x[0] ** 2) * x[1] + u_of_t(t)]

        sol = scipy.integrate.solve_ivp(rhs, (0, 12 * dt), np.asarray(x0),
                                        t_eval=ts, rtol=1e-10, atol=1e-12,
                                        max_step=dt / 4)
        assert np.max(np.abs(xs - sol.y)) < tol, interp
