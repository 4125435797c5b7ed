"""Behavior-parity checks: the engine's closed-loop pulses vs an independent
sequential numpy/scipy implementation of the same receding-horizon algorithm
(the CPU baseline in bench.py - linearize, condense, L-BFGS-B box QP, scipy
expm plant). Pulse-level agreement is the strongest evidence that the
TPU-native control path reproduces the reference algorithm's behavior, not
just its end fidelity."""

import numpy as np
import jax
import jax.numpy as jnp

import mpc4quantum_tpu as m4q
from test_mpc_e2e import make_not_state_problem

import importlib.util
import sys
import pathlib

_spec = importlib.util.spec_from_file_location(
    "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_engine_pulse_matches_independent_sequential_solver():
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem(order=2)
    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    us_engine = np.asarray(res.us)[0]

    # independent implementation (separate derivation, scipy solvers)
    fid_cpu = bench.cpu_baseline_rollout()
    assert fid_cpu > 0.99

    us_ref = bench_last_pulse()
    assert us_ref.shape == us_engine.shape
    # The two implementations solve identical QPs only while their closed
    # loops see identical states: over the initial saturated segment (the
    # slew-limited ramp + plateau, steps 0-4 in this config) both must agree
    # to solver tolerance. Beyond it, tiny solver differences compound
    # through the closed loop (measured: exact agreement for 5 steps, then
    # divergence up to ~0.23*sat by step 10); per-step open-loop parity -
    # which has no compounding - is asserted tightly in
    # test_per_step_qp_parity_on_rollout_tuples below.
    np.testing.assert_allclose(us_engine[:5], us_ref[:5], atol=1e-3 * sat)
    err = np.max(np.abs(us_engine - us_ref))
    assert err < 0.25 * sat, f"pulse shape deviation {err} vs sat {sat}"
    # and both must reach the same physical outcome
    assert float(jnp.real(res.xs[3, -1])) > 0.99


def test_per_step_qp_parity_on_rollout_tuples():
    """Per-step condensed-QP parity on linearization tuples recorded along
    the engine's flagship rollout: the engine's ADMM and an independent
    scipy L-BFGS-B minimization of the same condensed cost must agree to
    solver tolerance (measured ~5e-5*sat), with projected-gradient KKT
    residuals certifying both. This is the no-compounding form of pulse
    parity (reference QP semantics: optimize.py:12-60)."""
    import scipy.optimize
    from mpc4quantum_tpu.ops.bilinear import BilinearModel, model_along_traj
    from mpc4quantum_tpu.solvers.condense import quad_program, condense_horizon

    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = make_not_state_problem(order=2)
    H = config.horizon
    res = m4q.mpc(jnp.asarray(rho0), model, plant, X_targ, U_targ, Q, R, Qf,
                  config, sat=sat, du=du, key=jax.random.PRNGKey(1))
    xs, us = np.asarray(res.xs), np.asarray(res.us)
    bmodel = BilinearModel.from_stacked(model.A[:, :4], model.A[:, 4:], 1, config.order)
    Q_s = jnp.concatenate([jnp.tile(jnp.asarray(Q)[None], (H, 1, 1)),
                           jnp.asarray(Qf)[None]], axis=0)
    R_s = jnp.tile(jnp.asarray(R)[None], (H, 1, 1))

    for t in [0, 2, 5, 8, 12, 16]:
        pad_x = max(0, t + H - xs.shape[1] + 1)
        pad_u = max(0, t + H - us.shape[1])
        Xw = np.concatenate([xs[:, t:t + H], np.tile(xs[:, -1:], (1, pad_x))], axis=1)[:, :H]
        Uw = np.concatenate([us[:, t:t + H], np.tile(us[:, -1:], (1, pad_u))], axis=1)[:, :H]
        A_s, B_s, D_s = model_along_traj(bmodel, jnp.asarray(Xw), jnp.asarray(Uw))
        x0t = jnp.asarray(xs[:, t])
        st = max(t - 1, 0)
        X_ref = jnp.asarray(X_targ)[:, st:st + H + 1]
        U_ref = jnp.asarray(U_targ)[:, st:st + H]
        u_prev = jnp.asarray(us[:, t - 1]) if t > 1 else U_ref[:, 0]
        qres = quad_program(x0t, X_ref, U_ref, Q_s, R_s, A_s, B_s, D_s,
                            u_prev=u_prev, sat=sat, du=du)
        assert bool(qres.converged), t

        # independent oracle: condensed cost minimized by L-BFGS-B
        w, M = condense_horizon(A_s, B_s, D_s, x0t)
        wn, Mn = np.asarray(w), np.asarray(M).reshape(H + 1, 4, H)
        Qn = np.asarray(Q_s)
        Rn = np.asarray(R_s)[:, 0, 0].real
        Xbm = np.asarray(X_ref).T

        def cost(U):
            x = wn + np.einsum("txn,n->tx", Mn, U)
            ex = x - Xbm
            return np.real(np.einsum("tx,txy,ty->", ex.conj(), Qn, ex)) + np.sum(Rn * U**2)

        lb = np.full(H, -sat)
        ub = np.full(H, sat)
        up = float(np.asarray(u_prev)[0])
        lb[0], ub[0] = max(-sat, up - du), min(sat, up + du)
        o = scipy.optimize.minimize(cost, np.zeros(H), method="L-BFGS-B",
                                    bounds=list(zip(lb, ub)),
                                    options={"ftol": 1e-15, "maxiter": 5000})
        dev = np.max(np.abs(np.asarray(qres.U)[0] - o.x))
        assert dev < 1e-3 * sat, f"t={t}: per-step QP deviation {dev} ({dev / sat:.1e}*sat)"

        # projected-gradient KKT residual certifies both solutions
        def kkt(U):
            eps = 1e-7
            g = np.array([(cost(U + eps * np.eye(H)[i]) - cost(U - eps * np.eye(H)[i])) / (2 * eps)
                          for i in range(H)])
            return np.max(np.abs(U - np.clip(U - g, lb, ub)))

        assert kkt(np.asarray(qres.U)[0]) < 1e-4, t
        assert kkt(o.x) < 1e-4, t


def bench_last_pulse():
    """Re-run the bench baseline capturing its applied pulse sequence."""
    import scipy.linalg

    us = []
    orig = bench.cpu_baseline_rollout

    # simplest capture: reimplement the tail of the baseline loop by calling
    # it with a hook - bench exposes no hook, so replicate via monkeypatch of
    # expm to record u? Instead: re-derive by running the baseline and
    # recording through a wrapped plant propagator.
    recorded = []
    real_expm = scipy.linalg.expm

    def recording_expm(M):
        # the baseline calls expm once per applied control with
        # M = -1j*DT*(H0_true + u*0.5*SX); recover u from the (0,1) entry
        out = real_expm(M)
        recorded.append(M)
        return out

    scipy.linalg.expm = recording_expm
    try:
        bench.cpu_baseline_rollout()
    finally:
        scipy.linalg.expm = real_expm
    u_list = []
    for M in recorded:
        # M[0,1] = -1j*DT*u*0.5 -> u = M[0,1] / (-0.5j*DT)
        u_list.append(float((M[0, 1] / (-0.5j * bench.DT)).real))
    return np.asarray(u_list)
