"""Validate the K-inverse carry on REAL preset steady chains (CPU replay).

Captures every steady-phase QP of a production-form scan-driver rollout
(disable_jit + solver monkeypatch, the sweep_ns_iters.py pattern) WITH the
exact warm-start args the driver passed (x0/y0/rho0), then replays the
chain twice at the preset's tuned production steady budget:

  cold   : full-ns_iters inverses every solve (the shipping form)
  carried: kinv0 threaded solve-to-solve at ns_refresh in {6, 8, 10, 12}

and reports, per refresh budget: the guard residual r0 = ||I - K X0||_inf
of every solve (the contraction margin the 0.9 guard must cover),
max |x_carried - x_cold| over the chain, and acceptance parity.

Decision input only - picks ns_refresh per preset; not part of the package.
"""
import dataclasses
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from mpc4quantum_tpu import presets as P  # noqa: E402
from mpc4quantum_tpu.solvers import boxqp, condense  # noqa: E402
from mpc4quantum_tpu.solvers.boxqp import (  # noqa: E402
    BoxQPParams, ns_inverse, solve_boxqp_fixed, jacobi_scale_boxqp)
from mpc4quantum_tpu.benchfleet import (  # noqa: E402
    PRESET_STEADY_BUDGET, PRESET_WARM_BUDGET)

CAPTURE = []
_orig_fixed = boxqp.solve_boxqp_fixed
_orig_adapt = boxqp.solve_boxqp


def _rec(Pm, q, lb, ub, x0=None, params=None, y0=None, rho0=None, **k):
    if len(CAPTURE) < 60:
        CAPTURE.append({
            "P": np.asarray(Pm, np.float32), "q": np.asarray(q, np.float32),
            "lb": np.asarray(lb, np.float32), "ub": np.asarray(ub, np.float32),
            "x0": None if x0 is None else np.asarray(x0, np.float32),
            "y0": None if y0 is None else np.asarray(y0, np.float32),
            "rho0": None if rho0 is None else np.asarray(rho0, np.float32),
        })
    return _orig_fixed(Pm, q, lb, ub, x0=x0, params=params, y0=y0,
                       rho0=rho0, **k)


def capture(preset_name, kw, n_steps):
    CAPTURE.clear()
    sc = P.PRESETS[preset_name](**kw)
    cfg = dataclasses.replace(
        sc.config, n_steps=n_steps, traj_mode="none", qp_backend="ns",
        qp_warm_duals=True,
        qp_params=sc.config.qp_params.replace(unroll=False))
    wb = PRESET_WARM_BUDGET.get(preset_name)
    if wb is not None:
        cfg = dataclasses.replace(cfg, qp_params=cfg.qp_params.replace(
            n_rounds=wb[1][0], max_iter=wb[1][1]))
    import mpc4quantum_tpu as m4q

    boxqp.solve_boxqp_fixed = _rec
    boxqp.solve_boxqp = _rec
    condense.solve_boxqp_fixed = _rec
    condense.solve_boxqp = _rec
    try:
        with jax.disable_jit():
            args = sc.mpc_args()
            args["config"] = cfg
            m4q.mpc(**args, key=jax.random.PRNGKey(0))
    finally:
        boxqp.solve_boxqp_fixed = _orig_fixed
        boxqp.solve_boxqp = _orig_adapt
        condense.solve_boxqp_fixed = _orig_fixed
        condense.solve_boxqp = _orig_adapt
    # steady phase = one single-shot solve per step >= 2
    chain = list(CAPTURE)[-(n_steps - 2):]
    return chain


def replay(preset_name, chain):
    tuned = PRESET_STEADY_BUDGET[preset_name]
    r, i = tuned["budget"]
    params = BoxQPParams(max_iter=i, n_rounds=r, unroll=False,
                         accept_abs=4e-3, accept_rel=4e-3,
                         ns_iters=tuned.get("ns_iters", 20),
                         scale=tuned.get("scale", False),
                         rho0=tuned.get("rho0", 0.1))
    sigma = params.sigma
    print(f"\n=== {preset_name} n={chain[0]['q'].shape[0]} "
          f"({len(chain)} steady solves, budget {r}x{i}, "
          f"ns_iters {params.ns_iters}, scale {params.scale}) ===")
    cold = []
    for s in chain:
        cold.append(_orig_fixed(jnp.asarray(s["P"]), jnp.asarray(s["q"]),
                                jnp.asarray(s["lb"]), jnp.asarray(s["ub"]),
                                x0=s["x0"], y0=s["y0"], rho0=s["rho0"],
                                params=params))
    n_acc_cold = sum(bool(c.converged) for c in cold)
    for refresh in (6, 8, 10, 12):
        pr = params.replace(ns_refresh=refresh)
        kinv = None
        r0s, dxs, acc = [], [], 0
        for s, c in zip(chain, cold):
            if kinv is not None:
                # guard residual in the solve's working (scaled) coordinates
                Pm = 0.5 * (s["P"] + s["P"].T)
                qq, lbb, ubb = s["q"], s["lb"], s["ub"]
                if pr.scale:
                    Pm, qq, lbb, ubb, _, _, _ = jacobi_scale_boxqp(
                        jnp.asarray(Pm), jnp.asarray(qq), jnp.asarray(lbb),
                        jnp.asarray(ubb))
                    Pm = np.asarray(Pm)
                ds = max(float(np.mean(np.diag(Pm))), 1e-12)
                rho = float(np.clip(s["rho0"], 1e-8 * ds, 1e8 * ds)
                            if s["rho0"] is not None and s["rho0"] > 0
                            else pr.rho0 * ds)
                K = Pm + (sigma + rho) * np.eye(Pm.shape[0], dtype=np.float32)
                r0s.append(float(np.max(np.sum(
                    np.abs(np.eye(K.shape[0]) - K @ np.asarray(kinv)), axis=-1))))
            got = _orig_fixed(jnp.asarray(s["P"]), jnp.asarray(s["q"]),
                              jnp.asarray(s["lb"]), jnp.asarray(s["ub"]),
                              x0=s["x0"], y0=s["y0"], rho0=s["rho0"],
                              params=pr, kinv0=kinv)
            kinv = got.kinv
            acc += int(bool(got.converged))
            dxs.append(float(jnp.max(jnp.abs(got.x - c.x))))
        r0a = np.asarray(r0s) if r0s else np.asarray([0.0])
        print(f"  refresh {refresh:>2d}: r0 med/max {np.median(r0a):.3f}/"
              f"{r0a.max():.3f}  guard_fallbacks {(r0a >= 0.9).sum()}/{len(r0a)}"
              f"  max|dx| {max(dxs):.2e}  accepted {acc}/{len(chain)} "
              f"(cold {n_acc_cold}/{len(chain)})")


SPECS = {"not_state_freq": ({}, 14),
         "drag_state": ({}, 14),
         "cnot_state": ({"order": 2}, 14)}


def main():
    names = sys.argv[1:] or list(SPECS)
    for name in names:
        kw, n_steps = SPECS[name]
        chain = capture(name, kw, n_steps)
        if not chain:
            print(f"{name}: no QPs captured")
            continue
        replay(name, chain)
    print("SWEEP_KINV_CHAIN_DONE", flush=True)


if __name__ == "__main__":
    main()
