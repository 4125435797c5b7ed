"""Does diagonal (Jacobi/Ruiz) equilibration shorten ADMM chains on the
real preset QPs?

OSQP always Ruiz-equilibrates; our solver runs on raw condensed data. The
crosstalk finding (diag(P) ~ 1e-3 => rho0 retune halved the budget) hints
conditioning is costing iterations elsewhere too. This probe:

1. captures concrete (P, q, lb, ub) instances from real scan-driver
   rollouts of each preset (monkeypatched solver under jax.disable_jit);
2. for each instance, solves to high accuracy for x*;
3. runs the fixed-budget ADMM raw vs Jacobi-scaled (D = diag(P)^-1/2,
   rho0 re-derived on the scaled problem) across an iteration ladder and
   reports the iterations needed to reach ||z - x*||_inf <= 1e-4 * scale.

Decision input only - not part of the package.
"""

import dataclasses
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from mpc4quantum_tpu import presets as P  # noqa: E402
from mpc4quantum_tpu.solvers import boxqp  # noqa: E402
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams, solve_boxqp  # noqa: E402

CAPTURE = []
_orig_fixed = boxqp.solve_boxqp_fixed
_orig_adapt = boxqp.solve_boxqp


def _rec_fixed(Pm, q, lb, ub, *a, **k):
    if len(CAPTURE) < 40:
        CAPTURE.append(tuple(np.asarray(v, float) for v in (Pm, q, lb, ub)))
    return _orig_fixed(Pm, q, lb, ub, *a, **k)


def _rec_adapt(Pm, q, lb, ub, *a, **k):
    if len(CAPTURE) < 40:
        CAPTURE.append(tuple(np.asarray(v, float) for v in (Pm, q, lb, ub)))
    return _orig_adapt(Pm, q, lb, ub, *a, **k)


def capture(preset_name, n_steps):
    CAPTURE.clear()
    sc = P.PRESETS[preset_name]()
    cfg = dataclasses.replace(sc.config, n_steps=n_steps, traj_mode="none")
    import mpc4quantum_tpu as m4q

    boxqp.solve_boxqp_fixed = _rec_fixed
    boxqp.solve_boxqp = _rec_adapt
    # condense module binds names at import - patch there too
    from mpc4quantum_tpu.solvers import condense
    from mpc4quantum_tpu.mpc import driver as drv

    saved = {}
    for mod in (condense, drv):
        for nm in ("solve_boxqp", "solve_boxqp_fixed"):
            if hasattr(mod, nm):
                saved[(mod, nm)] = getattr(mod, nm)
                setattr(mod, nm, _rec_fixed if "fixed" in nm else _rec_adapt)
    try:
        with jax.disable_jit():
            m4q.mpc(**{**sc.mpc_args(), "config": cfg}, key=jax.random.PRNGKey(0))
    finally:
        boxqp.solve_boxqp_fixed = _orig_fixed
        boxqp.solve_boxqp = _orig_adapt
        for (mod, nm), fn in saved.items():
            setattr(mod, nm, fn)
    return list(CAPTURE)


def iters_to_tol(Pm, q, lb, ub, xstar, scaled, ladder, tol):
    if scaled:
        d = 1.0 / np.sqrt(np.maximum(np.diag(Pm), 1e-12))
        Ps = (d[:, None] * Pm) * d[None, :]
        qs, lbs, ubs = q * d, lb / d, ub / d
    else:
        d = np.ones_like(q)
        Ps, qs, lbs, ubs = Pm, q, lb, ub
    for it in ladder:
        pr = BoxQPParams(max_iter=it, n_rounds=2, unroll=False)
        r = _orig_fixed(jnp.asarray(Ps), jnp.asarray(qs), jnp.asarray(lbs),
                        jnp.asarray(ubs), params=pr)
        x = np.asarray(r.x) * d
        if np.max(np.abs(x - xstar)) <= tol:
            return it
    return None


def main():
    specs = {
        "not_state_freq": 4,
        "drag_state": 4,
        "crosstalk": 4,
        "cnot_state": 3,
    }
    ladder = [5, 10, 15, 25, 40, 60, 90, 150, 250, 400]
    for name, nst in specs.items():
        qps = capture(name, nst)
        # representative subset: first warm, mid, last
        idx = sorted({0, len(qps) // 2, len(qps) - 1})
        conds = [np.linalg.cond(q0[0] + 1e-6 * np.eye(len(q0[1]))) for q0 in qps]
        dspread = [float(np.max(np.diag(q0[0])) / max(np.min(np.diag(q0[0])), 1e-18))
                   for q0 in qps]
        print(f"== {name}: {len(qps)} QPs captured, n={len(qps[0][1])}, "
              f"cond(P) med {np.median(conds):.3g} max {np.max(conds):.3g}, "
              f"diag spread med {np.median(dspread):.3g}", flush=True)
        for i in idx:
            Pm, q, lb, ub = qps[i]
            scale = max(np.max(np.abs(ub[np.isfinite(ub)])), 1e-9)
            ref = solve_boxqp(jnp.asarray(Pm), jnp.asarray(q), jnp.asarray(lb),
                              jnp.asarray(ub),
                              params=BoxQPParams(max_iter=4000, n_rounds=6,
                                                 eps_abs=1e-10, eps_rel=1e-10))
            xstar = np.asarray(ref.x)
            tol = 1e-4 * scale
            raw = iters_to_tol(Pm, q, lb, ub, xstar, False, ladder, tol)
            sca = iters_to_tol(Pm, q, lb, ub, xstar, True, ladder, tol)
            print(f"   qp[{i}] iters-to-1e-4: raw={raw} jacobi={sca}", flush=True)


if __name__ == "__main__":
    main()
