"""How many Newton-Schulz iterations do the preset QPs' K-inverses need?

The fixed-iteration ADMM (solve_boxqp_fixed / boxqp_pallas_big) computes
Kinv = ns_inverse(P + (sigma+rho) I) with a hardcoded-default 30 NS
iterations per rho round - 60 serial batched matmuls each, plausibly the
dominant serial chain of a 2x10 warm-dual steady solve (2x60 matmuls vs 20
ADMM iterations). NS converges quadratically once ||I - K X|| < 1, needing
~log2(cond K) + ~6 iterations, so 30 is likely 1.5-3x overbudget at preset
conditioning (especially equilibrated).

Per preset: capture real condensed QPs from short scan-driver rollouts,
then (chip-parity f32)
  1. cold NS ladder: ||I - K Kinv_k||_inf vs k;
  2. ADMM-solution parity: solve_boxqp_fixed(ns_iters=k) vs k=30 (max |dz|);
  3. seeded refresh: NS started from the previous round's inverse after a
     typical rho rebalance (ratio from the captured solve) - iterations to
     re-converge.

Decision input only - not part of the package.
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

CAPTURE = []
_orig_fixed = boxqp.solve_boxqp_fixed
_orig_adapt = boxqp.solve_boxqp


def _rec(Pm, q, lb, ub, *a, **k):
    if len(CAPTURE) < 30:
        CAPTURE.append(tuple(np.asarray(v, np.float32) for v in (Pm, q, lb, ub)))
    return _orig_fixed(Pm, q, lb, ub, *a, **k)


def capture(preset_name, n_steps=6):
    CAPTURE.clear()
    sc = P.PRESETS[preset_name]()
    cfg = dataclasses.replace(sc.config, n_steps=n_steps, traj_mode="none",
                              qp_backend="ns",
                              qp_params=sc.config.qp_params.replace(unroll=False))
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
    return list(CAPTURE)


def probe(preset_name, scale=False, rho0=None):
    qps = capture(preset_name)
    if not qps:
        print(f"{preset_name}: no QPs captured"); return
    params = BoxQPParams(unroll=False, scale=scale,
                         **({"rho0": rho0} if rho0 else {}))
    sigma = params.sigma
    print(f"\n=== {preset_name} n={qps[0][0].shape[0]} ({len(qps)} QPs, "
          f"scale={scale}, rho0={rho0 or params.rho0}) ===")
    # representative K: the cold-start rho on each captured P
    resids = {k: [] for k in (6, 8, 10, 12, 16, 20, 30)}
    dz = {k: [] for k in (6, 8, 10, 12, 16, 20)}
    refresh = {k: [] for k in (0, 2, 4, 6)}
    for (Pm, q, lb, ub) in qps:
        Pm = 0.5 * (Pm + Pm.T)
        if scale:
            Ps, qs, lbs, ubs, _, _, d = jacobi_scale_boxqp(
                jnp.asarray(Pm), jnp.asarray(q), jnp.asarray(lb), jnp.asarray(ub))
            Pm = np.asarray(Ps)
        n = Pm.shape[0]
        rho = float(params.rho0 * max(np.mean(np.diag(Pm)), 1e-12))
        K = jnp.asarray(Pm + (sigma + rho) * np.eye(n), jnp.float32)
        eye = np.eye(n, dtype=np.float32)
        for k in resids:
            Xk = ns_inverse(K, iters=k)
            resids[k].append(float(jnp.max(jnp.abs(eye - K @ Xk))))
        # ADMM parity at reduced ns_iters (cold budget of the preset)
        ref = _orig_fixed(jnp.asarray(Pm), jnp.asarray(q), jnp.asarray(lb),
                          jnp.asarray(ub), params=params, ns_iters=30)
        for k in dz:
            got = _orig_fixed(jnp.asarray(Pm), jnp.asarray(q), jnp.asarray(lb),
                              jnp.asarray(ub), params=params, ns_iters=k)
            dz[k].append(float(jnp.max(jnp.abs(got.x - ref.x))))
        # seeded refresh after a 2x rho rebalance
        K2 = jnp.asarray(Pm + (sigma + 2.0 * rho) * np.eye(n), jnp.float32)
        X0 = ns_inverse(K, iters=30)
        X = X0
        for k in range(7):
            if k in refresh:
                refresh[k].append(float(jnp.max(jnp.abs(eye - K2 @ X))))
            X = X @ (2.0 * jnp.asarray(eye) - K2 @ X)
    fmt = lambda d: "  ".join(f"{k}:{np.median(v):.1e}/{np.max(v):.1e}"
                              for k, v in d.items())
    print("  cold ||I-KX||  (med/max):", fmt(resids))
    print("  ADMM |dz| vs ns30 (med/max):", fmt(dz))
    print("  refresh after 2x rho (med/max):", fmt(refresh))


if __name__ == "__main__":
    probe("not_state")
    probe("not_gate")
    probe("not_state_freq", scale=True)
    probe("drag_state", scale=True)
    probe("crosstalk", rho0=1.0)
    probe("cnot_state", rho0=1.0)
