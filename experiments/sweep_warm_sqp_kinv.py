"""Is the K-inverse carryable ACROSS SQP ITERATIONS inside warm step 0?

The cross-MPC-step K-inverse carry (qp_warm_kinv) is a shipped negative
result: steady-chain P drift spikes unpredictably (r0 3-9) and NS cannot
recover at refresh budgets. But the warm phase is a different seam: step
0 runs 7 SQP iterations on the SAME problem, each relinearized around a
converging guess - the P drift should SHRINK with SQP convergence. If
||I - K_{i+1} X_i|| < ~0.9 from iteration ~2 on, a guarded refresh-budget
NS (10 iters, the intra-solve machinery that already exists) replaces the
full cold chain (20-24) for most of the warm phase - the warm phase is
~2/3 of freq's and most of drag's serial QP cost after round 4b.

Method: capture the warm-phase QP sequence per preset (scan driver,
n_steps=2 so only warm steps run), compute the consecutive-pair NS
residual r0 and iterations-to-1e-4 from the seeded start, per SQP
iteration index.

RESULT: NEGATIVE, decisively (cnot, the only preset whose scan-driver
warm chain is long enough to capture 7 QPs). Consecutive-SQP carry r0
spikes to 743 / 32,107 on iterations 1-2 and stays 0.87-3.9 even late -
relinearization moves P far more than ADMM convergence suggests. Worse,
even at r0 = 0.868 the SEEDED chain stalls (30 iters to 1e-4 vs 18 cold):
the carried inverse's residual is not SPD-symmetric, so the quadratic
phase never engages - the same stall mechanism sweep_ns_seed.py found for
the diag seed. Together with the cross-step carry (r4_warm_kinv.log), the
seed sweep, one-round budgets (adopted) and the intra-solve rho-shift
refresh (shipped), every seam of the NS-inverse chain is now measured:
the chain is a spectral floor of the production QPs.
"""
import dataclasses
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: b402,E402

sys.path.insert(0, "/root/repo")

from mpc4quantum_tpu.solvers.boxqp import BoxQPParams, ns_inverse, jacobi_scale_boxqp  # noqa: E402
from sweep_ns_iters import capture  # noqa: E402


def iters_to(K, X, tol, cap=30):
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    for i in range(cap):
        if float(jnp.max(jnp.abs(eye - K @ X))) < tol:
            return i
        X = X @ (2.0 * eye - K @ X)
    return cap


def probe(name, n_warm_sqp, rho0=None):
    qps = capture(name, n_steps=2)
    if len(qps) < n_warm_sqp:
        print(f"{name}: only {len(qps)} QPs captured")
        return
    params = BoxQPParams(unroll=False, **({"rho0": rho0} if rho0 else {}))
    sigma = params.sigma
    # the first n_warm_sqp captures are step 0's SQP chain
    Ks = []
    for (Pm, q, lb, ub) in qps[:n_warm_sqp]:
        Pm = 0.5 * (Pm + Pm.T)
        rho = float(params.rho0 * max(np.mean(np.diag(Pm)), 1e-12))
        Ks.append(jnp.asarray(Pm + (sigma + rho) * np.eye(Pm.shape[0]),
                              jnp.float32))
    n = Ks[0].shape[0]
    print(f"\n=== {name} n={n} (step-0 SQP chain, {len(Ks)} QPs) ===",
          flush=True)
    eye = np.eye(n, dtype=np.float32)
    X = ns_inverse(Ks[0], iters=30)
    for i in range(1, len(Ks)):
        r0 = float(jnp.max(jnp.abs(eye - Ks[i] @ X)))
        it4 = iters_to(Ks[i], X, 1e-4)
        it6 = iters_to(Ks[i], X, 1e-6)
        # cold comparison
        c4 = iters_to(Ks[i], ns_inverse(Ks[i], iters=0), 1e-4)
        print(f"  SQP {i}: carry r0={r0:9.3f}  iters->1e-4 {it4:2d} "
              f"(cold {c4:2d})  ->1e-6 {it6:2d}", flush=True)
        X = ns_inverse(Ks[i], iters=30)
    print("SQP_KINV_PROBE_DONE_" + name, flush=True)


if __name__ == "__main__":
    probe("not_state_freq", 7)
    probe("drag_state", 7)
    probe("cnot_state", 7, rho0=1.0)
    probe("crosstalk", 7, rho0=1.0)
    print("SWEEP_WARM_SQP_KINV_DONE", flush=True)
