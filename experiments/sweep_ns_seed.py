"""Can a better Newton-Schulz SEED shorten the K-inverse chain?

The big-kernel presets are NS-chain-bound (r4_ns_share.log), and the
round-4b rollout A/B showed budget cuts barely move them (r4b_ab.log:
freq 1.03x, drag 1.00x) - the per-solve NS chain, not the ADMM iteration
count, is the serial floor. ns_inverse seeds X0 = K^T/(||K||_1 ||K||_inf),
whose residual r0 = ||I - K X0|| approaches 1 for spread spectra; since
NS squares the residual each iteration, most of the chain is spent
dragging r0 from ~1 down to ~0.5. A seed with smaller r0 saves those
iterations outright.

Candidates (all matmul-only, batch-friendly):
- norm  (current): X0 = K^T / (n1 * ninf). Guaranteed r0 < 1 for SPD.
- trace: X0 = (tr K / tr K^2) K - the Frobenius-optimal scalar seed
         (minimizes ||I - a K||_F over a). Guaranteed contraction for SPD
         in Frobenius norm; cheap (two reductions).
- diag:  X0 = diag(1/K_ii) - Jacobi seed. NOT guaranteed (r0 = max row sum
         of off-diagonal mass after Jacobi scaling); needs the same guard
         as the warm-start path.

For each preset's captured production QPs (the warm/cold rho and, for the
scaled presets, the equilibrated steady K), print the ||I - K X_k||_inf
ladder per seed and the iteration count to 1e-4 / 1e-6.

RESULT: decisively NEGATIVE - the norm seed is the only one that
contracts on every production QP. trace diverges outright on the
unequilibrated presets (r0 up to 2.7e4 on cnot: the Frobenius-optimal
scalar is dominated by the large eigenvalues and kicks the small ones
outside the contraction disk); diag sits at r0 0.89-2.5 (stalls at 40
iters even where r0 < 1 - its residual is not SPD-symmetric so the
quadratic phase never engages) and needs a guard+fallback anyway. The
NS chain length is a property of the QPs' spectra, not the seed; the
serial floor stands. (Logged in this docstring; no separate log file -
the sweep is deterministic from the captured QPs.)
"""
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from mpc4quantum_tpu.solvers.boxqp import BoxQPParams, jacobi_scale_boxqp  # noqa: E402
from sweep_ns_iters import capture  # noqa: E402


def seed_norm(K):
    n1 = jnp.max(jnp.sum(jnp.abs(K), axis=-2), axis=-1)
    ninf = jnp.max(jnp.sum(jnp.abs(K), axis=-1), axis=-1)
    return jnp.swapaxes(K, -1, -2) / (n1 * ninf)


def seed_trace(K):
    a = jnp.trace(K) / jnp.sum(K * K)
    return a * jnp.swapaxes(K, -1, -2)


def seed_diag(K):
    return jnp.diag(1.0 / jnp.diagonal(K))


def ladder(K, X, iters=40):
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    rs = []
    for _ in range(iters):
        rs.append(float(jnp.max(jnp.abs(eye - K @ X))))
        X = X @ (2.0 * eye - K @ X)
    rs.append(float(jnp.max(jnp.abs(eye - K @ X))))
    return rs


def iters_to(rs, tol):
    for i, r in enumerate(rs):
        if r < tol:
            return i
    return None


def probe(name, scale=False, rho0=None):
    qps = capture(name)
    if not qps:
        print(f"{name}: no QPs captured")
        return
    params = BoxQPParams(unroll=False, **({"rho0": rho0} if rho0 else {}))
    sigma = params.sigma
    n = qps[0][0].shape[0]
    print(f"\n=== {name} n={n} ({len(qps)} QPs, scale={scale}, "
          f"rho0={rho0 or params.rho0}) ===", flush=True)
    stats = {s: {"1e-4": [], "1e-6": [], "r0": []}
             for s in ("norm", "trace", "diag")}
    for (Pm, q, lb, ub) in qps:
        Pm = 0.5 * (Pm + Pm.T)
        if scale:
            Ps, *_ = jacobi_scale_boxqp(jnp.asarray(Pm), jnp.asarray(q),
                                        jnp.asarray(lb), jnp.asarray(ub))
            Pm = np.asarray(Ps)
        rho = float(params.rho0 * max(np.mean(np.diag(Pm)), 1e-12))
        K = jnp.asarray(Pm + (sigma + rho) * np.eye(Pm.shape[0]), jnp.float32)
        for sname, fn in (("norm", seed_norm), ("trace", seed_trace),
                          ("diag", seed_diag)):
            rs = ladder(K, fn(K))
            stats[sname]["r0"].append(rs[0])
            for tol in ("1e-4", "1e-6"):
                it = iters_to(rs, float(tol))
                stats[sname][tol].append(40 if it is None else it)
    for sname, d in stats.items():
        print(f"  {sname:>5s}: r0 med/max {np.median(d['r0']):.3f}/"
              f"{np.max(d['r0']):.3f}  iters->1e-4 "
              f"med/max {np.median(d['1e-4']):.0f}/{np.max(d['1e-4']):.0f}  "
              f"->1e-6 {np.median(d['1e-6']):.0f}/{np.max(d['1e-6']):.0f}",
              flush=True)


if __name__ == "__main__":
    probe("not_state_freq", scale=True)
    probe("drag_state", scale=True)
    probe("cnot_state", rho0=1.0)
    probe("crosstalk", rho0=1.0)
    # unscaled warm-phase forms of the scaled presets
    probe("not_state_freq", scale=False)
    probe("drag_state", scale=False)
    print("SWEEP_NS_SEED_DONE", flush=True)
