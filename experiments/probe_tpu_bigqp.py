"""TPU probe: the looped large-n box-QP kernel (boxqp_pallas_big) on the
axon chip - does the fori-looped kernel lower at all, does it match the XLA
NS-ADMM path's values, and how do the two compare in time.

Env: PQ_MODE = n10 | n40 | n100 | n150 | n150deep (problem size/budget),
PQ_XLA=1 to also time the on-chip XLA path after the kernel succeeds.
One probe per process (the backend wedges after a failed execution).
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big, boxqp_accept
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams, solve_boxqp_fixed

MODE = os.environ.get("PQ_MODE", "n40")
# (B, n, iters, rounds): n40 ~ crosstalk, n100 ~ freq(H=50,du=1 is n=50;
# 100 exercises the chunked path), n150 ~ cnot, n150deep = cnot full budget
CFGS = {
    "n10": (1024, 10, 15, 3),
    "n40": (256, 40, 30, 2),
    "n100": (256, 100, 30, 2),
    "n150": (64, 150, 60, 2),
    "n150deep": (64, 150, 300, 3),
}
B, n, iters, rounds = CFGS[MODE]


def make(B, n, seed=0):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) / n + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    lb = -np.abs(rng.normal(size=(B, n))).astype(np.float32)
    ub = np.abs(rng.normal(size=(B, n))).astype(np.float32)
    return P, q, lb, ub


def main():
    print(f"device: {jax.devices()[0]}  mode={MODE} B={B} n={n} "
          f"budget={rounds}x{iters}", flush=True)
    P, q, lb, ub = make(B, n)

    t0 = time.time()
    x, aux = boxqp_pallas_big(P, q, lb, ub, iters=iters, rounds=rounds,
                              return_aux=True)
    xh = np.asarray(x)  # errors surface at first TRANSFER on this backend
    print(f"[kernel] first={time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        x, aux = boxqp_pallas_big(P, q, lb, ub, iters=iters, rounds=rounds,
                                  return_aux=True)
        xh = np.asarray(x)
        times.append(time.time() - t0)
    prim = np.asarray(aux.prim)
    params = BoxQPParams(max_iter=iters, n_rounds=rounds)
    conv = np.asarray(boxqp_accept(aux, params.eps_abs, params.eps_rel,
                                   params.accept_abs, params.accept_rel))
    print(f"[kernel] steady={min(times) * 1e3:.0f}ms "
          f"({B / min(times):.0f} solves/s) conv={conv.mean():.3f} "
          f"prim_max={prim.max():.2e}", flush=True)

    # value check vs the XLA NS path on CPU
    with jax.default_device(jax.devices("cpu")[0]):
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        ref = jax.vmap(lambda P, q, lb, ub: solve_boxqp_fixed(
            P, q, lb, ub, params=params))(f32(P), f32(q), f32(lb), f32(ub))
        dx = float(np.max(np.abs(xh - np.asarray(ref.x))))
        conv_ref = np.asarray(ref.converged)
    print(f"[check] max|x_kernel - x_xla_cpu| = {dx:.2e} "
          f"conv_match={bool(np.all(conv == conv_ref))}", flush=True)

    if os.environ.get("PQ_XLA") == "1":
        solve = jax.jit(jax.vmap(lambda P, q, lb, ub: solve_boxqp_fixed(
            P, q, lb, ub, params=params).x))
        t0 = time.time()
        xr = np.asarray(solve(P, q, lb, ub))
        print(f"[xla-chip] first={time.time() - t0:.1f}s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.time()
            xr = np.asarray(solve(P, q, lb, ub))
            times.append(time.time() - t0)
        print(f"[xla-chip] steady={min(times) * 1e3:.0f}ms "
              f"({B / min(times):.0f} solves/s) "
              f"max|dx|={np.max(np.abs(xr - xh)):.2e}", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
