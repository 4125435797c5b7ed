"""TPU probe P: the Pallas kernels on real hardware.

  p1: boxqp_pallas (lane-batched fixed-iteration ADMM) vs numpy mirror
  p2: expm_pallas vs expm_taylor (if p1 passes)

Each in-try so a failure reports cleanly.
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

from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"[OK]   {name} ({time.time() - t0:.1f}s): {out}", flush=True)
        return True
    except Exception:
        print(f"[FAIL] {name} ({time.time() - t0:.1f}s)", flush=True)
        for line in traceback.format_exc().splitlines()[-3:]:
            print("       " + line, flush=True)
        return False


def p1():
    rng = np.random.default_rng(0)
    B, n = 1024, 10
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32) * 2
    lb = -np.abs(rng.normal(size=(B, n))).astype(np.float32)
    ub = np.abs(rng.normal(size=(B, n))).astype(np.float32)

    t0 = time.time()
    x = boxqp_pallas(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb), jnp.asarray(ub),
                     iters=120, tile_b=128)
    x = np.asarray(x)
    wall = time.time() - t0
    # objective vs projected-newton-ish check: feasibility + KKT proxy
    assert np.all(x >= lb - 1e-4) and np.all(x <= ub + 1e-4)
    g = np.einsum("bij,bj->bi", P, x) + q
    kkt = np.max(np.abs(x - np.clip(x - g, lb, ub)))
    # steady timing
    times = []
    for _ in range(3):
        t0 = time.time()
        out = boxqp_pallas(jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb),
                           jnp.asarray(ub), iters=120, tile_b=128)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    return f"kkt={kkt:.2e} first={wall:.1f}s steady={min(times) * 1e3:.1f}ms ({B / min(times):.0f} QP/s)"


def p2():
    from mpc4quantum_tpu.ops.pallas_expm import expm_pallas
    from mpc4quantum_tpu.ops.expm import expm_taylor

    rng = np.random.default_rng(1)
    B, d = 1024, 4
    Hs = rng.normal(size=(B, d, d)) + 1j * rng.normal(size=(B, d, d))
    Hs = (Hs + np.conj(np.swapaxes(Hs, 1, 2))) / 2
    A = (-1j * 0.5) * Hs

    t0 = time.time()
    U1 = np.asarray(jax.jit(lambda a: expm_pallas(a))(jnp.asarray(A.astype(np.complex64))))
    wall = time.time() - t0
    U2 = np.asarray(expm_taylor(jnp.asarray(A)))
    err = np.max(np.abs(U1 - U2))
    return f"max_err_vs_taylor={err:.2e} first={wall:.1f}s"


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    ok = stage("p1_boxqp_pallas", p1)
    if ok:
        stage("p2_expm_pallas", p2)
    print("PROBE_P_DONE", flush=True)
