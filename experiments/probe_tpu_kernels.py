"""TPU probe K: kernel-level timings on the chip - Pallas vs XLA for the two
hot ops (batched small-matrix expm; lane-batched box-QP ADMM), with achieved
GFLOP/s and bandwidth-bound estimates for the STATUS timing table.

Env: PK_BATCH (default 4096).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from mpc4quantum_tpu.ops.pallas_expm import expm_pallas
from mpc4quantum_tpu.ops.expm import expm_taylor
from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas
from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed, BoxQPParams

B = int(os.environ.get("PK_BATCH", "4096"))
HBM_GBPS = 819.0  # v5e spec


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def fetch(x):
    # complex/aux-safe fetch: first leaf, cast to f32
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(jnp.real(leaf).astype(jnp.float32))


def bench_expm(d):
    rng = np.random.default_rng(0)
    Hs = rng.normal(size=(B, d, d)) + 1j * rng.normal(size=(B, d, d))
    Hs = 0.5 * (Hs + np.conj(np.swapaxes(Hs, 1, 2)))  # hermitian
    A_re = np.ascontiguousarray((-1j * 0.5 * Hs).real.astype(np.float32))
    A_im = np.ascontiguousarray((-1j * 0.5 * Hs).imag.astype(np.float32))

    @jax.jit
    def xla_path(ar, ai):
        return jnp.abs(expm_taylor(jax.lax.complex(ar, ai), fixed_squarings=4))

    @jax.jit
    def pallas_path(ar, ai):
        return jnp.abs(expm_pallas(jax.lax.complex(ar, ai)))

    tx, ox = timeit(xla_path, A_re, A_im)
    tp, op = timeit(pallas_path, A_re, A_im)
    err = float(np.max(np.abs(fetch(ox) - fetch(op))))
    # flops: pallas taylor-18 + <=12 squarings ~= 30 complex matmuls of d^3
    # complex MACs each -> 8 real flops per MAC
    flops = B * 30 * d**3 * 8
    # HBM floor: in 2*d^2*4B, out 2*d^2*4B per matrix
    bytes_moved = B * 4 * d * d * 4
    print(f"[expm d={d} B={B}] xla={tx*1e6:.0f}us pallas={tp*1e6:.0f}us "
          f"speedup={tx/tp:.2f}x maxdiff={err:.2e} "
          f"pallas_gflops={flops/tp/1e9:.1f} "
          f"hbm_floor_us={bytes_moved/HBM_GBPS/1e3:.1f}", flush=True)


def bench_qp(n, iters, rounds):
    rng = np.random.default_rng(1)
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    lb = -np.ones((B, n), np.float32)
    ub = np.ones((B, n), np.float32)
    params = BoxQPParams(max_iter=iters, n_rounds=rounds)

    @jax.jit
    def xla_path(P, q, lb, ub):
        res = jax.vmap(lambda *a: solve_boxqp_fixed(*a, params=params))(P, q, lb, ub)
        return res.x

    @jax.jit
    def pallas_path(P, q, lb, ub):
        return boxqp_pallas(P, q, lb, ub, iters=iters, rounds=rounds)

    tx, ox = timeit(xla_path, P, q, lb, ub)
    tp, op = timeit(pallas_path, P, q, lb, ub)
    err = float(np.max(np.abs(fetch(ox) - fetch(op))))
    # flops per lane: rounds * (gauss-jordan 2n^3 + iters * (matvec 2n^2 + ~8n))
    flops = B * rounds * (2 * n**3 + iters * (2 * n * n + 8 * n))
    bytes_moved = B * (n * n + 4 * n) * 4
    print(f"[boxqp n={n} {rounds}x{iters} B={B}] xla={tx*1e6:.0f}us "
          f"pallas={tp*1e6:.0f}us speedup={tx/tp:.2f}x maxdiff={err:.2e} "
          f"pallas_gflops={flops/tp/1e9:.1f} "
          f"hbm_floor_us={bytes_moved/HBM_GBPS/1e3:.1f}", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    bench_expm(2)
    bench_expm(4)
    bench_qp(10, 60, 2)
    print("PROBE_K_DONE", flush=True)


if __name__ == "__main__":
    main()
