"""TPU probe: QP kernel forms A/B at the flagship size (n = 10).

Compares, on the axon chip at fleet batch:
  small      - boxqp_pallas: fully-unrolled, in-kernel Gauss-Jordan inverse
               (the round-2 production kernel)
  big_unroll - boxqp_pallas_big(unroll_iters=True): XLA Newton-Schulz
               inverse (MXU matmuls) + unrolled in-kernel ADMM chain -
               ~2x fewer serial VPU ops at the same budget
  big        - boxqp_pallas_big (fori_loop form; may not lower on axon)

Budgets: 3x15 (cold production) and 2x10 (warm-dual steady production).
Env: PQ_FORMS=small,big_unroll[,big]  PQ_B=8192
One probe per process (the backend wedges after a failed execution); the
fori form is LAST so its failure cannot poison the other timings.
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

from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas, boxqp_pallas_big

B = int(os.environ.get("PQ_B", "8192"))
n = 10
FORMS = os.environ.get("PQ_FORMS", "small,big_unroll").split(",")


def make(B, n, seed=0):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(B, n, n)).astype(np.float32)
    P = np.einsum("bij,bkj->bik", G, G) / n + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    lb = -np.abs(rng.normal(size=(B, n))).astype(np.float32)
    ub = np.abs(rng.normal(size=(B, n))).astype(np.float32)
    return P, q, lb, ub


def bench(tag, fn):
    t0 = time.time()
    x = np.asarray(fn())  # errors surface at first transfer
    first = time.time() - t0
    times = []
    for _ in range(5):
        t0 = time.time()
        x = np.asarray(fn())
        times.append(time.time() - t0)
    print(f"[{tag}] first={first:.1f}s steady={min(times)*1e3:.1f}ms "
          f"({B/min(times):.0f} solves/s)", flush=True)
    return x


def main():
    print(f"device: {jax.devices()[0]}  B={B} n={n} forms={FORMS}", flush=True)
    P, q, lb, ub = make(B, n)
    ref = {}
    for iters, rounds in ((15, 3), (10, 2)):
        tag = f"{rounds}x{iters}"
        if "small" in FORMS:
            ref[tag] = bench(f"small {tag}", lambda: boxqp_pallas(
                P, q, lb, ub, iters=iters, rounds=rounds))
        if "big_unroll" in FORMS:
            x = bench(f"big_unroll {tag}", lambda: boxqp_pallas_big(
                P, q, lb, ub, iters=iters, rounds=rounds, unroll_iters=True))
            if tag in ref:
                print(f"  max|dx small vs big_unroll| = "
                      f"{np.max(np.abs(x - ref[tag])):.2e}", flush=True)
        if "big" in FORMS:
            x = bench(f"big(fori) {tag}", lambda: boxqp_pallas_big(
                P, q, lb, ub, iters=iters, rounds=rounds))
            if tag in ref:
                print(f"  max|dx small vs big| = "
                      f"{np.max(np.abs(x - ref[tag])):.2e}", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        sys.exit(1)
