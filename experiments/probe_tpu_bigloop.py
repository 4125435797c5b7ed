"""On-chip probe: the LOOPED big QP kernel (fori_loop over iterations,
statically-unrolled column FMAs) after the dynamic_slice fix.

The round-3 chip ladder's preset stage died at
"Unimplemented primitive in Pallas TPU lowering for KernelType.TC:
dynamic_slice" - the looped kernel's column accumulation used
lax.dynamic_slice + dynamic ref indexing under the fori_loop. The fix
unrolls the column loop statically (n is a trace-time constant) and keeps
only the iteration loop dynamic. This probe is the first on-chip execution
of that form: crosstalk-sized (n=40) and cnot-sized (n=150) batches,
parity vs the batched XLA solve_boxqp_fixed (same algorithm, same NS
inverse - chip-verified in round 2) and timing.

One probe per process (a failed execution wedges the backend - CLAUDE.md).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")


def make_qps(B, n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, n, n)).astype(np.float32) / np.sqrt(n)
    P = np.einsum("bij,bkj->bik", A, A) + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(B, n)).astype(np.float32)
    lb = -np.ones((B, n), np.float32)
    ub = np.ones((B, n), np.float32)
    return jnp.asarray(P), jnp.asarray(q), jnp.asarray(lb), jnp.asarray(ub)


def main():
    from mpc4quantum_tpu.ops.pallas_qp import boxqp_pallas_big
    from mpc4quantum_tpu.solvers.boxqp import solve_boxqp_fixed, BoxQPParams

    dev = jax.devices()[0]
    print("device:", dev)

    for (n, B, iters, rounds, tag) in [
        (40, 256, 75, 2, "crosstalk-size"),
        (150, 64, 50, 2, "cnot-size"),
    ]:
        P, q, lb, ub = make_qps(B, n)

        t0 = time.time()
        x = boxqp_pallas_big(P, q, lb, ub, iters=iters, rounds=rounds,
                             unroll_iters=False)
        xk = np.asarray(x)
        first = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            xk = np.asarray(boxqp_pallas_big(
                P, q, lb, ub, iters=iters, rounds=rounds, unroll_iters=False))
        steady = (time.time() - t0) / 3
        print(f"[{tag} n={n} B={B} {rounds}x{iters} looped-kernel] "
              f"first={first:.1f}s steady={steady*1e3:.1f}ms "
              f"|x|max={np.abs(xk).max():.4f}")

        # XLA reference on the host CPU (batched scan doesn't lower on the
        # axon chip; the scan-form iterate chain is the same algorithm)
        pp = BoxQPParams(max_iter=iters, n_rounds=rounds, unroll=False)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            xs = np.asarray(jax.jit(jax.vmap(
                lambda Pb, qb, lbb, ubb: solve_boxqp_fixed(
                    Pb, qb, lbb, ubb, params=pp)[0]
            ))(*jax.device_put((P, q, lb, ub), cpu)))
        print(f"  max|kernel - xla_ns| = {np.abs(xk - xs).max():.3e}")


if __name__ == "__main__":
    main()
