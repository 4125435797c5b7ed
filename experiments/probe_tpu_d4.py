"""TPU probe L: why is batched expm at d=4 ~400x/element slower than d=2?

Times the pieces: one batched complex matmul, expm_taylor, expm_pallas at
several tile sizes, and a squarings sweep.
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

B = int(os.environ.get("PL_BATCH", "4096"))
d = 4


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    Hs = rng.normal(size=(B, d, d)) + 1j * rng.normal(size=(B, d, d))
    Hs = 0.5 * (Hs + np.conj(np.swapaxes(Hs, 1, 2)))
    A_re = np.ascontiguousarray((-1j * 0.5 * Hs).real.astype(np.float32))
    A_im = np.ascontiguousarray((-1j * 0.5 * Hs).imag.astype(np.float32))

    @jax.jit
    def one_matmul(ar, ai):
        A = jax.lax.complex(ar, ai)
        return jnp.abs(A @ A)

    @jax.jit
    def chain30(ar, ai):
        A = jax.lax.complex(ar, ai)
        P = A
        for _ in range(30):
            P = A @ P
        return jnp.abs(P)

    @jax.jit
    def xla_expm(ar, ai):
        return jnp.abs(expm_taylor(jax.lax.complex(ar, ai), fixed_squarings=4))

    print(f"one batched matmul: {timeit(one_matmul, A_re, A_im)*1e6:.0f}us", flush=True)
    print(f"chain of 30 matmuls: {timeit(chain30, A_re, A_im)*1e6:.0f}us", flush=True)
    print(f"xla expm_taylor sq=4: {timeit(xla_expm, A_re, A_im)*1e6:.0f}us", flush=True)

    for tb in (128, 256, 512):
        for msq in (4, 12):
            @jax.jit
            def pl_expm(ar, ai, tb=tb, msq=msq):
                return jnp.abs(expm_pallas(jax.lax.complex(ar, ai),
                                           max_squarings=msq, tile_b=tb))
            print(f"pallas tile_b={tb} max_sq={msq}: "
                  f"{timeit(pl_expm, A_re, A_im)*1e6:.0f}us", flush=True)
    print("PROBE_L_DONE", flush=True)


if __name__ == "__main__":
    main()
