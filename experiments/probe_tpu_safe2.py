"""TPU probe E2: step-by-step fetch bisection of the safe host-loop path.

Probe E's programs compiled and dispatched but the final fetch raised
UNIMPLEMENTED (on axon, execution errors defer to first transfer). This
probe re-runs the same (now cached) programs, fetching a digest after each
program call to locate the first failing dispatch.

Env: PB_BATCH (default 1024).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

batch = int(os.environ.get("PB_BATCH", "1024"))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from probe_tpu_safe import (build, make_carry0, make_prog, CFG_WARM, CFG_STEADY,
                            N_STEPS)
from mpc4quantum_tpu.utils.cxio import split_cx


def digest(x):
    """Fetch a scalar mean through an eager f32 reshape (transfer-safe)."""
    return float(np.asarray(jnp.mean(jnp.asarray(x)).astype(jnp.float32).reshape(1))[0])


def main():
    print("device:", jax.devices()[0], flush=True)
    model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
    cdtype = np.complex64 if jnp.zeros(0).dtype == jnp.float32 else np.complex128
    carry0 = make_carry0(rho0, U_targ, keys, batch, cdtype)
    args = (split_cx(plants), split_cx(model), split_cx(X_targ), U_targ, split_cx(Q), R)

    prog_warm = make_prog(CFG_WARM)
    prog_steady = make_prog(CFG_STEADY)

    cs = split_cx(carry0)
    for k in range(N_STEPS):
        prog = prog_warm if k <= 1 else prog_steady
        t0 = time.time()
        cs = prog(cs, np.asarray(k, np.int32), *args)
        try:
            d = digest(cs[0].re)
            print(f"step {k}: ok digest={d:.6f} ({time.time() - t0:.2f}s)", flush=True)
        except Exception as e:
            print(f"step {k}: FETCH FAIL {type(e).__name__} ({time.time() - t0:.2f}s)", flush=True)
            raise

    fid = np.asarray(cs[0].re)[:, 3]
    codes = np.asarray(jnp.asarray(cs[6]).astype(jnp.float32))
    print(f"fid_mean={fid.mean():.5f} fid_min={fid.min():.5f} "
          f"codes_nonzero={(codes != 0).sum()}", flush=True)
    print("PROBE_E2_OK", flush=True)


if __name__ == "__main__":
    main()
