"""TPU probe: flagship batch knee under fuse9 + auto expm budget.

r4_scale.log set the knee at B=16384 under fuse3/small (14.3k r/s) and
r4_micro2.log found B=24576 stacking negative at fuse6. Both adoptions
since (auto expm budget cutting the plant chain 2.5x, steady_fuse=9)
shift the serial/parallel balance toward throughput, so the knee may
have moved. Interleaved per-lane-throughput comparison at B = 16384 /
24576 / 32768; fidelity gates must stay green at every size.

Env: PK_ROUNDS (2).
"""
import os, sys, time, traceback

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

ROUNDS = int(os.environ.get("PK_ROUNDS", "2"))


def main():
    print("device:", jax.devices()[0], flush=True)
    sizes = [16384, 24576, 32768]
    res = {b: [] for b in sizes}
    for rnd in range(ROUNDS):
        for b in sizes:
            try:
                with jax.default_device(jax.devices("cpu")[0]):
                    sc = presets.PRESETS["not_state"]()
                t0 = time.time()
                m, _ = run_hostloop_fleet(sc, b, reps=3)
                res[b].append(m["rollouts_per_s_median"])
                print(f"[B={b:>5d} r{rnd}] {m['rollouts_per_s']:.1f} r/s "
                      f"(med {m['rollouts_per_s_median']:.1f}) "
                      f"first={m['first_run_s']}s "
                      f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                      f"fail={m['qp_fail_frac']:.3f} "
                      f"wall={time.time()-t0:.0f}s", flush=True)
            except Exception:
                print(f"[B={b} r{rnd}] FAIL", flush=True)
                traceback.print_exc()
                return
    med = {b: float(np.median(v)) for b, v in res.items() if v}
    base = med[16384]
    for b, v in med.items():
        print(f"== B={b}: med {v:.1f} r/s ({v/base:.2f}x of 16384)", flush=True)


if __name__ == "__main__":
    main()
