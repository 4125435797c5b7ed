"""TPU probe: deeper steady-fuse under the auto expm budget (flagship).

With the plant chain cut 2.5x (auto expm budget) the per-program balance
moved; fuse=9 makes the 18-step steady phase exactly 2 programs, fuse=18
exactly 1 (the whole rollout then is warm0 + warm1 + 1 steady program =
3 dispatches - the VERDICT r4 item-1 shape). r4 settled fuse=6 at 1.065x
over 3 (r4_micro.log); this re-opens the sweep one step further.

Forms interleaved within one process, medians across rounds.
Env: PF_ROUNDS (2), PF_BATCH (16384).
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

ROUNDS = int(os.environ.get("PF_ROUNDS", "2"))
BATCH = int(os.environ.get("PF_BATCH", "16384"))


def main():
    print("device:", jax.devices()[0], flush=True)
    forms = [("fuse6", {"steady_fuse": 6}), ("fuse9", {"steady_fuse": 9}),
             ("fuse18", {"steady_fuse": 18})]
    res = {f: [] for f, _ in forms}
    for rnd in range(ROUNDS):
        for fname, kw in forms:
            try:
                with jax.default_device(jax.devices("cpu")[0]):
                    sc = presets.PRESETS["not_state"]()
                t0 = time.time()
                m, _ = run_hostloop_fleet(sc, BATCH, reps=3, **kw)
                res[fname].append(m["rollouts_per_s_median"])
                print(f"[{fname:>6s} r{rnd}] {m['rollouts_per_s']:.1f} r/s "
                      f"(med {m['rollouts_per_s_median']:.1f}) "
                      f"first={m['first_run_s']}s "
                      f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                      f"fail={m['qp_fail_frac']:.3f} "
                      f"wall={time.time()-t0:.0f}s", flush=True)
            except Exception:
                print(f"[{fname} r{rnd}] FAIL", flush=True)
                traceback.print_exc()
                return
    med = {f: float(np.median(v)) for f, v in res.items() if v}
    base = med["fuse6"]
    for f, v in med.items():
        print(f"== {f}: med {v:.1f} r/s ({v/base:.2f}x of fuse6)", flush=True)


if __name__ == "__main__":
    main()
