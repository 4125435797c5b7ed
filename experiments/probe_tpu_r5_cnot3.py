"""TPU probe: cnot order-3 primary model vs order-2 + order-3 rescue.

VERDICT r4 item 5: order 3 measured 0.99797 min fidelity (CPU, batch 64)
vs 0.99737 for the shipped order-2 + per-lane order-3 rescue. Adopt
order 3 as the primary bench model if its throughput cost is < 15%;
else keep the rescue form and commit this A/B.

Forms interleaved within one process at the bench batch (128):
  o2resc - order 2 + rescue {threshold 0.99, order-3 scenario} (bench form)
  o3     - order 3 primary, no rescue
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

ROUNDS = int(os.environ.get("PC_ROUNDS", "2"))
BATCH = int(os.environ.get("PC_BATCH", "128"))
KINV = os.environ.get("PC_KINV")  # optional: carry the adopted kinv


def main():
    print("device:", jax.devices()[0], flush=True)
    kw_extra = {"kinv": KINV} if KINV else {}
    res = {"o2resc": [], "o3": []}
    fid = {"o2resc": [], "o3": []}
    for rnd in range(ROUNDS):
        for form in ("o2resc", "o3"):
            try:
                with jax.default_device(jax.devices("cpu")[0]):
                    if form == "o2resc":
                        sc = presets.PRESETS["cnot_state"](order=2)
                        rescue = {"threshold": 0.99,
                                  "scenario": presets.PRESETS["cnot_state"](order=3)}
                    else:
                        sc = presets.PRESETS["cnot_state"](order=3)
                        rescue = None
                t0 = time.time()
                m, _ = run_hostloop_fleet(sc, BATCH, key=jax.random.PRNGKey(1),
                                          reps=3, rescue=rescue, **kw_extra)
                res[form].append(m["rollouts_per_s_median"])
                fid[form].append(m["fidelity_min"])
                print(f"[cnot {form:>6s} r{rnd}] {m['rollouts_per_s']:.1f} r/s "
                      f"(med {m['rollouts_per_s_median']:.1f}) "
                      f"first={m['first_run_s']}s "
                      f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                      f"fail={m['qp_fail_frac']:.3f} "
                      f"rescue={m.get('rescue_s', 0)}s "
                      f"wall={time.time()-t0:.0f}s", flush=True)
            except Exception:
                print(f"[cnot {form} r{rnd}] FAIL", flush=True)
                traceback.print_exc()
                return
    m2, m3 = np.median(res["o2resc"]), np.median(res["o3"])
    print(f"== cnot o2resc med {m2:.1f} r/s fid_min {min(fid['o2resc']):.5f}; "
          f"o3 med {m3:.1f} r/s fid_min {min(fid['o3']):.5f}; "
          f"o3/o2resc = {m3/m2:.3f}x (adopt o3 if >= 0.85 and fid >= 0.9979)",
          flush=True)
    print("PROBE_R5_CNOT3_DONE", flush=True)


if __name__ == "__main__":
    main()
