"""TPU probe: batch-knee extension under the round-4 FINAL production
forms (one-round steady budgets on the big-kernel presets, tuned warm
budgets everywhere). The earlier ladder (r4_presets.log) measured knees
under the 2-round forms; the faster per-step programs may move them up.

Env: PK_SPECS like "not_state_freq:2048,cnot_state:256" (defaults below).
"""
import os, sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

BUILD = {"cnot_state": {"order": 2}, "not_gate": {"n_steps": 90}}
DEFAULT = ("not_state_freq:2048,drag_state:2048,cnot_state:256,"
           "lindblad_state:8192,not_gate:1024")


def main():
    print("device:", jax.devices()[0], flush=True)
    specs = os.environ.get("PK_SPECS", DEFAULT)
    for item in specs.split(","):
        name, batch = item.split(":")
        batch = int(batch)
        with jax.default_device(jax.devices("cpu")[0]):
            sc = presets.PRESETS[name](**BUILD.get(name, {}))
        try:
            t0 = time.time()
            m, _ = run_hostloop_fleet(sc, batch, reps=4)
            print(f"[{name:>16s} B={batch:>5d}] {m['rollouts_per_s']:.1f} r/s "
                  f"(med {m['rollouts_per_s_median']:.1f}) "
                  f"first={m['first_run_s']}s "
                  f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                  f"fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
                  f"early={m['exit_early_frac']:.4f} "
                  f"total={time.time() - t0:.0f}s", flush=True)
        except Exception:
            print(f"[{name} B={batch}] FAIL", flush=True)
            traceback.print_exc()
            return
    print("PROBE_KNEE2_DONE", flush=True)


if __name__ == "__main__":
    main()
