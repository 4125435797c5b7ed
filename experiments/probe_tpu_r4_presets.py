"""TPU probe (round 4, stage 3): per-preset batch-knee sweep through the
production engine (run_hostloop_fleet, pallas impls), median-of-3 timed
reps - the flagship-grade methodology VERDICT r3 item 3 demands for the
non-flagship presets.

r03 recorded baselines (BENCH_r03.json, single timed runs):
  not_state_freq 487 r/s @1024, drag_state 523 @256, crosstalk 184 @256,
  cnot_state 18.9 @64, not_gate 339 @128.
Round-4 changes in play: warm (8,1)/(8,4) budgets, ns_iters 20/24, auto
kernel small at n<=16 (not_gate!), cnot at order 2 (quality >=0.99).

Env: PW_STAGE (all | a comma list of preset names).
"""
import os, sys, time, traceback
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

# preset -> (build kwargs, batch ladder)
SPECS = {
    "not_gate": ({"n_steps": 90}, [128, 256, 512]),
    "drag_state": ({}, [256, 512, 1024]),
    "not_state_freq": ({}, [1024, 2048]),
    "crosstalk": ({}, [256, 512, 1024]),
    "lindblad_state": ({}, [1024, 4096]),
    "cnot_state": ({"order": 2}, [64, 128]),
}


def main():
    print("device:", jax.devices()[0], flush=True)
    stage = os.environ.get("PW_STAGE", "all")
    names = list(SPECS) if stage == "all" else [s for s in stage.split(",") if s]
    for name in names:
        kw, ladder = SPECS[name]
        with jax.default_device(jax.devices("cpu")[0]):
            sc = presets.PRESETS[name](**kw)
        for batch in ladder:
            try:
                t0 = time.time()
                m, _ = run_hostloop_fleet(sc, batch, reps=4)
                print(f"[{name:>16s} B={batch:>5d}] "
                      f"{m['rollouts_per_s']:.1f} r/s "
                      f"(med {m['rollouts_per_s_median']:.1f}) "
                      f"first={m['first_run_s']}s "
                      f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                      f"fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
                      f"early={m['exit_early_frac']:.4f} "
                      f"total={time.time() - t0:.0f}s", flush=True)
            except Exception:
                print(f"[{name} B={batch}] FAIL", flush=True)
                traceback.print_exc()
                print("PROBE_R4_PRESETS_ABORT (backend may be wedged)",
                      flush=True)
                return
    print("PROBE_R4_PRESETS_DONE", flush=True)


if __name__ == "__main__":
    main()
