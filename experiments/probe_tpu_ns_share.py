"""TPU probe: what fraction of the mid presets' step time is the
Newton-Schulz inverse (the B x n^3 batched-matmul chain of the big QP
kernel)?

Times full fleet rollouts with ns_iters in {20 (production), 5, 2} -
quality is IGNORED (5/2 produce garbage inverses); only the wall-clock
delta matters. If 20 -> 2 barely moves the rollout, NS is not the
bottleneck and the planned cross-solve Kinv carry would buy nothing;
if it moves ~linearly, the carry (refresh ~4 iters from the previous
solve's inverse) is a ~2x preset lever.

Env: PW_PRESETS (not_state_freq,drag_state).
"""
import os, sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import (run_hostloop_fleet,
                                        PRESET_STEADY_BUDGET)

SPECS = {"not_state_freq": 1024, "drag_state": 256, "cnot_state": 64}


def main():
    print("device:", jax.devices()[0], flush=True)
    names = os.environ.get("PW_PRESETS", "not_state_freq,drag_state").split(",")
    for name in names:
        batch = SPECS[name]
        for ns in (20, 5, 2):
            PRESET_STEADY_BUDGET[name]["ns_iters"] = ns
            try:
                with jax.default_device(jax.devices("cpu")[0]):
                    sc = presets.PRESETS[name]()
                m, _ = run_hostloop_fleet(sc, batch, reps=3)
                print(f"[{name:>16s} ns={ns:>2d}] {m['rollouts_per_s']:.1f} r/s "
                      f"(med {m['rollouts_per_s_median']:.1f}) "
                      f"first={m['first_run_s']}s fid={m['fidelity_mean']:.4f} "
                      f"fail={m['qp_fail_frac']:.3f}", flush=True)
            except Exception:
                print(f"[{name} ns={ns}] FAIL", flush=True)
                traceback.print_exc()
                return
        PRESET_STEADY_BUDGET[name]["ns_iters"] = 20
    print("PROBE_NS_SHARE_DONE", flush=True)


if __name__ == "__main__":
    main()
