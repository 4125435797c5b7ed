"""TPU probe #2: fuse-6/batch stacking + lindblad knee A/B, one process.

Follow-up to probe_tpu_r4_micro.py (r4_micro.log): fuse 6 gave 1.065x at
B=16384 and B=24576 (fuse 3) matched fuse 6 - do they stack? And the
lindblad 16384 reading (8,118 r/s) lacked a same-session 8192 baseline.

- not_state B=16384 fuse 6: in-process anchor (program cached).
- not_state B=24576 fuse 6: the stacking test (new compile).
- lindblad 8192 / 16384 fuse 3: same-process knee A/B (both cached).
- lindblad 16384 fuse 6: does the flagship fuse win transfer?

Result (r4_micro2.log; session ended after run 3 of 5): stacking is
NEGATIVE - fuse 6 at B=24576 ran 10,118 r/s vs 10,349 at 16384 (0.98x),
so the flagship form stays B=16384 + fuse 6. The lindblad 8192-vs-16384
same-process A/B and the fuse-6 transfer test remain open.
"""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

RUNS = (("not_state", 16384, {"steady_fuse": 6}),
        ("not_state", 24576, {"steady_fuse": 6}),
        ("lindblad_state", 8192, {}),
        ("lindblad_state", 16384, {}),
        ("lindblad_state", 16384, {"steady_fuse": 6}))


def main():
    print("device:", jax.devices()[0], flush=True)
    for name, batch, kw in RUNS:
        with jax.default_device(jax.devices("cpu")[0]):
            sc = presets.PRESETS[name]()
        try:
            t0 = time.time()
            m, _ = run_hostloop_fleet(sc, batch, reps=4, **kw)
            print(f"[{name:>14s} B={batch:>5d} {kw}] "
                  f"{m['rollouts_per_s']:.1f} r/s "
                  f"(med {m['rollouts_per_s_median']:.1f}) "
                  f"first={m['first_run_s']}s "
                  f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                  f"fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
                  f"total={time.time() - t0:.0f}s", flush=True)
        except Exception:
            print(f"[{name} B={batch} {kw}] FAIL", flush=True)
            traceback.print_exc()
            return
    print("PROBE_MICRO2_DONE", flush=True)


if __name__ == "__main__":
    main()
