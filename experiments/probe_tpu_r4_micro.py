"""TPU probe: flagship fuse/batch micro-sweep + lindblad knee extension,
one process.

- flagship (not_state, small kernel): steady_fuse 3 vs 6 at B=16384
  (r2 measured fuse 3 >> 1; 3 vs 6 was only ever compared in a slow
  big_unroll session where it was a wash), plus the 24576 batch point
  between the 16k knee and the 32k roll-off.
- lindblad_state: B=16384 (the 8192 point was still rising:
  7757 r/s, r4_knee2.log).
"""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

RUNS = (("not_state", 16384, {"steady_fuse": 3}),
        ("not_state", 16384, {"steady_fuse": 6}),
        ("not_state", 24576, {"steady_fuse": 3}),
        ("lindblad_state", 16384, {}))


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
    print("PROBE_MICRO_DONE", flush=True)


if __name__ == "__main__":
    main()
