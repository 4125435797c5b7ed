"""TPU probe #3: lindblad knee A/B + fuse-6 transfer to the other presets.

Open questions from r4_micro.log / r4_micro2.log (sessions ended mid-probe):
- lindblad 8192 vs 16384 was never A/B'd in ONE process (8,118 @16384 in
  one session vs 7,634 @8192 in another - cross-session, inconclusive).
- fuse 6 won 1.065x on the flagship (adopted); does it transfer to the
  small-kernel lindblad and the big-kernel freq/drag steady chains?

Runs (anchors first so every comparison is within-process):
- lindblad 8192 fuse3 (anchor, cached) / 16384 fuse3 / 8192 fuse6 /
  16384 fuse6
- freq 1024 fuse3 (anchor) / fuse6
- drag 2048 fuse3 (anchor) / fuse6

Result (r4_micro3.log, all within one process): the lindblad knee is
SETTLED at B=16384 (8,134 r/s vs 7,507 at 8192, fuse 3) and fuse 6 adds
1.02-1.03x there (8,336 / med 7,990 vs 7,846) - adopted (B=16384 +
fuse 6). drag fuse 6: 1,736 vs 1,710 (med 1,705 vs 1,661, ~1.03x) -
adopted. freq fuse 6 is a wash (813 vs 822) - keeps fuse 3; its rollout
is QP-chain-bound, not dispatch-bound, at n=50.
"""
import sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

RUNS = (("lindblad_state", 8192, {"steady_fuse": 3}),
        ("lindblad_state", 16384, {"steady_fuse": 3}),
        ("lindblad_state", 8192, {"steady_fuse": 6}),
        ("lindblad_state", 16384, {"steady_fuse": 6}),
        ("not_state_freq", 1024, {"steady_fuse": 3}),
        ("not_state_freq", 1024, {"steady_fuse": 6}),
        ("drag_state", 2048, {"steady_fuse": 3}),
        ("drag_state", 2048, {"steady_fuse": 6}))


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
    print("PROBE_MICRO3_DONE", flush=True)


if __name__ == "__main__":
    main()
