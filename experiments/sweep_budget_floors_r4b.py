"""CPU deep-ladder: find the ACTUAL budget cliffs left above the adopted
round-4 forms (scan-form iterates are chip-identical, CLAUDE.md - quality
conclusions transfer; only throughput needs the chip).

Open headroom from r4_cpu_sweeps.log / benchfleet tables:
- freq steady 1x40 measured clean (min 0.99869 vs 0.99873 at 1x50) but was
  never adopted; 1x35/1x30 never tested. freq warm ladder bottomed at 2x50
  "identical through the ladder" - below never tested.
- drag steady 1x19 measured clean (0.99964 vs 0.99962); 1x16/1x14 untested.
- cnot steady 1x80 dips 1.6e-4 (0.99673, far above the 0.99 gate);
  1x70 untested.
- flagship/not_gate warm 3x12: the r3 re-sweep called 3x12 "clean and the
  next session's default candidate" - never adopted or laddered to 3x10.

Gates: fidelity_min within ~1e-3 of prod, qp_fail_frac == 0, done == 1.
"""
import dataclasses
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from mpc4quantum_tpu import presets  # noqa: E402
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet, PRESET_STEADY_BUDGET  # noqa: E402
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams  # noqa: E402


def steady_run(name, batch, rr, ii, build_kw=None, n_steps=0):
    tuned = PRESET_STEADY_BUDGET[name]
    sc = presets.PRESETS[name](**(build_kw or {}))
    if n_steps:
        sc = dataclasses.replace(
            sc, config=dataclasses.replace(sc.config, n_steps=n_steps))
    qp = BoxQPParams(
        max_iter=ii, n_rounds=rr,
        rho0=(tuned.get("rho0") or sc.config.qp_params.rho0),
        eps_abs=sc.config.qp_params.eps_abs,
        eps_rel=sc.config.qp_params.eps_rel,
        accept_abs=4e-3, accept_rel=4e-3,
        ns_iters=tuned.get("ns_iters", 20),
        unroll=False, scale=tuned.get("scale", False))
    t0 = time.time()
    m, _ = run_hostloop_fleet(sc, batch, cpu=True, reps=1, steady_qp_params=qp)
    print(f"[{name:>16s} B={batch:>5d} steady {rr}x{ii:>3d}] "
          f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
          f"fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
          f"total={time.time() - t0:.0f}s", flush=True)


def warm_run(name, batch, rr, ii, build_kw=None):
    sc = presets.PRESETS[name](**(build_kw or {}))
    qp = sc.config.qp_params.replace(unroll=False, max_iter=ii, n_rounds=rr)
    sc = dataclasses.replace(
        sc, config=dataclasses.replace(sc.config, qp_params=qp))
    t0 = time.time()
    m, _ = run_hostloop_fleet(sc, batch, cpu=True, reps=1)
    print(f"[{name:>16s} B={batch:>5d} warm   {rr}x{ii:>3d}] "
          f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
          f"fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
          f"total={time.time() - t0:.0f}s", flush=True)


STEADY = (
    ("not_state_freq", 1024, [(1, 40), (1, 35), (1, 30)], None, 0),
    ("drag_state", 1024, [(1, 19), (1, 16), (1, 14)], None, 0),
    ("cnot_state", 64, [(1, 80), (1, 70)], {"order": 2}, 60),
)
WARM = (
    ("not_state", 4096, [(3, 15), (3, 12), (3, 10)], None),
    ("not_gate", 512, [(3, 15), (3, 12)], None),
    ("not_state_freq", 1024, [(2, 40), (2, 30), (2, 25)], None),
)


def main():
    for name, batch, ladder, kw, n_steps in STEADY:
        for rr, ii in ladder:
            try:
                steady_run(name, batch, rr, ii, kw, n_steps)
            except Exception:
                print(f"[{name} steady {rr}x{ii}] FAIL", flush=True)
                traceback.print_exc()
    for name, batch, ladder, kw in WARM:
        for rr, ii in ladder:
            try:
                warm_run(name, batch, rr, ii, kw)
            except Exception:
                print(f"[{name} warm {rr}x{ii}] FAIL", flush=True)
                traceback.print_exc()
    print("SWEEP_BUDGET_FLOORS_R4B_DONE", flush=True)


if __name__ == "__main__":
    main()
