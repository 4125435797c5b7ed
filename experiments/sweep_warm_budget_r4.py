"""CPU sweep: WARM-phase ADMM budgets for the mid/large presets.

Round 3 swept the STEADY budgets hard (PRESET_STEADY_BUDGET) but left the
warm phase at each preset's default (freq/drag: 2x150; cnot: 3x300). With
the round-4 (8,1) warm-step budgets the warm phase is 9 QP solves - at
2x150 each that is ~half of freq's and ~86% of drag's total serial ADMM
cost. This sweep ladders the warm budget at production batch sizes with
the production tuned steady path, gating on fidelity_min / qp_fail.

Usage: python experiments/sweep_warm_budget_r4.py [preset ...]
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from mpc4quantum_tpu import presets  # noqa: E402
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet  # noqa: E402

# preset -> (batch, n_steps override, build kwargs, warm ladder (rounds, iters))
SPECS = {
    "not_state_freq": (512, 0, {}, [(2, 150), (2, 100), (2, 75), (2, 50)]),
    "drag_state": (256, 0, {}, [(2, 150), (2, 100), (2, 75), (2, 50), (2, 30)]),
    "cnot_state": (64, 60, {"order": 2}, [(3, 300), (3, 200), (3, 150), (3, 100)]),
}


def main():
    names = sys.argv[1:] or list(SPECS)
    for name in names:
        batch, n_steps, kw, ladder = SPECS[name]
        for r, i in ladder:
            sc = presets.PRESETS[name](**kw)
            qp = sc.config.qp_params.replace(unroll=False, max_iter=i,
                                             n_rounds=r)
            cfg = dataclasses.replace(sc.config, qp_params=qp)
            if n_steps:
                cfg = dataclasses.replace(cfg, n_steps=n_steps)
            sc = dataclasses.replace(sc, config=cfg)
            t0 = time.time()
            m, _ = run_hostloop_fleet(sc, batch, cpu=True, granularity="sqp",
                                      steady_fuse=1)
            print(f"[{name:>16s} warm {r}x{i:>3d}] "
                  f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                  f"fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
                  f"elapsed={time.time() - t0:.0f}s", flush=True)
    print("SWEEP_WARM_BUDGET_R4_DONE", flush=True)


if __name__ == "__main__":
    main()
