"""CPU confirmation of the COMBINED round-4b budget adoptions at production
batches (the deep ladder swept each cut in isolation; cuts interact through
the warm->steady dual handoff, so the adopted form must be validated jointly).

Adoption candidates (experiments/sweep_budget_floors_r4b.py):
- not_state      warm 3x15 -> 3x12            (3x12 clean at B=4096)
- not_gate       warm 3x15 -> 3x12            (re-run here at n_steps=90 so
                                               the exit condition can fire -
                                               the ladder run was truncated)
- not_state_freq steady 1x50 -> 1x40 AND warm 2x50 -> 2x40 (jointly)
- drag_state     steady 1x24 -> 1x19          (at the production B=2048)
- cnot_state     steady 1x100 -> 1x80         (full 200 steps, order 2 -
                                               1x80 = 0.99673 min in
                                               r4_cpu_sweeps.log; re-run at
                                               the production key here)

Gates: fidelity_min within 1e-3 of the production form, fail 0, done 1
(not_gate: exit_early_frac 1).
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


def run(name, batch, warm=None, steady=None, build_kw=None, n_steps=0,
        label=""):
    tuned = PRESET_STEADY_BUDGET.get(name, {})
    sc = presets.PRESETS[name](**(build_kw or {}))
    cfg = sc.config
    if n_steps:
        cfg = dataclasses.replace(cfg, n_steps=n_steps)
    if warm is not None:
        cfg = dataclasses.replace(
            cfg, qp_params=cfg.qp_params.replace(
                unroll=False, n_rounds=warm[0], max_iter=warm[1]))
    sc = dataclasses.replace(sc, config=cfg)
    qp = None
    if steady is not None:
        qp = BoxQPParams(
            max_iter=steady[1], n_rounds=steady[0],
            rho0=(tuned.get("rho0") or sc.config.qp_params.rho0),
            eps_abs=sc.config.qp_params.eps_abs,
            eps_rel=sc.config.qp_params.eps_rel,
            accept_abs=4e-3, accept_rel=4e-3,
            ns_iters=tuned.get("ns_iters", 20),
            unroll=False, scale=tuned.get("scale", False))
    t0 = time.time()
    m, _ = run_hostloop_fleet(sc, batch, cpu=True, reps=1,
                              steady_qp_params=qp)
    print(f"[{name:>16s} B={batch:>5d} {label:>24s}] "
          f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
          f"fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
          f"early={m.get('exit_early_frac', 0.0):.4f} "
          f"total={time.time() - t0:.0f}s", flush=True)


CASES = (
    # (name, batch, warm, steady, build_kw, n_steps, label)
    ("not_state", 16384, None, None, None, 0, "prod (3x15 warm)"),
    ("not_state", 16384, (3, 12), None, None, 0, "warm 3x12"),
    ("not_gate", 512, None, None, None, 90, "prod (3x15 warm)"),
    ("not_gate", 512, (3, 12), None, None, 90, "warm 3x12"),
    ("not_state_freq", 1024, None, None, None, 0, "prod (2x50 warm,1x50)"),
    ("not_state_freq", 1024, (2, 40), (1, 40), None, 0, "warm 2x40 + 1x40"),
    ("drag_state", 2048, None, None, None, 0, "prod (1x24)"),
    ("drag_state", 2048, None, (1, 19), None, 0, "steady 1x19"),
    ("cnot_state", 64, None, None, {"order": 2}, 0, "prod (1x100)"),
    ("cnot_state", 64, None, (1, 80), {"order": 2}, 0, "steady 1x80"),
)


def main():
    for case in CASES:
        try:
            run(*case[:2], warm=case[2], steady=case[3], build_kw=case[4],
                n_steps=case[5], label=case[6])
        except Exception:
            print(f"[{case[0]} {case[6]}] FAIL", flush=True)
            traceback.print_exc()
    print("CONFIRM_BUDGET_FLOORS_R4B_DONE", flush=True)


if __name__ == "__main__":
    main()
