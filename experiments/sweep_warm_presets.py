"""CPU sweep: per-preset steady-state ADMM budgets under dual warm-starting.

The non-flagship presets run 2x150 (default) to 3x300 (cnot_state) serial
ADMM iterations per steady QP solve - the dominant serial cost of the
latency-bound TPU kernels. With qp_warm_duals the steady solves start from
the previous step's shifted dual + rebalanced rho, so a fraction of the
budget reaches the same closed-loop quality. This sweep measures, per
preset, closed-loop fidelity/completion of warm-dual reduced steady budgets
against the cold full-budget baseline AT THE SAME n_steps (A/B validity -
for heavy presets n_steps may be truncated; the chosen budget is then
re-validated at full length once, on chip).

Usage:
  python experiments/sweep_warm_presets.py cnot_state "2x100,1x100,2x50" \
      [--batch 8] [--n-steps 60] [--accept 4e-3]

Prints one line per configuration: budget, fidelity mean/min, qp_fail_frac,
completed_frac, elapsed (CPU timing - indicative only; the on-chip gain
scales with the serial iteration count).
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
# f32 (chip parity): the TPU engine runs f32 end-to-end, so budget/quality
# conclusions transfer directly; x64 also doubles the already-large
# cnot-sized traces (A_s alone is (B, 50, 256, 256))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset")
    ap.add_argument("budgets", nargs="?", default="",
                    help="comma list of RxI steady budgets, e.g. 2x100,1x50 "
                         "(empty = cold-only run, e.g. crosstalk whose "
                         "every-step budget is --warm-budget)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-steps", type=int, default=0, help="0 = preset default")
    ap.add_argument("--accept", type=float, default=4e-3,
                    help="steady acceptance thresholds (abs=rel)")
    ap.add_argument("--skip-cold", action="store_true")
    ap.add_argument("--warm-budget", default="",
                    help="RxI override for cfg.qp_params (the WARM-phase "
                         "budget; also every step's budget for "
                         "warm_start=False presets like crosstalk, whose "
                         "steady programs never run)")
    ap.add_argument("--warm-sqp-iters", type=int, default=8)
    ap.add_argument("--scale", action="store_true",
                    help="Jacobi-equilibrate every QP (BoxQPParams.scale)")
    ap.add_argument("--rho0", type=float, default=0.0,
                    help="override qp_params.rho0 (0 = preset value)")
    args = ap.parse_args()

    from mpc4quantum_tpu import presets
    from mpc4quantum_tpu.benchfleet import run_hostloop_fleet
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

    sc = presets.PRESETS[args.preset]()
    # scan-form ADMM (params.unroll=False): same iterates, ~max_iter x
    # faster CPU traces - the flat unrolled chain is only needed on the
    # axon chip (the big-kernel path loops in-kernel there anyway)
    qp_params = sc.config.qp_params.replace(unroll=False)
    if args.warm_budget:
        r, i = args.warm_budget.split("x")
        qp_params = qp_params.replace(max_iter=int(i), n_rounds=int(r))
    if args.scale:
        qp_params = qp_params.replace(scale=True)
    if args.rho0:
        qp_params = qp_params.replace(rho0=args.rho0)
    cfg = dataclasses.replace(sc.config, qp_params=qp_params)
    if args.n_steps:
        cfg = dataclasses.replace(cfg, n_steps=args.n_steps)
    sc = dataclasses.replace(sc, config=cfg)
    print(f"preset={sc.name} batch={args.batch} n_steps={sc.config.n_steps} "
          f"H={sc.config.horizon} dim_u={sc.config.dim_u} "
          f"n_qp={sc.config.horizon * sc.config.dim_u} "
          f"cold_budget={sc.config.qp_params.n_rounds}x{sc.config.qp_params.max_iter}",
          flush=True)

    def run(tag, warm, steady_qp):
        # granularity="sqp": per-iteration programs - the quality-identical
        # form (tests/test_mpc_e2e.py equivalence suite) with ~50x smaller
        # XLA graphs; "mixed"/fused compile of the H=50 presets is
        # tens-of-minutes on CPU while the sweep only needs quality
        t0 = time.time()
        m, _ = run_hostloop_fleet(sc, args.batch, cpu=True, warm_duals=warm,
                                  steady_qp_params=steady_qp,
                                  warm_sqp_iters=args.warm_sqp_iters,
                                  granularity="sqp", steady_fuse=1)
        print(f"[{tag:>12s}] fid_mean={m['fidelity_mean']:.5f} "
              f"fid_min={m['fidelity_min']:.5f} qp_fail={m['qp_fail_frac']:.4f} "
              f"completed={m['completed_frac']:.4f} "
              f"exit_early={m['exit_early_frac']:.4f} "
              f"elapsed={time.time() - t0:.0f}s", flush=True)
        return m

    if not args.skip_cold:
        run("cold", False, None)
    for b in [s for s in args.budgets.split(",") if s]:
        r, i = b.split("x")
        qp = BoxQPParams(max_iter=int(i), n_rounds=int(r),
                         eps_abs=sc.config.qp_params.eps_abs,
                         eps_rel=sc.config.qp_params.eps_rel,
                         accept_abs=args.accept, accept_rel=args.accept,
                         unroll=False, scale=args.scale,
                         rho0=args.rho0 or sc.config.qp_params.rho0)
        run(f"warm {b}", True, qp)


if __name__ == "__main__":
    main()
