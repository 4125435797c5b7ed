"""CPU sweep: the warm-phase serial floor under LQR seeding + per-step
warm SQP budgets (round-4 VERDICT item 1).

The round-3 floor claim (3x15 ADMM x 8 SQP x 2 warm steps not shrinkable)
was measured with the SDRE cold init and a FLAT per-warm-step SQP budget.
Two new levers:
  - MPCConfig.lqr_seed: the initial guess is the clipped affine-tracking
    LQR rollout of the step-0 linearization (reference lqr.py proposed-but-
    dead warm start), so step 0 starts near the SQP fixed point;
  - per-step warm budgets (HostLoopMPC warm_sqp_iters=(i0, i1)): from the
    shifted step-0 guess, step 1 converges in 1-2 line-searched iterations,
    so its 8-iteration budget is mostly dead weight.

Sweeps the flagship at the production batch size with chip-parity f32 and
the production NS fixed-iteration ADMM (scan-form iterates == the chip's
unrolled chain, so convergence conclusions transfer; only throughput needs
the chip). Gates: qp_fail_frac == 0, completed_frac == 1, fidelity_min
within 5e-4 of the cold baseline.

Usage: python experiments/sweep_warm_lqr.py [preset] [--batch 2048]
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset", nargs="?", default="not_state")
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--configs", default="")
    args = ap.parse_args()

    from mpc4quantum_tpu import presets
    from mpc4quantum_tpu.benchfleet import run_hostloop_fleet, PRESET_STEADY_BUDGET
    from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

    sc0 = presets.PRESETS[args.preset]()
    # scan-form ADMM: same iterates as the chip's unrolled chain
    base_qp = sc0.config.qp_params.replace(unroll=False)

    def run(tag, warm_iters, warm_budget, seed):
        r, i = warm_budget
        qp = base_qp.replace(n_rounds=r, max_iter=i)
        cfg = dataclasses.replace(sc0.config, qp_params=qp)
        sc = dataclasses.replace(sc0, config=cfg)
        t0 = time.time()
        m, _ = run_hostloop_fleet(
            sc, args.batch, cpu=True, warm_sqp_iters=warm_iters,
            granularity="sqp", steady_fuse=1, lqr_seed=seed)
        # serial ADMM iterations per rollout (warm chain + steady chain)
        tuned = PRESET_STEADY_BUDGET.get(sc.name, {})
        sr, si = tuned.get("budget", (r, i))
        n_warm_steps = 2 if cfg.warm_start else cfg.n_steps
        wi = warm_iters if isinstance(warm_iters, tuple) else (warm_iters,)
        warm_chain = sum(wi[min(s, len(wi) - 1)] * r * i
                         for s in range(n_warm_steps))
        steady_chain = max(cfg.n_steps - n_warm_steps, 0) * sr * si
        print(f"[{tag:>24s}] fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
              f"qp_fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
              f"serial_admm={warm_chain}+{steady_chain}={warm_chain + steady_chain} "
              f"elapsed={time.time() - t0:.0f}s", flush=True)
        return m

    print(f"preset={args.preset} batch={args.batch} "
          f"n_qp={sc0.config.horizon * sc0.config.dim_u}", flush=True)
    # baseline: the recorded production form
    run("base cold (8,8) 3x15", (8, 8), (3, 15), False)
    for seed in (False, True):
        s = "lqr" if seed else "cold"
        run(f"{s} (8,2) 3x15", (8, 2), (3, 15), seed)
        run(f"{s} (6,2) 3x15", (6, 2), (3, 15), seed)
        run(f"{s} (5,2) 3x15", (5, 2), (3, 15), seed)
        run(f"{s} (4,2) 3x15", (4, 2), (3, 15), seed)
        run(f"{s} (8,1) 3x15", (8, 1), (3, 15), seed)
    # ADMM budget cuts under the seed (the round-3 cliff was 2x15 cold)
    run("lqr (8,2) 2x15", (8, 2), (2, 15), True)
    run("lqr (6,2) 2x15", (6, 2), (2, 15), True)
    run("lqr (6,2) 2x10", (6, 2), (2, 10), True)
    run("lqr (5,2) 3x10", (5, 2), (3, 10), True)


if __name__ == "__main__":
    main()
