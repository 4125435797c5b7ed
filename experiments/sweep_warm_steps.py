"""CPU sweep: per-warm-step SQP budgets (warm_sqp_iters tuples) per preset.

Follow-up to sweep_warm_lqr.py, which measured on the flagship that step 1
converges in ONE line-searched SQP iteration from the shifted step-0 guess:
cold (8,1) is bit-equal to the (8,8) baseline at batch 2048 (fid
0.99927/0.99878, zero failures) while the LQR-seeded init HURTS the worst
lane (0.825). This sweep validates the (8,1)/(8,2) budgets on the other
warm_start presets (and (8,2)-style tuples on crosstalk, whose
warm_start=False makes EVERY step warm) at their production batch sizes.

Usage: python experiments/sweep_warm_steps.py [preset ...]
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from mpc4quantum_tpu import presets  # noqa: E402
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet  # noqa: E402

# preset -> (batch, n_steps override or 0, warm-iters variants)
SPECS = {
    "not_gate": (128, 0, [(8, 8), (8, 1), (8, 2)]),
    "drag_state": (256, 0, [(8, 8), (8, 1), (8, 2)]),
    "not_state_freq": (512, 0, [(8, 8), (8, 1), (8, 2)]),
    "cnot_state": (64, 60, [(8, 8), (8, 1), (8, 2)]),
    "crosstalk": (256, 0, [(8, 8), (8, 2), (8, 4), (8, 2, 1)]),
}


def main():
    names = sys.argv[1:] or list(SPECS)
    for name in names:
        batch, n_steps, variants = SPECS[name]
        sc = presets.PRESETS[name](**({"n_steps": 90} if name == "not_gate" else {}))
        cfg = dataclasses.replace(
            sc.config, qp_params=sc.config.qp_params.replace(unroll=False))
        if n_steps:
            cfg = dataclasses.replace(cfg, n_steps=n_steps)
        sc = dataclasses.replace(sc, config=cfg)
        print(f"=== {name} batch={batch} n_steps={cfg.n_steps} "
              f"warm_start={cfg.warm_start} ===", flush=True)
        for wi in variants:
            t0 = time.time()
            m, _ = run_hostloop_fleet(sc, batch, cpu=True, warm_sqp_iters=wi,
                                      granularity="sqp", steady_fuse=1)
            print(f"  [{str(wi):>10s}] fid={m['fidelity_mean']:.5f}/"
                  f"{m['fidelity_min']:.5f} qp_fail={m['qp_fail_frac']:.4f} "
                  f"done={m['completed_frac']:.4f} "
                  f"early={m['exit_early_frac']:.4f} "
                  f"elapsed={time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
