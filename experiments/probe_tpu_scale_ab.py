"""On-chip A/B: Jacobi-equilibrated reduced steady budgets vs the unscaled
round-3-early form, on the presets the tuning table scaled (freq, drag).

Run one preset per process if the backend wedges (CLAUDE.md); by default
runs both at modest batches. Prints one line per configuration.
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")

from mpc4quantum_tpu import presets as P
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=["not_state_freq", "drag_state"])
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = the chip default (256); use small values for "
                         "CPU wiring smokes (unroll=True traces are huge)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend BEFORE any device query - "
                         "touching jax.devices() with the axon platform "
                         "registered hangs while the tunnel is down")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    specs = {
        # preset: (batch, unscaled steady budget it replaced)
        "not_state_freq": (256, (2, 25)),
        "drag_state": (256, (2, 25)),
    }
    cpu = jax.devices()[0].platform == "cpu"
    for name in args.names or list(specs):
        batch, (r0, i0) = specs[name]
        batch = args.batch or batch
        with jax.default_device(jax.devices("cpu")[0]):
            sc = P.PRESETS[name]()
        for tag, kw in (
            ("tuned-scaled", {}),  # table default: scaled reduced budget
            ("unscaled-2x%d" % i0,
             {"steady_qp_params": BoxQPParams(
                 max_iter=i0, n_rounds=r0,
                 eps_abs=sc.config.qp_params.eps_abs,
                 eps_rel=sc.config.qp_params.eps_rel,
                 accept_abs=4e-3, accept_rel=4e-3,
                 unroll=sc.config.qp_params.unroll)}),
        ):
            t0 = time.time()
            m, _ = run_hostloop_fleet(sc, batch, cpu=cpu, reps=2, **kw)
            print(f"[{name} {tag:>14s}] {m['rollouts_per_s']:8.1f} r/s "
                  f"fid_min={m['fidelity_min']:.5f} fail={m['qp_fail_frac']:.4f} "
                  f"budget={m['steady_budget']} scale={m['qp_scale']} "
                  f"wall={time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
