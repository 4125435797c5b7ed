"""Steady-budget ROUND-STRUCTURE sweep: 2 x i vs 1 x 2i at equal total ADMM
iterations (CPU, production batch - scan-form iterates are chip-identical,
CLAUDE.md).

Motivation: in the dual-warm-started steady chain rho is frozen on
acceptance, so an accepted solve's second round recomputes the SAME
K-inverse it just used - the big-kernel presets pay a full cold
Newton-Schulz chain (2 serial matmuls x ns_iters) per ROUND while the
NS-share ladders show that chain dominates their rollout
(experiments/logs/r4_ns_share.log). A 1-round budget halves the NS cost at
identical ADMM iteration count; the question is whether the tail lanes that
rely on the round-boundary rho re-balance survive. Gates: fidelity_min and
qp_fail_frac vs the production 2-round form at the SAME batch.

Env: SR_PRESETS (default not_state_freq,drag_state),
     SR_BATCH_<name> overrides.
"""
import os, sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet, PRESET_STEADY_BUDGET
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

SPECS = {"not_state_freq": (1024, {}),
         "drag_state": (1024, {}),
         "cnot_state": (64, {"order": 2}),
         # small-kernel presets: the in-kernel Gauss-Jordan inverse is paid
         # PER ROUND too (~2n^3 FMAs) - a 1-round budget at equal total
         # iterations halves it (the r3 "2x10 stands" sweep varied the
         # total, never the round structure)
         "not_state": (4096, {}),
         "lindblad_state": (4096, {}),
         "not_gate": (512, {"n_steps": 90})}


def main():
    names = os.environ.get("SR_PRESETS",
                           "not_state_freq,drag_state").split(",")
    for name in names:
        batch, kw = SPECS[name]
        batch = int(os.environ.get(f"SR_BATCH_{name}", batch))
        tuned = PRESET_STEADY_BUDGET[name]
        r, i = tuned["budget"]
        forms = [("prod", (r, i)), ("1round", (1, r * i)),
                 ("1round-", (1, int(r * i * 0.8)))]
        sc = presets.PRESETS[name](**kw)
        for label, (rr, ii) in forms:
            qp = BoxQPParams(
                max_iter=ii, n_rounds=rr,
                rho0=(tuned.get("rho0") or sc.config.qp_params.rho0),
                eps_abs=sc.config.qp_params.eps_abs,
                eps_rel=sc.config.qp_params.eps_rel,
                accept_abs=4e-3, accept_rel=4e-3,
                ns_iters=tuned.get("ns_iters", 20),
                unroll=False, scale=tuned.get("scale", False))
            try:
                t0 = time.time()
                m, _ = run_hostloop_fleet(sc, batch, cpu=True, reps=1,
                                          steady_qp_params=qp)
                print(f"[{name:>16s} B={batch:>5d} {label:>8s} {rr}x{ii}] "
                      f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                      f"fail={m['qp_fail_frac']:.4f} "
                      f"done={m['completed_frac']:.4f} "
                      f"total={time.time() - t0:.0f}s", flush=True)
            except Exception:
                print(f"[{name} {label}] FAIL", flush=True)
                traceback.print_exc()
    print("SWEEP_STEADY_ROUNDS_DONE", flush=True)


if __name__ == "__main__":
    main()
