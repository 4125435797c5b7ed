"""TPU probe: 1-round vs production steady budgets at equal total ADMM
iterations, rollout-level A/B within one process.

Rationale (experiments/sweep_steady_rounds.py, CPU chip-identical
iterates): rho is frozen on acceptance in the dual-warm-started steady
chain, so the second rho round recomputes the same K-inverse - a full
cold Newton-Schulz chain on the big-kernel presets (the dominant rollout
cost, r4_ns_share.log) and a full in-kernel Gauss-Jordan on the small
kernel (~2n^3 FMAs of its program). A 1-round budget halves that at
identical iteration count; CPU quality sweeps at production batches show
freq 1x50 == 2x25 exactly and drag 1x24 within 6e-5.

Env: PR_PRESETS (default freq,drag + flagship), PR_BATCH_<name>.
"""
import os, sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet, PRESET_STEADY_BUDGET
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

SPECS = {"not_state_freq": (1024, {}),
         "drag_state": (1024, {}),
         "not_state": (16384, {}),
         "lindblad_state": (4096, {}),
         "not_gate": (512, {"n_steps": 90}),
         "cnot_state": (128, {"order": 2})}


def main():
    print("device:", jax.devices()[0], flush=True)
    names = os.environ.get(
        "PR_PRESETS", "not_state_freq,drag_state,not_state").split(",")
    for name in names:
        batch, kw = SPECS[name]
        batch = int(os.environ.get(f"PR_BATCH_{name}", batch))
        tuned = PRESET_STEADY_BUDGET[name]
        r, i = tuned["budget"]
        with jax.default_device(jax.devices("cpu")[0]):
            sc = presets.PRESETS[name](**kw)
        base = None
        for label, (rr, ii) in (("prod", (r, i)), ("1round", (1, r * i))):
            qp = BoxQPParams(
                max_iter=ii, n_rounds=rr,
                rho0=(tuned.get("rho0") or sc.config.qp_params.rho0),
                eps_abs=sc.config.qp_params.eps_abs,
                eps_rel=sc.config.qp_params.eps_rel,
                accept_abs=4e-3, accept_rel=4e-3,
                ns_iters=tuned.get("ns_iters", 20),
                unroll=sc.config.qp_params.unroll,
                scale=tuned.get("scale", False))
            try:
                t0 = time.time()
                m, _ = run_hostloop_fleet(sc, batch, reps=4,
                                          steady_qp_params=qp)
                print(f"[{name:>16s} B={batch:>5d} {label:>6s} {rr}x{ii}] "
                      f"{m['rollouts_per_s']:.1f} r/s "
                      f"(med {m['rollouts_per_s_median']:.1f}) "
                      f"first={m['first_run_s']}s "
                      f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                      f"fail={m['qp_fail_frac']:.4f} "
                      f"done={m['completed_frac']:.4f} "
                      f"early={m['exit_early_frac']:.4f} "
                      f"total={time.time() - t0:.0f}s", flush=True)
                if label == "prod":
                    base = m
                else:
                    gain = (m["rollouts_per_s_median"]
                            / max(base["rollouts_per_s_median"], 1e-9))
                    dfid = m["fidelity_min"] - base["fidelity_min"]
                    print(f"[{name:>16s}] 1-round gain {gain:.2f}x "
                          f"dfid_min={dfid:+.5f}", flush=True)
            except Exception:
                print(f"[{name} {label}] FAIL", flush=True)
                traceback.print_exc()
                return
    print("PROBE_ROUNDS_DONE", flush=True)


if __name__ == "__main__":
    main()
