"""Round-4 production-tuning validation ladder (CPU, chip-parity f32).

Runs every preset through run_hostloop_fleet's DEFAULT tuned path - which
now includes ns_iters=20, per-warm-step SQP budgets (PRESET_WARM_ITERS),
and the round-3 steady budgets - at meaningful batch sizes, asserting the
bench gates (completed 1.0, qp_fail 0, fidelity_min). The scan-form ADMM
iterates are bit-identical to the chip's unrolled chain, so these quality
conclusions transfer; only throughput needs the chip.

Usage: python experiments/validate_r4_tuning.py [preset ...]
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

from mpc4quantum_tpu import presets  # noqa: E402
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet  # noqa: E402

# preset -> (batch, n_steps override, fidelity_min gate)
SPECS = {
    "not_state": (2048, 0, 0.998),
    "not_gate": (128, 90, None),      # gate: all lanes exit early
    "drag_state": (256, 0, 0.998),
    "not_state_freq": (512, 0, 0.998),
    "crosstalk": (256, 0, 0.98),
    "lindblad_state": (256, 0, 0.85),
    # cnot at the truncated sweep length plateaus at ~0.686 regardless of
    # budget (same at (8,8)/ns30); the full-200-step quality gate (0.98) is
    # validated on chip. This ladder only guards against tuning regressions.
    "cnot_state": (16, 60, 0.67),
}


def main():
    names = sys.argv[1:] or list(SPECS)
    failures = []
    for name in names:
        batch, n_steps, gate = SPECS[name]
        sc = presets.PRESETS[name](**({"n_steps": 90} if name == "not_gate" else {}))
        cfg = dataclasses.replace(
            sc.config, qp_params=sc.config.qp_params.replace(unroll=False))
        if n_steps and name != "not_gate":
            cfg = dataclasses.replace(cfg, n_steps=n_steps)
        sc = dataclasses.replace(sc, config=cfg)
        t0 = time.time()
        m, _ = run_hostloop_fleet(sc, batch, cpu=True,
                                  granularity="sqp", steady_fuse=1)
        ok = (m["completed_frac"] == 1.0 and m["qp_fail_frac"] == 0.0
              and (gate is None or m["fidelity_min"] >= gate)
              and (gate is not None or m["exit_early_frac"] == 1.0))
        print(f"[{name:>16s}] {'OK ' if ok else 'FAIL'} "
              f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
              f"qp_fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
              f"early={m['exit_early_frac']:.4f} warm={m['warm_sqp_iters']} "
              f"steady={m['steady_budget']} elapsed={time.time() - t0:.0f}s",
              flush=True)
        if not ok:
            failures.append(name)
    print("VALIDATE_R4_DONE", "failures:", failures or "none", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
