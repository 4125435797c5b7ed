"""TPU probe #4: full4-production (A) vs round-4b-production (B) forms,
pairwise within ONE process - the definitive rollout-level measurement of
the round-4b adoptions (budget floors, fuse transfers, warm step-0 7).

A-forms reconstruct the r4_bench_full4.log production configuration
explicitly (warm_sqp (8,1), fuse 3, the pre-4b warm/steady budgets);
B-forms are a plain run_hostloop_fleet call under the current tables
((7,1), the 4b budgets, per-preset fuse). Quality gates ride along: the
4b budgets were confirmed on CPU (confirm_budget_floors_r4b.py), so any
fid/fail delta here is a chip-tail regression signal.

Pairs: flagship 16384, freq 1024, drag 2048, cnot 128, not_gate 1024,
lindblad (A: its old 8192 knee; B: the new 16384 knee), crosstalk 1024.
"""
import dataclasses
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_default_matmul_precision", "highest")

from mpc4quantum_tpu import presets  # noqa: E402
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet  # noqa: E402
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams  # noqa: E402

A = 4e-3  # production acceptance


def _acc(**kw):
    return BoxQPParams(accept_abs=A, accept_rel=A, **kw)


# (preset, batch, build_kw, n_steps, A-form kwargs)
# A-forms mirror the full4 production construction: warm budget via
# sc.config.qp_params (rho0/ns_iters included - the tuned table no longer
# applies once qp_params is caller-modified), steady via steady_qp_params.
PAIRS = (
    ("not_state", 16384, {}, 0,
     dict(warm_sqp_iters=(8, 1), steady_fuse=3,
          warm=dict(max_iter=15, n_rounds=3),
          steady=_acc(max_iter=10, n_rounds=2, ns_iters=20))),
    ("not_state_freq", 1024, {}, 0,
     dict(warm_sqp_iters=(8, 1), steady_fuse=3,
          warm=dict(max_iter=50, n_rounds=2, ns_iters=20),
          steady=_acc(max_iter=50, n_rounds=1, ns_iters=16, scale=True))),
    ("drag_state", 2048, {}, 0,
     dict(warm_sqp_iters=(8, 1), steady_fuse=3,
          warm=dict(max_iter=50, n_rounds=2, ns_iters=24),
          steady=_acc(max_iter=24, n_rounds=1, ns_iters=24, scale=True))),
    ("cnot_state", 128, {"order": 2}, 0,
     dict(warm_sqp_iters=(8, 1), steady_fuse=3,
          warm=dict(max_iter=100, n_rounds=3, rho0=1.0, ns_iters=20),
          steady=_acc(max_iter=100, n_rounds=1, rho0=1.0,
                      eps_abs=1e-8, eps_rel=1e-8, ns_iters=20))),
    ("not_gate", 1024, {}, 90,
     dict(warm_sqp_iters=(8, 1), steady_fuse=3,
          warm=dict(max_iter=15, n_rounds=3),
          steady=_acc(max_iter=10, n_rounds=2, ns_iters=20))),
    ("lindblad_state", None, {}, 0,    # A: B=8192 fuse 3; B: table (16384)
     dict(batch_a=8192, batch_b=16384,
          warm_sqp_iters=(8, 1), steady_fuse=3,
          warm=None, steady=None)),
    ("crosstalk", 1024, {}, 0,
     dict(warm_sqp_iters=(8, 4), steady_fuse=3,
          warm=None, steady=None)),
)


def run_one(name, batch, kw, n_steps, label, **fleet_kw):
    with jax.default_device(jax.devices("cpu")[0]):
        sc = presets.PRESETS[name](**kw)
        if n_steps:
            sc = dataclasses.replace(
                sc, config=dataclasses.replace(sc.config, n_steps=n_steps))
        warm = fleet_kw.pop("warm", None)
        if warm is not None:
            sc = dataclasses.replace(
                sc, config=dataclasses.replace(
                    sc.config, qp_params=sc.config.qp_params.replace(**warm)))
    t0 = time.time()
    m, _ = run_hostloop_fleet(sc, batch, reps=4, **fleet_kw)
    print(f"[{name:>14s} B={batch:>5d} {label}] "
          f"{m['rollouts_per_s']:.1f} r/s (med {m['rollouts_per_s_median']:.1f}) "
          f"first={m['first_run_s']}s "
          f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
          f"fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
          f"early={m.get('exit_early_frac', 0.0):.4f} "
          f"total={time.time() - t0:.0f}s", flush=True)
    return m


def main():
    print("device:", jax.devices()[0], flush=True)
    for name, batch, kw, n_steps, a_kw in PAIRS:
        a_kw = dict(a_kw)
        batch_a = a_kw.pop("batch_a", batch)
        batch_b = a_kw.pop("batch_b", batch)
        steady = a_kw.pop("steady", None)
        try:
            ma = run_one(name, batch_a, kw, n_steps, "A full4-form",
                         steady_qp_params=steady, warm=a_kw.pop("warm"),
                         **a_kw)
            mb = run_one(name, batch_b, kw, n_steps, "B r4b-form  ")
            gain = mb["rollouts_per_s"] / ma["rollouts_per_s"]
            dmin = mb["fidelity_min"] - ma["fidelity_min"]
            print(f"[{name}] 4b gain {gain:.2f}x  dfid_min={dmin:+.5f}",
                  flush=True)
        except Exception:
            print(f"[{name}] FAIL", flush=True)
            traceback.print_exc()
            return
    print("PROBE_R4B_AB_DONE", flush=True)


if __name__ == "__main__":
    main()
