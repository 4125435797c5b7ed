"""Quality gates for the per-preset production steady budgets.

benchfleet.PRESET_STEADY_BUDGET carries the round-3 swept dual-warm-start
budgets (experiments/sweep_warm_presets.py): each preset's steady phase
runs a 2.25-6x reduced ADMM budget seeded by the previous step's (y, rho).
These tests assert the tuned defaults hold closed-loop quality through the
production fleet entry point (run_hostloop_fleet with no overrides - the
exact path bench.py's preset table and the CLI --hostloop use), at reduced
batch so the suite stays fast; bench.py re-gates at the full batch on chip.

The reference has no counterpart (OSQP re-runs cold through CVXPY each
iteration, reference optimize.py:59); the budgets exist because the TPU
kernels are latency-bound on the serial ADMM chain.
"""

import dataclasses
import os

import numpy as np
import jax
import pytest

from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet, PRESET_STEADY_BUDGET

slow = pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                          reason="set RUN_SLOW=1 (cnot full length is ~2 min)")


def _fast_qp(sc):
    """Scan-form ADMM for CPU traces (same iterates as the unrolled chip
    form - tests/test_solvers.py loop-form equivalence)."""
    return dataclasses.replace(
        sc, config=dataclasses.replace(
            sc.config, qp_params=sc.config.qp_params.replace(unroll=False)))


def _run(name, batch, **kw):
    with jax.default_device(jax.devices("cpu")[0]):
        sc = presets.PRESETS[name](**kw)
    m, _ = run_hostloop_fleet(_fast_qp(sc), batch, cpu=True)
    return m


def test_tuned_budget_not_state_freq():
    m = _run("not_state_freq", 8)
    # 2x25 scaled: tail-limited, clean through batch 1024 (benchfleet table
    # note) - smaller budgets pass at this batch but fail fleet-scale tails
    assert m["warm_duals"] and m["steady_budget"] == "1x40", m
    assert m["qp_scale"], m
    assert m["qp_fail_frac"] == 0.0 and m["completed_frac"] == 1.0, m
    assert m["fidelity_min"] >= 0.99, m


def test_tuned_budget_drag_state():
    m = _run("drag_state", 8)
    assert m["warm_duals"] and m["steady_budget"] == "1x19", m
    assert m["qp_scale"], m  # equilibration buys 2x25 -> 2x12 (diag spread ~170)
    assert m["qp_fail_frac"] == 0.0 and m["completed_frac"] == 1.0, m
    assert m["fidelity_min"] >= 0.99, m


def test_tuned_budget_not_gate():
    # gate synthesis: quality = the exit condition fires on every lane
    m = _run("not_gate", 8, n_steps=90)
    assert m["warm_duals"] and m["steady_budget"] == "2x10", m
    assert m["qp_fail_frac"] == 0.0 and m["exit_early_frac"] == 1.0, m


def test_crosstalk_preset_budget():
    """warm_start=False resets the guess every step, so steady programs
    never run and the tuning table must leave crosstalk alone; its cut
    lives in the preset's own qp_params instead (rho0=1.0, 1x150 - measured
    BETTER fidelity than the old 2x150 rho0-default form, presets.py)."""
    assert "crosstalk" not in PRESET_STEADY_BUDGET
    m = _run("crosstalk", 4)
    assert not m["warm_duals"] and m["steady_budget"] == "1x150", m
    assert m["qp_fail_frac"] == 0.0 and m["fidelity_min"] >= 0.995, m


@slow
def test_tuned_budget_cnot_state_full_length():
    """The big one: n_qp=150, 200 steps. The rho0=1.0 + warm-dual 2x50
    production form must BEAT the cold 3x300 ceiling (0.9699 at batch 64 -
    physics-limited, see bench.py preset_spec note): measured 0.98685 at
    batch 64, production path, 1/4 the old 2x200 budget."""
    m = _run("cnot_state", 4)
    assert m["warm_duals"] and m["steady_budget"] == "1x80", m
    assert m["qp_fail_frac"] == 0.0 and m["completed_frac"] == 1.0, m
    assert m["fidelity_min"] >= 0.98, m


def test_explicit_override_wins():
    """Explicit warm_duals=False forces the cold form even for tuned
    presets (the bench's BENCH_WARM_DUALS=0 escape hatch)."""
    with jax.default_device(jax.devices("cpu")[0]):
        sc = presets.PRESETS["drag_state"]()
    m, _ = run_hostloop_fleet(_fast_qp(sc), 4, cpu=True, warm_duals=False)
    assert not m["warm_duals"] and m["steady_budget"] == "2x150", m
    assert m["fidelity_min"] >= 0.99, m
