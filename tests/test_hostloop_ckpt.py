"""Checkpoint/resume of the host-loop driver.

The reference has no persistence (SURVEY.md section 5.6); long fleets on a
TPU tunnel that drops mid-run need it. Contract under test: a run that
crashes after a checkpoint and is re-invoked with the same checkpoint_path
returns EXACTLY the outputs of an uninterrupted run (full [xs, us]
trajectory included), and a completed run removes its checkpoint.
"""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

from test_mpc_e2e import make_not_state_problem


def _problem(n_steps=8, warm_duals=False):
    rho0, model, plant, X_targ, U_targ, Q, R, Qf, config, sat, du = \
        make_not_state_problem()
    plants, keys = make_scenario_batch(jax.random.PRNGKey(0), plant, 4,
                                       detune_scale=0.01)
    cfg = dataclasses.replace(config, n_steps=n_steps, qp_backend="ns",
                              sqp_unroll=0, qp_warm_duals=warm_duals,
                              qp_params=BoxQPParams(max_iter=30, n_rounds=2,
                                                    unroll=False))
    args = (rho0, model, plants, X_targ, U_targ, Q, R, Qf, keys)
    return cfg, sat, du, args


def _assert_same(out_a, out_b, record):
    np.testing.assert_array_equal(out_a["final_x"], out_b["final_x"])
    np.testing.assert_array_equal(out_a["exit_code"], out_b["exit_code"])
    if record:
        for k in ("xs", "us", "objs", "sqp_iters", "n_valid"):
            np.testing.assert_array_equal(out_a[k], out_b[k])


@pytest.mark.parametrize("record", [True, False])
def test_crash_resume_equals_uninterrupted(tmp_path, record):
    cfg, sat, du, args = _problem(warm_duals=True)  # duals must persist too
    runner = HostLoopMPC(cfg, sat, du=du, plant_step_fn=quantum_step_taylor,
                         warm_sqp_iters=6)
    full = runner.run(*args, record=record)

    ckpt = str(tmp_path / "fleet.npz")
    progs = runner._programs
    orig_adv = progs["advance"]
    calls = {"n": 0}

    def dropping_advance(*a, **k):
        calls["n"] += 1
        if calls["n"] == 6:  # steps 0-4 complete; the tunnel "drops" at 5
            raise RuntimeError("simulated tunnel drop")
        return orig_adv(*a, **k)

    progs["advance"] = dropping_advance
    try:
        with pytest.raises(RuntimeError, match="tunnel drop"):
            runner.run(*args, record=record, checkpoint_path=ckpt,
                       checkpoint_every=2)
    finally:
        progs["advance"] = orig_adv
    assert os.path.exists(ckpt), "a checkpoint must survive the crash"

    resumed = runner.run(*args, record=record, checkpoint_path=ckpt,
                         checkpoint_every=2)
    _assert_same(resumed, full, record)
    assert not os.path.exists(ckpt), "completed run must remove its checkpoint"


def test_crash_resume_fused_chunks(tmp_path):
    """The k-fused steady path (granularity='mixed', steady_fuse=k - the
    production dispatch shape) checkpoints at chunk boundaries and resumes
    to the uninterrupted outputs."""
    cfg, sat, du, args = _problem(warm_duals=True)
    runner = HostLoopMPC(cfg, sat, du=du, plant_step_fn=quantum_step_taylor,
                         warm_sqp_iters=6, granularity="mixed", steady_fuse=2)
    full = runner.run(*args, record=False)

    ckpt = str(tmp_path / "fleet.npz")
    progs = runner._programs
    orig_k = progs["step_steady_k"]
    calls = {"n": 0}

    def dropping_k(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:  # warm steps 0-1 + one 2-step chunk complete
            raise RuntimeError("simulated tunnel drop")
        return orig_k(*a, **k)

    progs["step_steady_k"] = dropping_k
    try:
        with pytest.raises(RuntimeError, match="tunnel drop"):
            runner.run(*args, record=False, checkpoint_path=ckpt,
                       checkpoint_every=2)
    finally:
        progs["step_steady_k"] = orig_k
    assert os.path.exists(ckpt)
    resumed = runner.run(*args, record=False, checkpoint_path=ckpt,
                         checkpoint_every=2)
    _assert_same(resumed, full, record=False)
    assert not os.path.exists(ckpt)


def test_resume_false_starts_cold(tmp_path):
    cfg, sat, du, args = _problem(n_steps=4)
    runner = HostLoopMPC(cfg, sat, du=du, plant_step_fn=quantum_step_taylor,
                         warm_sqp_iters=6)
    ckpt = str(tmp_path / "fleet.npz")
    # leave a mid-run checkpoint behind via a simulated crash
    progs = runner._programs
    orig_adv = progs["advance"]
    calls = {"n": 0}

    def dropping_advance(*a, **k):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("drop")
        return orig_adv(*a, **k)

    progs["advance"] = dropping_advance
    try:
        with pytest.raises(RuntimeError):
            runner.run(*args, record=False, checkpoint_path=ckpt,
                       checkpoint_every=1)
    finally:
        progs["advance"] = orig_adv
    assert os.path.exists(ckpt)
    # resume=False ignores (and eventually removes) the stale file
    out = runner.run(*args, record=False, checkpoint_path=ckpt,
                     checkpoint_every=1, resume=False)
    full = runner.run(*args, record=False)
    _assert_same(out, full, record=False)
    assert not os.path.exists(ckpt)
