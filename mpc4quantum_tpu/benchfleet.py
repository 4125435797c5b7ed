"""Preset fleet benchmarking through the production host-loop TPU engine.

One function: take a named Scenario (presets.py), build a detuning-sweep
fleet, run it through HostLoopMPC with the tuned production defaults (Taylor
plant steps, NS-ADMM QP backend, Pallas kernels on hardware), and return the
quality/throughput metrics the benchmark artifacts record. Shared by the CLI
(`python -m mpc4quantum_tpu <preset> --batch N --hostloop`) and bench.py's
per-preset table so the recorded numbers can never drift from what the CLI
runs.

The reference benches nothing (SURVEY.md section 6: no published numbers);
the workload definitions are its scenario tests
(reference tests/test_mpc4quantum.py:47-804), mirrored by presets.py.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np


def run_hostloop_fleet(sc, batch: int, key=None, cpu: bool = False,
                       record: bool = False, detune_scale: float = 0.01,
                       reps: int = 1, warm_sqp_iters: int = 8,
                       granularity: str = "mixed", steady_fuse: int = 3,
                       warm_duals: bool = False, steady_qp_params=None,
                       qp_kernel: str = "auto"):
    """Run a `batch`-lane detuning-sweep fleet of scenario `sc` end-to-end.

    :param sc: a presets.Scenario.
    :param cpu: True = XLA impls everywhere (kernels need real hardware).
    :param reps: total runs; the reported rate uses the best timed run (the
        first run pays compiles and is reported separately as first_run_s).
    :return: metrics dict (throughput + fidelity/completion quality).
    """
    import jax

    from .mpc.hostloop import HostLoopMPC
    from .parallel.fleet import make_scenario_batch
    from .plants.quantum import QuantumPlant, quantum_step_taylor
    from .plants.synthesis import SynthesisPlant, synthesis_step_taylor
    from .solvers.boxqp import BoxQPParams

    key = jax.random.PRNGKey(1) if key is None else key
    # fleet construction runs eager complex ops - keep it off the TPU
    with jax.default_device(jax.devices("cpu")[0]):
        plants, keys = make_scenario_batch(key, sc.plant, batch,
                                           detune_scale=detune_scale)
        plants = jax.tree.map(np.asarray, plants)
        keys = np.asarray(keys)
        model_np = jax.tree.map(np.asarray, sc.model)
        Xt, Ut = np.asarray(sc.X_targ), np.asarray(sc.U_targ)
        Qn, Rn, Qfn = np.asarray(sc.Q), np.asarray(sc.R), np.asarray(sc.Qf)

    is_quantum = isinstance(sc.plant, QuantumPlant)
    step_fn = (quantum_step_taylor if is_quantum
               else synthesis_step_taylor if isinstance(sc.plant, SynthesisPlant)
               else sc.plant_step_fn)
    cfg = dataclasses.replace(sc.config, qp_backend="ns",
                              qp_warm_duals=warm_duals)
    if cfg.horizon * cfg.dim_u <= 16:
        # the flagship-tuned fixed budget (probe_tpu_budget2.py); larger-n
        # presets keep their own qp_params (e.g. cnot_state's tightened
        # targets + full 3x300 budget)
        cfg = dataclasses.replace(cfg, qp_params=BoxQPParams(max_iter=15,
                                                             n_rounds=3))
    runner = HostLoopMPC(
        cfg, sc.sat, du=sc.du, plant_step_fn=step_fn,
        lift_fn=sc.lift_fn, proj_fn=sc.proj_fn,
        exit_condition=sc.exit_condition,
        warm_sqp_iters=warm_sqp_iters, granularity=granularity,
        steady_fuse=steady_fuse,
        steady_qp_params=steady_qp_params, qp_kernel=qp_kernel,
        qp_impl=("pallas" if (not cpu and cfg.solver == "qp") else "xla"),
        plant_impl="pallas" if (not cpu and is_quantum) else "xla",
    )

    t0 = time.time()
    out = runner.run(sc.x0, model_np, plants, Xt, Ut, Qn, Rn, Qfn, keys,
                     record=record)
    first_s = time.time() - t0
    elapsed = first_s
    for _ in range(max(reps - 1, 0)):
        t0 = time.time()
        out = runner.run(sc.x0, model_np, plants, Xt, Ut, Qn, Rn, Qfn, keys,
                         record=record)
        elapsed = min(elapsed, time.time() - t0)

    fid = np.real(out["final_x"] @ np.conj(sc.target_state))
    codes = out["exit_code"]
    metrics = {
        "preset": sc.name,
        "batch": batch,
        "rollouts_per_s": round(batch / elapsed, 2),
        "first_run_s": round(first_s, 1),
        "fidelity_mean": round(float(fid.mean()), 5),
        "fidelity_min": round(float(fid.min()), 5),
        "completed_frac": round(float(((codes == 0) | (codes == 1)).mean()), 4),
        "exit_early_frac": round(float((codes == 1).mean()), 4),
        "qp_fail_frac": round(float((codes == 2).mean()), 4),
        "qp_impl": runner.qp_impl,
        "plant_impl": runner.plant_impl,
    }
    return metrics, out
