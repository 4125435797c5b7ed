"""TPU probe P: the OTHER benchmark presets as fleets on the chip - drag
(3-level transmon, truncate lift), crosstalk (partial-trace lift,
measure_freq=2, warm_start=False), cnot_state (dim 16, H=50, n=200).

The flagship probe (probe_tpu_pallasloop) covers not_state; this one widens
on-chip validation to the remaining workload shapes. XLA QP path (the
fully-unrolled Pallas kernel is only built for small n = H*dim_u).

Env: PP_CASES (comma list, default "drag,crosstalk,cnot"), PP_BATCH (256).
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import dataclasses
import mpc4quantum_tpu as m4q
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.mpc.hostloop import HostLoopMPC
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch

cases = os.environ.get("PP_CASES", "drag,crosstalk,cnot").split(",")
batch = int(os.environ.get("PP_BATCH", "256"))
step_cap = int(os.environ.get("PP_STEPS", "0"))  # 0 = full length


def _build_cpu(make_sc, B):
    """Construct the scenario + fleet on the CPU backend: preset builders
    run eager complex jnp ops, which must not land on the axon device
    (complex transfers unimplemented) - everything crosses to the TPU later
    through the host-loop's CxPair boundary."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sc = make_sc()
        plants, keys = make_scenario_batch(jax.random.PRNGKey(0), sc.plant, B,
                                           detune_scale=0.01)
        sc = dataclasses.replace(
            sc,
            model=jax.tree.map(np.asarray, sc.model),
            X_targ=np.asarray(sc.X_targ), U_targ=np.asarray(sc.U_targ),
            Q=np.asarray(sc.Q), R=np.asarray(sc.R), Qf=np.asarray(sc.Qf),
        )
        plants = jax.tree.map(np.asarray, plants)
        keys = np.asarray(keys)
    return sc, plants, keys


def run_case(name, make_sc, B, warm_iters=8, plant_step_fn=None):
    sc, plants, keys = _build_cpu(make_sc, B)
    cfg = dataclasses.replace(sc.config, qp_backend="ns")
    if step_cap:
        cfg = dataclasses.replace(cfg, n_steps=min(cfg.n_steps, step_cap))
    runner = HostLoopMPC(cfg, sc.sat, du=sc.du,
                         plant_step_fn=plant_step_fn or quantum_step_taylor,
                         lift_fn=sc.lift_fn, proj_fn=sc.proj_fn,
                         exit_condition=sc.exit_condition,
                         warm_sqp_iters=warm_iters, granularity="mixed",
                         qp_impl="xla", plant_impl="xla")
    t0 = time.time()
    out = runner.run(sc.x0, sc.model, plants, sc.X_targ, sc.U_targ,
                     sc.Q, sc.R, sc.Qf, keys, record=False)
    first = time.time() - t0
    fid = np.real(out["final_x"] @ np.conj(sc.target_state))
    t0 = time.time()
    out = runner.run(sc.x0, sc.model, plants, sc.X_targ, sc.U_targ,
                     sc.Q, sc.R, sc.Qf, keys, record=False)
    best = time.time() - t0
    codes = out["exit_code"]
    print(f"[{name} B={B}] first={first:.0f}s steady={best*1e3:.0f}ms "
          f"-> {B/best:.0f} r/s fid={fid.mean():.5f}/{fid.min():.5f} "
          f"exits={np.bincount(codes, minlength=4).tolist()}", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    if "drag" in cases:
        try:
            run_case("drag", presets.drag_state, batch)
        except Exception:
            print("[drag] FAIL", flush=True)
            traceback.print_exc()
    if "crosstalk" in cases:
        try:
            run_case("crosstalk", lambda: presets.crosstalk(coupling=0.01),
                     batch, warm_iters=6)
        except Exception:
            print("[crosstalk] FAIL", flush=True)
            traceback.print_exc()
    if "cnot" in cases:
        try:
            from mpc4quantum_tpu.solvers.boxqp import BoxQPParams

            cnot_iters = int(os.environ.get("PP_CNOT_ITERS", "100"))

            def make_cnot():
                sc = presets.cnot_state()
                # the preset's 3x300 ADMM budget fully unrolls in the
                # ns/pallas form - too large a graph; 3x100 keeps compile
                # bounded (costs ~0.01 fidelity vs the adaptive path)
                return dataclasses.replace(
                    sc, config=dataclasses.replace(
                        sc.config,
                        qp_params=BoxQPParams(eps_abs=1e-8, eps_rel=1e-8,
                                              max_iter=cnot_iters, n_rounds=3)))

            run_case("cnot", make_cnot, min(batch, 64))
        except Exception:
            print("[cnot] FAIL", flush=True)
            traceback.print_exc()
    if "freq" in cases:
        try:
            run_case("freq", presets.not_state_freq, batch)
        except Exception:
            print("[freq] FAIL", flush=True)
            traceback.print_exc()
    if "gate" in cases:
        try:
            from mpc4quantum_tpu.plants.synthesis import synthesis_step_taylor

            # n_steps=100 > the ~75 needed for the exit condition to be
            # physically reachable (preset docstring) - exercises per-lane
            # masked early exit (code 1) on-chip
            run_case("gate", lambda: presets.not_gate(n_steps=100),
                     min(batch, 128), plant_step_fn=synthesis_step_taylor)
        except Exception:
            print("[gate] FAIL", flush=True)
            traceback.print_exc()
    print("PROBE_P_DONE", flush=True)


if __name__ == "__main__":
    main()
