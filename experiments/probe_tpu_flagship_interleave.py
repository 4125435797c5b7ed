"""Interleaved flagship A/B: settle the r4b_ab.log 0.87x anomaly.

probe_tpu_r4b_ab.py measured the r4b flagship form ((7,1), warm 3x12,
fuse 6) at 0.87x the full4 form ((8,1), 3x15, fuse 3) - physically odd
(strictly less work per rollout) and contradicting the micro-probes'
fuse-6 1.065x. Two candidate explanations: tunnel drift between the
sequential A and B runs (A ran ~10 min earlier), or the remote compiler
pessimizing the new program's fusion. An interleaved F1 F2 F3 x2 sequence
(all programs cached on round 2) separates drift from program properties.

F1 = (8,1), warm 3x15, fuse 3   (full4 production)
F2 = (8,1), warm 3x15, fuse 6   (micro-probe fuse winner)
F3 = (7,1), warm 3x12, fuse 6   (r4b production)
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

B = 16384
STEADY = BoxQPParams(max_iter=10, n_rounds=2, accept_abs=4e-3,
                     accept_rel=4e-3, ns_iters=20)
FORMS = {
    "F1 full4 (8,1) 3x15 f3": dict(warm_sqp_iters=(8, 1), steady_fuse=3,
                                   warm=(3, 15)),
    "F2 fuse6 (8,1) 3x15 f6": dict(warm_sqp_iters=(8, 1), steady_fuse=6,
                                   warm=(3, 15)),
    "F3 r4b   (7,1) 3x12 f6": dict(warm_sqp_iters=(7, 1), steady_fuse=6,
                                   warm=(3, 12)),
}


def main():
    print("device:", jax.devices()[0], flush=True)
    # one fleet, shared across all runs: identical data, zero per-run
    # construction cost after the first
    from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
    with jax.default_device(jax.devices("cpu")[0]):
        sc0 = presets.PRESETS["not_state"]()
        plants, keys = make_scenario_batch(jax.random.PRNGKey(1), sc0.plant,
                                           B, detune_scale=0.01)
    fleet_cache = dict(_plants=plants, _keys=keys)
    for rnd in (1, 2):
        for label, f in FORMS.items():
            r, i = f["warm"]
            with jax.default_device(jax.devices("cpu")[0]):
                sc = dataclasses.replace(
                    sc0, config=dataclasses.replace(
                        sc0.config,
                        qp_params=sc0.config.qp_params.replace(
                            max_iter=i, n_rounds=r)))
            try:
                t0 = time.time()
                m, _ = run_hostloop_fleet(
                    sc, B, reps=3, warm_sqp_iters=f["warm_sqp_iters"],
                    steady_fuse=f["steady_fuse"], steady_qp_params=STEADY,
                    **fleet_cache)
                print(f"[round {rnd} {label}] {m['rollouts_per_s']:.1f} r/s "
                      f"(med {m['rollouts_per_s_median']:.1f}) "
                      f"first={m['first_run_s']}s "
                      f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                      f"fail={m['qp_fail_frac']:.4f} "
                      f"total={time.time() - t0:.0f}s", flush=True)
            except Exception:
                print(f"[round {rnd} {label}] FAIL", flush=True)
                traceback.print_exc()
                return
    print("PROBE_FLAGSHIP_INTERLEAVE_DONE", flush=True)


if __name__ == "__main__":
    main()
