"""TPU probe: crosstalk round structure A/B (2x75 vs 1x150) at the
rollout level, one process.

crosstalk runs warm_start=False - EVERY step is a cold-dual warm-program
solve at the preset's own qp_params (no steady phase), n_qp=40 on the
big kernel, so each solve pays n_rounds cold Newton-Schulz chains. The
CPU quality sweep at batch 1024 shows 1x150 == 2x75 exactly
(fid 0.99926/0.99926, zero failures; 1x120 is the cliff) - the tuned
rho0=1.0 makes the mid-solve re-balance redundant here too.
"""
import sys, time, traceback
import dataclasses
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet


def main():
    print("device:", jax.devices()[0], flush=True)
    with jax.default_device(jax.devices("cpu")[0]):
        sc0 = presets.PRESETS["crosstalk"]()
    base = None
    for rr, ii in ((2, 75), (1, 150)):
        with jax.default_device(jax.devices("cpu")[0]):
            sc = dataclasses.replace(sc0, config=dataclasses.replace(
                sc0.config, qp_params=sc0.config.qp_params.replace(
                    n_rounds=rr, max_iter=ii)))
        try:
            t0 = time.time()
            m, _ = run_hostloop_fleet(sc, 1024, reps=4)
            print(f"[crosstalk B=1024 {rr}x{ii}] {m['rollouts_per_s']:.1f} r/s "
                  f"(med {m['rollouts_per_s_median']:.1f}) "
                  f"first={m['first_run_s']}s "
                  f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                  f"fail={m['qp_fail_frac']:.4f} done={m['completed_frac']:.4f} "
                  f"total={time.time() - t0:.0f}s", flush=True)
            if base is None:
                base = m
            else:
                print(f"[crosstalk] 1-round gain "
                      f"{m['rollouts_per_s_median'] / base['rollouts_per_s_median']:.2f}x "
                      f"dfid_min={m['fidelity_min'] - base['fidelity_min']:+.5f}",
                      flush=True)
        except Exception:
            print(f"[crosstalk {rr}x{ii}] FAIL", flush=True)
            traceback.print_exc()
            return
    print("PROBE_XTALK_ROUNDS_DONE", flush=True)


if __name__ == "__main__":
    main()
