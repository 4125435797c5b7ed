"""TPU probe: K-inverse carry (MPCConfig.qp_warm_kinv) A/B at the rollout
level, within one process, on the big-kernel presets.

The NS-share ladder (experiments/logs/r4_ns_share.log) bounds the win:
freq 618 -> 1047 r/s and drag 363 -> 711 r/s when the NS budget drops
20 -> 2. The carry replaces the cold 20-iteration inverse with a
contraction-guarded 10-iteration refresh per solve, so the projected
rollout gain is ~1.4-1.6x at equal quality. Gates: fidelity_min within
1e-3 of the cold arm, zero QP failures, completed 1.0.

Env: PW_PRESETS (default not_state_freq,drag_state,cnot_state),
     PW_BATCH_<name> overrides.
"""
import os, sys, time, traceback
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

SPECS = {"not_state_freq": (1024, {}),
         "drag_state": (1024, {}),
         "cnot_state": (64, {"order": 2})}


def main():
    print("device:", jax.devices()[0], flush=True)
    names = os.environ.get(
        "PW_PRESETS", "not_state_freq,drag_state,cnot_state").split(",")
    for name in names:
        batch, kw = SPECS[name]
        batch = int(os.environ.get(f"PW_BATCH_{name}", batch))
        with jax.default_device(jax.devices("cpu")[0]):
            sc = presets.PRESETS[name](**kw)
        base = None
        for wk in (False, True):
            try:
                t0 = time.time()
                m, _ = run_hostloop_fleet(sc, batch, reps=4, warm_kinv=wk)
                print(f"[{name:>16s} B={batch:>5d} kinv={int(wk)}] "
                      f"{m['rollouts_per_s']:.1f} r/s "
                      f"(med {m['rollouts_per_s_median']:.1f}) "
                      f"first={m['first_run_s']}s "
                      f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                      f"fail={m['qp_fail_frac']:.4f} "
                      f"done={m['completed_frac']:.4f} "
                      f"total={time.time() - t0:.0f}s", flush=True)
                if not wk:
                    base = m
                else:
                    gain = (m["rollouts_per_s_median"]
                            / max(base["rollouts_per_s_median"], 1e-9))
                    dfid = m["fidelity_min"] - base["fidelity_min"]
                    ok = (m["qp_fail_frac"] == 0.0
                          and m["completed_frac"] == base["completed_frac"]
                          and dfid > -1e-3)
                    print(f"[{name:>16s}] carry gain {gain:.2f}x  "
                          f"dfid_min={dfid:+.5f}  gates={'OK' if ok else 'FAIL'}",
                          flush=True)
            except Exception:
                print(f"[{name} kinv={wk}] FAIL", flush=True)
                traceback.print_exc()
                return
    print("PROBE_WARM_KINV_DONE", flush=True)


if __name__ == "__main__":
    main()
