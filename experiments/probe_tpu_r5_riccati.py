"""TPU probe: Riccati exact K-inverse vs the Newton-Schulz chain.

VERDICT r4 item 2: the cold NS chain is the measured dominant rollout cost
of the big-kernel presets (r4_ns_share.log) and an O(ns_iters n^3)
complexity class that budget/seed/carry sweeps cannot move. The Riccati
factorization (solvers/riccati.py) computes the round-1 K-inverse exactly
in O(H m^2 (m + n)) batched small matmuls. CPU fleet A/Bs already show
fidelity parity; this probe answers the throughput question on the chip.

Methodology (r4 drift lesson, CLAUDE.md): interleave the forms
ns, riccati, ns, riccati ... within ONE process and compare per-form
medians across rounds - sequential one-shot pairs are not conclusive
under the documented ~2x within-process tunnel drift.

Done bar (VERDICT): freq >= 974 r/s (2x its r03 record), cnot >= 74 r/s
(1.5x r04) at equal worst-lane fidelity.
"""
import os, sys, time, traceback

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_default_matmul_precision", "highest")
cache_dir = "/root/repo/.jax_cache"
try:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

# bench-default batches (CLAUDE.md r4 knees); cnot at the bench order-2 form
SPECS = [("not_state_freq", 1024, {}),
         ("drag_state", 2048, {}),
         ("cnot_state", 128, {"order": 2})]
ROUNDS = int(os.environ.get("PW_ROUNDS", "2"))


def main():
    print("device:", jax.devices()[0], flush=True)
    import numpy as np
    for name, batch, kw in SPECS:
        res = {"ns": [], "riccati": []}
        for rnd in range(ROUNDS):
            for kv in ("ns", "riccati"):
                try:
                    with jax.default_device(jax.devices("cpu")[0]):
                        sc = presets.PRESETS[name](**kw)
                    t0 = time.time()
                    m, _ = run_hostloop_fleet(sc, batch, reps=3, kinv=kv)
                    res[kv].append(m["rollouts_per_s_median"])
                    print(f"[{name:>16s} {kv:>7s} r{rnd}] "
                          f"{m['rollouts_per_s']:.1f} r/s "
                          f"(med {m['rollouts_per_s_median']:.1f}) "
                          f"first={m['first_run_s']}s "
                          f"fid={m['fidelity_mean']:.5f}/"
                          f"{m['fidelity_min']:.5f} "
                          f"fail={m['qp_fail_frac']:.3f} "
                          f"wall={time.time()-t0:.0f}s", flush=True)
                except Exception:
                    print(f"[{name} {kv} r{rnd}] FAIL", flush=True)
                    traceback.print_exc()
                    return
        med = {k: float(np.median(v)) for k, v in res.items() if v}
        if med.get("ns"):
            print(f"== {name}: ns med {med['ns']:.1f} r/s, riccati med "
                  f"{med['riccati']:.1f} r/s -> "
                  f"{med['riccati']/med['ns']:.2f}x", flush=True)
    print("PROBE_R5_RICCATI_DONE", flush=True)


if __name__ == "__main__":
    main()
