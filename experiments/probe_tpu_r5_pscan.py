"""TPU probe: associative-scan Riccati K-inverse vs the adopted forms.

Why this might win where serial Riccati (0.89-0.93x, r5_riccati.log) and
GJ/NS (a wash at n>=50, r5_xlaqp.log) did not: at freq size the NS chain
runs at 311 GFLOP/s - HBM-bound on (B, 50, 50) passes - and column-wise
GJ makes ~n passes over the same tensor. The pscan factorization's
combines touch (B, H, m, m)/(B, H, m, n) tensors with m = 2*dim_x << n,
in O(log H) levels: less traffic AND less depth.

Forms (interleaved, 2 rounds): freq ns|pscan, drag gj|pscan,
cnot(o2) ns|pscan. Env: PS_ROUNDS, PS_PRESETS.
"""
import os, sys, time, traceback

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

from mpc4quantum_tpu import presets
from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

ROUNDS = int(os.environ.get("PS_ROUNDS", "2"))
SPECS = {
    "not_state_freq": (1024, {}, [("ns", {"kinv": "ns"}),
                                  ("pscan", {"kinv": "riccati_pscan"})]),
    "drag_state": (2048, {}, [("gj", {"kinv": "gj"}),
                              ("pscan", {"kinv": "riccati_pscan"})]),
    "cnot_state": (128, {"order": 2}, [("ns", {"kinv": "ns"}),
                                       ("pscan", {"kinv": "riccati_pscan"})]),
}


def main():
    print("device:", jax.devices()[0], flush=True)
    names = os.environ.get("PS_PRESETS",
                           "not_state_freq,drag_state,cnot_state").split(",")
    for name in names:
        batch, kw_sc, forms = SPECS[name]
        res = {f: [] for f, _ in forms}
        for rnd in range(ROUNDS):
            for fname, kw in forms:
                try:
                    with jax.default_device(jax.devices("cpu")[0]):
                        sc = presets.PRESETS[name](**kw_sc)
                    t0 = time.time()
                    m, _ = run_hostloop_fleet(sc, batch, reps=3, **kw)
                    res[fname].append(m["rollouts_per_s_median"])
                    print(f"[{name:>14s} {fname:>5s} r{rnd}] "
                          f"{m['rollouts_per_s']:.1f} r/s "
                          f"(med {m['rollouts_per_s_median']:.1f}) "
                          f"first={m['first_run_s']}s "
                          f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                          f"fail={m['qp_fail_frac']:.3f} "
                          f"wall={time.time()-t0:.0f}s", flush=True)
                except Exception:
                    print(f"[{name} {fname} r{rnd}] FAIL", flush=True)
                    traceback.print_exc()
        med = {f: float(np.median(v)) for f, v in res.items() if v}
        if med:
            base = med.get(forms[0][0]) or max(med.values())
            for f, v in med.items():
                print(f"== {name} {f}: med {v:.1f} r/s "
                      f"({v/base:.2f}x of {forms[0][0]})", flush=True)
    print("PROBE_R5_PSCAN_DONE", flush=True)


if __name__ == "__main__":
    main()
