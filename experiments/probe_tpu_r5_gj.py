"""TPU probe: hoisted exact Gauss-Jordan K-inverse vs production kernels.

Roofline finding (experiments/logs/r5_roofline.log): the flagship fleet's
steady QP cost is ~45% of the run and almost entirely the small kernel's
FIXED per-solve work (in-kernel scalar-decomposed Gauss-Jordan inverse);
the ADMM iterations are ~1%. The big-kernel wrapper already takes its
K-inverse from XLA - kinv_method='gj' (utils/linalg.gj_inverse) replaces
the NS chain with an O(n)-op exact inverse.

Forms (interleaved within one process, medians across rounds):
  flagship (not_state, B=16384):
    prod    - production small kernel (auto)
    big_gj  - qp_kernel='big' + kinv='gj'
    big_ns  - qp_kernel='big' (NS chain, ns_iters=20) - attribution
  big presets (freq 1024 / drag 2048 / cnot 128 o2): kinv ns vs gj.

Env: PG_PART=flagship|presets|both (default flagship), PG_ROUNDS (2).
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

ROUNDS = int(os.environ.get("PG_ROUNDS", "2"))


def run_forms(name, batch, kw_sc, forms):
    res = {f: [] for f, _ in forms}
    for rnd in range(ROUNDS):
        for fname, kw in forms:
            try:
                with jax.default_device(jax.devices("cpu")[0]):
                    sc = presets.PRESETS[name](**kw_sc)
                t0 = time.time()
                m, _ = run_hostloop_fleet(sc, batch, reps=3, **kw)
                res[fname].append(m["rollouts_per_s_median"])
                print(f"[{name:>14s} {fname:>7s} r{rnd}] "
                      f"{m['rollouts_per_s']:.1f} r/s "
                      f"(med {m['rollouts_per_s_median']:.1f}) "
                      f"first={m['first_run_s']}s "
                      f"fid={m['fidelity_mean']:.5f}/{m['fidelity_min']:.5f} "
                      f"fail={m['qp_fail_frac']:.3f} "
                      f"wall={time.time()-t0:.0f}s", flush=True)
            except Exception:
                print(f"[{name} {fname} r{rnd}] FAIL", flush=True)
                traceback.print_exc()
                return None
    med = {f: float(np.median(v)) for f, v in res.items() if v}
    base = med.get(forms[0][0])
    for f, v in med.items():
        print(f"== {name} {f}: med {v:.1f} r/s ({v/base:.2f}x of "
              f"{forms[0][0]})", flush=True)
    return med


def main():
    print("device:", jax.devices()[0], flush=True)
    part = os.environ.get("PG_PART", "flagship")
    if part in ("flagship", "both"):
        run_forms("not_state", 16384, {}, [
            ("prod", {}),
            ("big_gj", {"qp_kernel": "big", "kinv": "gj"}),
            ("big_ns", {"qp_kernel": "big"}),
        ])
    if part in ("presets", "both"):
        for name, batch, kw_sc in (("not_state_freq", 1024, {}),
                                   ("drag_state", 2048, {}),
                                   ("cnot_state", 128, {"order": 2})):
            run_forms(name, batch, kw_sc, [
                ("ns", {"kinv": "ns"}),
                ("gj", {"kinv": "gj"}),
            ])
    print("PROBE_R5_GJ_DONE", flush=True)


if __name__ == "__main__":
    main()
