"""TPU probe: pure-XLA QP path (GJ inverse, no Pallas QP call) vs the
production small kernel at the flagship knee, plus the cnot reruns the
r5_gj tunnel error swallowed.

r5_gj finding: big_gj == prod small kernel (11.8k r/s both; big_ns 6.3k)
- hoisting the inverse killed the NS chain but the small kernel was
already paying the same fixed cost elsewhere, i.e. the pallas call /
layout packing itself. The next split: drop the kernel entirely and let
XLA fuse the (B, 10, 10) ADMM chain into the step program.

Forms (interleaved, medians across rounds) at not_state B=16384:
  prod      - production (pallas small kernel)
  xqp_gj    - qp_impl='xla', kinv='gj' (plant stays pallas)
  xqp_gj_xp - qp_impl='xla', plant_impl='xla', kinv='gj' (fully fused)
Then: cnot_state o2 at 128: ns vs gj (the r5_gj rerun).

Env: PX_PART=flagship|cnot|both (default both), PX_ROUNDS (2).
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

ROUNDS = int(os.environ.get("PX_ROUNDS", "2"))


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
                print(f"[{name:>14s} {fname:>10s} r{rnd}] "
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
            print(f"== {name} {f}: med {v:.1f} r/s ({v/base:.2f}x of "
                  f"{forms[0][0]})", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    part = os.environ.get("PX_PART", "both")
    if part in ("flagship", "both"):
        run_forms("not_state", 16384, {}, [
            ("prod", {}),
            ("xqp_gj", {"qp_impl": "xla", "kinv": "gj"}),
            ("xqp_gj_xp", {"qp_impl": "xla", "plant_impl": "xla",
                           "kinv": "gj"}),
        ])
    if part in ("cnot", "both"):
        run_forms("cnot_state", 128, {"order": 2}, [
            ("ns", {"kinv": "ns"}),
            ("gj", {"kinv": "gj"}),
        ])
    print("PROBE_R5_XLAQP_DONE", flush=True)


if __name__ == "__main__":
    main()
