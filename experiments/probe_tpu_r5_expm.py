"""TPU probe: norm-bound auto expm budget vs the conservative defaults.

Roofline (experiments/logs/r5_roofline.log): the plant expm is ~19% of the
flagship rollout. The defaults are sized for ANY norm: the Pallas plant
kernel runs an 18-term Horner Taylor + norm/scale + 12 masked squarings
(a ~30-matmul serial chain on a latency-bound path); the XLA taylor steps
run 16 + 4. benchfleet's auto budget computes the worst-case
||dt*G(u)||_1 over the control box host-side at fleet build and runs the
shortest still-exact chain (flagship: 12 + 0; exactness certified in x64 by
experiments/sweep_expm_budget.py at 1e-16..8e-16 vs Pade).

Forms (interleaved within one process, medians across rounds - CLAUDE.md
round-4 drift methodology): expm_budget="auto" vs "off" per preset, on the
expm-share-heavy presets (flagship not_state B=16384, lindblad 8192,
drag 2048). freq/cnot are QP-chain-bound (roofline) - not probed.

Env: PE_PART=flagship|rest|both (default both), PE_ROUNDS (2).
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

ROUNDS = int(os.environ.get("PE_ROUNDS", "2"))


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
                return None
    med = {f: float(np.median(v)) for f, v in res.items() if v}
    base = med.get(forms[0][0])
    for f, v in med.items():
        print(f"== {name} {f}: med {v:.1f} r/s ({v/base:.2f}x of "
              f"{forms[0][0]})", flush=True)
    return med


def main():
    print("device:", jax.devices()[0], flush=True)
    part = os.environ.get("PE_PART", "both")
    forms = [("off", {"expm_budget": "off"}), ("auto", {})]
    if part in ("flagship", "both"):
        run_forms("not_state", 16384, {}, forms)
    if part in ("rest", "both"):
        run_forms("lindblad_state", 8192, {}, forms)
        run_forms("drag_state", 2048, {}, forms)


if __name__ == "__main__":
    main()
