"""One-shot tunnel condition probe: prints the bench.py device-calibration
numbers (chain ms / dispatch ms) plus a cached flagship-sized matmul-chain
timing. Run before committing a headline bench session - the tunnel's
run-condition spread is ~3x across sessions (CLAUDE.md r3/r4 notes);
chain <= ~0.2 ms and dispatch <= ~0.1 ms marks a fast session.
"""
import sys, time

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

from bench import device_calibration

print("device:", jax.devices()[0], flush=True)
chain_ms, disp_ms = device_calibration()
verdict = "FAST" if chain_ms < 0.5 and disp_ms < 0.3 else (
    "OK" if chain_ms < 5 else "SLOW")
print(f"CALIB chain={chain_ms}ms dispatch={disp_ms}ms -> {verdict}",
      flush=True)
