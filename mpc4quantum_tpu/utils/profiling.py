"""Profiling and throughput observability.

The reference's only instrumentation is a tqdm bar (reference mpc.py:161).
Here: wall-clock timing with device synchronization, solves/s counters (the
north-star metric), and an optional jax.profiler trace context for TPU
timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class Timing:
    name: str
    compile_s: float
    best_s: float
    times: list = field(default_factory=list)

    def per_second(self, items: int) -> float:
        return items / self.best_s


def time_fn(fn, *args, reps: int = 3, name: str = "fn") -> Timing:
    """Time a (jitted) function with block_until_ready synchronization.
    The first call (compile + warmup) is reported separately."""
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    return Timing(name=name, compile_s=compile_s, best_s=min(times), times=times)


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def mpc_throughput(result, elapsed_s: float) -> dict:
    """Solves/s counters from an MPCResult batch.

    qp_solves counts every inner SQP iteration (each is one condensed QP
    solve); rollouts counts completed scenario rollouts.
    """
    import numpy as np

    iters = np.asarray(result.sqp_iters)
    n_roll = int(np.prod(iters.shape[:-1])) if iters.ndim > 1 else 1
    total_qp = float(iters.sum())
    return {
        "rollouts_per_s": n_roll / elapsed_s,
        "qp_solves_per_s": total_qp / elapsed_s,
        "mean_sqp_iters": float(iters.mean()),
    }
