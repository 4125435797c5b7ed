"""Multi-host device mesh setup and scaling harness.

Single-controller JAX across hosts: `init_distributed` wires
jax.distributed, `fleet_mesh` builds the (hosts x chips) mesh whose flattened
scenario axis the fleet shards over. Rollouts are embarrassingly parallel, so
all traffic inside a slice rides ICI and the only DCN crossings are the
summary collectives (psum of fidelity/cost means in fleet_summary) - the
layout recommended in SURVEY.md section 2.4/5.8.

`scaling_report` measures scaling efficiency at 1..N devices (on hardware or
on a virtual CPU mesh via xla_force_host_platform_device_count) - the
>= 80% @ N hosts target of BASELINE.json.
"""

from __future__ import annotations

import time
from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed for multi-host runs. No-op when single
    process (coordinator None and env unset)."""
    if coordinator is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def fleet_mesh(axis_name: str = "scenarios", devices: Sequence | None = None) -> Mesh:
    """1-D global mesh over all addressable devices (all hosts)."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def scaling_report(run_shard_fn, batch_per_device: int, device_counts: Sequence[int],
                   reps: int = 2) -> list[dict]:
    """Weak-scaling efficiency: run `run_shard_fn(mesh, total_batch)` at each
    device count with batch_per_device scenarios per device.

    :param run_shard_fn: (mesh, batch) -> outputs; must block on results.
    :return: list of {devices, batch, best_s, per_device_throughput,
        efficiency} (efficiency relative to the 1-device run).
    """
    rows = []
    base = None
    for n_dev in device_counts:
        mesh = fleet_mesh(devices=jax.devices()[:n_dev])
        batch = batch_per_device * n_dev
        run_shard_fn(mesh, batch)  # compile + warmup
        times = []
        for _ in range(reps):
            t0 = time.time()
            run_shard_fn(mesh, batch)
            times.append(time.time() - t0)
        best = min(times)
        thr = batch / best / n_dev
        if base is None:
            base = thr
        rows.append({
            "devices": n_dev,
            "batch": batch,
            "best_s": best,
            "per_device_throughput": thr,
            "efficiency": thr / base,
        })
    return rows
