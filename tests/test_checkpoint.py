"""Checkpoint/resume + profiling utilities."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from mpc4quantum_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint, ModelHistory
from mpc4quantum_tpu.utils.profiling import time_fn, mpc_throughput
from mpc4quantum_tpu.models.dmdc import online_from_bootstrap, online_fit_iteration


def test_checkpoint_roundtrip_complex_pytree():
    m = online_from_bootstrap(jnp.asarray(np.random.randn(3, 5) + 1j * np.random.randn(3, 5)),
                              3, 3, 2, alpha=10.0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, m)
        m2 = restore_checkpoint(path, jax.tree.map(jnp.zeros_like, m))
    np.testing.assert_allclose(np.asarray(m2.A), np.asarray(m.A), atol=1e-12)
    np.testing.assert_allclose(np.asarray(m2.P), np.asarray(m.P), atol=1e-12)
    assert m2.dim_x == m.dim_x


def test_model_history_cadence():
    m = online_from_bootstrap(jnp.zeros((2, 4)), 2, 2, 2)
    hist = ModelHistory(every=3)
    for i in range(10):
        m = online_fit_iteration(m, jnp.ones(2) * i, jnp.ones(2), jnp.ones(2))
        hist.record(m)
    assert len(hist) == 3  # at counts 3, 6, 9
    assert isinstance(np.asarray(hist.snapshots[0].A), np.ndarray)


def test_time_fn_reports():
    f = jax.jit(lambda x: x @ x)
    t = time_fn(f, jnp.eye(16), reps=2, name="mm")
    assert t.best_s > 0 and t.compile_s >= t.best_s * 0  # sane fields
    assert t.per_second(100) > 0
