"""Complex-boundary adapter contract tests (the TPU backend's transfer
limitation is documented in utils/cxio.py; these verify the adapter's
semantics on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg

from mpc4quantum_tpu.utils.cxio import CxPair, split_cx, merge_cx, cx_jit
from mpc4quantum_tpu.ops.expm import expm_pade


def test_split_merge_roundtrip_nested():
    tree = {
        "a": np.arange(4.0),
        "b": (np.arange(3) + 1j * np.ones(3), [np.float32(2.0)]),
        "c": {"d": (np.random.randn(2, 2) + 1j * np.random.randn(2, 2))},
    }
    split = split_cx(tree)
    # complex leaves replaced by pairs
    assert isinstance(split["b"][0], CxPair)
    assert isinstance(split["c"]["d"], CxPair)
    merged = merge_cx(split)
    np.testing.assert_allclose(merged["b"][0], tree["b"][0])
    np.testing.assert_allclose(merged["c"]["d"], tree["c"]["d"])
    np.testing.assert_allclose(merged["a"], tree["a"])


def test_cx_jit_executes_complex_fn_with_real_boundary():
    A = np.random.randn(4, 4) + 1j * np.random.randn(4, 4)
    x = np.random.randn(4) + 1j * np.random.randn(4)

    def fn(A, x):
        y = A @ x
        return {"y": y, "norm": jnp.real(jnp.vdot(y, y))}

    out = cx_jit(fn)(A, x)
    np.testing.assert_allclose(out["y"], A @ x, atol=1e-12)
    np.testing.assert_allclose(out["norm"], np.real(np.vdot(A @ x, A @ x)), atol=1e-10)
    # outputs are host numpy, not device arrays
    assert isinstance(out["y"], np.ndarray)


def test_cx_jit_handles_pure_real_functions():
    out = cx_jit(lambda a, b: a + b)(np.ones(3), np.ones(3) * 2)
    np.testing.assert_allclose(out, 3.0)


def test_expm_complex_uses_real_embedded_solve():
    # the solve inside expm routes complex systems through the real block
    # embedding; verify numerical equality with scipy on complex input
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 5)) + 1j * rng.normal(size=(5, 5))
    out = np.asarray(expm_pade(jnp.asarray(A)))
    np.testing.assert_allclose(out, scipy.linalg.expm(A), atol=1e-9)
