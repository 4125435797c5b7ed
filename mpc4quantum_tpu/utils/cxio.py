"""Complex-boundary adapter for TPU backends without complex transfer support.

Empirical backend contract (measured on the axon TPU v5e path, see
tests/test_cxio.py for the CPU-side contract tests): complex64 arithmetic
*inside* a compiled program works (XLA decomposes it to real ops), but
host<->device transfers of complex dtypes raise UNIMPLEMENTED. The adapter
keeps every array crossing the jit boundary real:

    run = cx_jit(fn)          # fn may take/return complex pytrees
    out = run(*args)          # args/outputs cross the boundary as (re, im)
                              # pairs; fn sees ordinary complex arrays

`CxPair` is a registered pytree node, so the splitting composes with
arbitrary nested structures (plant pytrees, MPCResult, model states).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CxPair:
    """A complex array split into real/imaginary parts (both real dtype)."""

    re: jnp.ndarray
    im: jnp.ndarray


def _is_complex_leaf(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating)


def split_cx(tree):
    """Replace complex leaves with CxPair(re, im). Host-safe (numpy in,
    numpy out) and trace-safe."""
    return jax.tree.map(
        lambda x: CxPair(re=np.ascontiguousarray(np.real(x)), im=np.ascontiguousarray(np.imag(x)))
        if isinstance(x, np.ndarray) and np.iscomplexobj(x)
        else (CxPair(re=jnp.real(x), im=jnp.imag(x)) if _is_complex_leaf(x) else x),
        tree,
    )


def merge_cx(tree):
    """Inverse of split_cx. Inside a trace, uses lax.complex; on host numpy
    pairs, builds numpy complex arrays."""

    def merge(x):
        if isinstance(x, CxPair):
            if isinstance(x.re, np.ndarray):
                return np.asarray(x.re) + 1j * np.asarray(x.im)
            return jax.lax.complex(jnp.asarray(x.re), jnp.asarray(x.im))
        return x

    return jax.tree.map(merge, tree, is_leaf=lambda x: isinstance(x, CxPair))


def fetch_cx(tree):
    """Device->host fetch that never transfers a complex array: splits on
    device (cheap real/imag ops), transfers real parts, recombines in numpy."""
    split = jax.tree.map(
        lambda x: CxPair(re=jnp.real(x), im=jnp.imag(x)) if _is_complex_leaf(x) else x,
        tree,
    )
    host = jax.tree.map(np.asarray, split)
    return merge_cx(host)


def cx_jit(fn, **jit_kwargs):
    """jit wrapper with real-only boundary: complex args/results cross as
    CxPair pairs. Complex closure constants inside `fn` are fine - they are
    compiled into the program, not transferred.

    Returns host numpy pytrees (complex leaves reassembled).
    """

    @partial(jax.jit, **jit_kwargs)
    def inner(split_args, split_kwargs):
        args = merge_cx(split_args)
        kwargs = merge_cx(split_kwargs)
        out = fn(*args, **kwargs)
        return jax.tree.map(
            lambda x: CxPair(re=jnp.real(x), im=jnp.imag(x)) if _is_complex_leaf(x) else x,
            out,
        )

    def wrapped(*args, **kwargs):
        out_split = inner(split_cx(args), split_cx(kwargs))
        out_host = jax.tree.map(np.asarray, out_split)
        return merge_cx(out_host)

    wrapped._inner = inner  # for timing without host conversion
    return wrapped
