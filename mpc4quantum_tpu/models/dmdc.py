"""DMDc model family as immutable pytrees with pure functional updates.

Three forms, mirroring the reference capability set (reference model.py):
  - `DMDcModel`: read-only container over the stacked operator
    A (dim_y, dim_x + dim_u_lifted); predict / get_discrete views
    (reference model.py:7-103).
  - `DiscrepDMDc`: offline pinv fit + streaming discrepancy corrections over
    a *fixed-capacity* snapshot buffer (reference model.py:109-213 grows
    python lists; here zero-padded columns + a count give fixed shapes, which
    is exact for the pinv because zero-padded columns of [Z | 0] contribute
    nothing: pinv([Z|0]) = [pinv(Z); 0]).
  - `OnlineDMDc`: rank-1 recursive-least-squares update (Zhang et al., as in
    reference model.py:216-313) - the jit-native in-loop form.

Discount semantics follow reference model.py:27: a forgetting half-life of k
iterations corresponds to discount 2^(-1/k).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# Read-only DMDc container
# ---------------------------------------------------------------------------


@struct.dataclass
class DMDcModel:
    """y = A_x x + A_u u with A = [A_x | A_u] (reference model.py:7-103)."""

    A: jnp.ndarray  # (dim_y, dim_x + dim_u)
    dim_y: int = struct.field(pytree_node=False)
    dim_x: int = struct.field(pytree_node=False)
    dim_u: int = struct.field(pytree_node=False)
    discount: float = 1.0
    rcond: float = 1e-15


def dmdc_from_operator(A0, dim_y: int, dim_x: int, dim_u: int, **kw) -> DMDcModel:
    return DMDcModel(A=jnp.asarray(A0), dim_y=dim_y, dim_x=dim_x, dim_u=dim_u, **kw)


def get_discrete(model):
    """(A_x, A_u) views (reference model.py:95-103)."""
    return model.A[: model.dim_y, : model.dim_x], model.A[: model.dim_y, model.dim_x :]


def predict(model, x, u):
    """Predict y from x (dim_x, n) and u (dim_u, n) (reference model.py:81-93).

    Mixed real/complex products go through cx_mm (no real->complex convert
    feeding a dot - unimplemented batched lowering on the axon TPU)."""
    from ..utils.linalg import cx_mm

    x = x.reshape(model.dim_x, -1)
    u = u.reshape(model.dim_u, -1)
    A_x, A_u = get_discrete(model)
    return cx_mm(A_x, x) + cx_mm(A_u, u)


# ---------------------------------------------------------------------------
# Offline / discrepancy DMDc
# ---------------------------------------------------------------------------


@struct.dataclass
class DiscrepDMDc:
    """Discrepancy-corrected DMDc with a fixed-capacity snapshot buffer."""

    A: jnp.ndarray  # (dim_y, dim_x + dim_u)
    Y: jnp.ndarray  # (dim_y, capacity) zero-padded right-aligned history
    X: jnp.ndarray  # (dim_x, capacity)
    U: jnp.ndarray  # (dim_u, capacity)
    count: jnp.ndarray  # () int, number of valid columns (<= capacity)
    dim_y: int = struct.field(pytree_node=False)
    dim_x: int = struct.field(pytree_node=False)
    dim_u: int = struct.field(pytree_node=False)
    capacity: int = struct.field(pytree_node=False)
    discount: float = 1.0
    rcond: float = 1e-15

    @property
    def min_rank(self) -> int:
        # rank gate before applying discrepancy corrections
        # (reference model.py:195)
        return self.dim_x


def _as_model(d: DiscrepDMDc) -> DMDcModel:
    return DMDcModel(A=d.A, dim_y=d.dim_y, dim_x=d.dim_x, dim_u=d.dim_u)


def discrep_from_data(Y, X, U=None, rcond=1e-15, capacity: int | None = None, discount=1.0) -> DiscrepDMDc:
    """Offline fit A0 = Y pinv([X; U], rcond) (reference model.py:157-179).

    rcond semantics match numpy: singular values <= rcond * s_max are zeroed.
    """
    Y = jnp.asarray(Y)
    X = jnp.asarray(X)
    dim_y, n = Y.shape
    dim_x = X.shape[0]
    if U is None:
        dim_u = 0
        Z = X
        U = jnp.zeros((0, n), dtype=X.dtype)
    else:
        U = jnp.asarray(U)
        dim_u = U.shape[0]
        Z = jnp.concatenate([X, U.astype(X.dtype)], axis=0)
    A0 = Y @ jnp.linalg.pinv(Z, rtol=rcond)
    cap = n if capacity is None else capacity
    pad = lambda M, d: jnp.zeros((d, cap), M.dtype).at[:, max(cap - n, 0) :].set(M[:, max(n - cap, 0) :])
    return DiscrepDMDc(
        A=A0, Y=pad(Y, dim_y), X=pad(X, dim_x), U=pad(U, dim_u),
        count=jnp.asarray(min(n, cap)),
        dim_y=dim_y, dim_x=dim_x, dim_u=dim_u, capacity=cap,
        discount=discount, rcond=rcond,
    )


def discrep_from_randn(key, dim_y, dim_x, dim_u, sigma, capacity, discount=1.0, rcond=1e-15,
                       dtype=jnp.float64) -> DiscrepDMDc:
    """Bootstrap from a random-normal operator of scale sigma
    (reference model.py:137-149)."""
    A0 = sigma * jax.random.normal(key, (dim_y, dim_x + dim_u)).astype(dtype)
    return discrep_bootstrap(A0, dim_y, dim_x, dim_u, capacity, discount=discount, rcond=rcond)


def discrep_append(d: DiscrepDMDc, Y, X, U) -> DiscrepDMDc:
    """Bulk-load snapshot columns without refitting (reference
    model.py:209-213): columns enter undiscounted on the right of the
    fixed-capacity buffers."""
    Y = jnp.asarray(Y, d.Y.dtype)
    X = jnp.asarray(X, d.X.dtype)
    U = jnp.asarray(U, d.U.dtype) if d.dim_u else d.U[:, :0]
    n = Y.shape[1]
    shift = lambda buf, M: jnp.roll(buf, -n, axis=1).at[:, -n:].set(M[:, -min(n, buf.shape[1]):])
    return d.replace(
        Y=shift(d.Y, Y), X=shift(d.X, X),
        U=shift(d.U, U) if d.dim_u else d.U,
        count=jnp.minimum(d.count + n, d.capacity),
    )


def online_from_data(Y, X, U=None, discount=1.0) -> "OnlineDMDc":
    """Batch initialization P0 = pinv(Z Z^T), A0 = Y Z^T P0
    (reference model.py:281-293). Assumes full-rank, well-conditioned data."""
    Y = jnp.asarray(Y)
    X = jnp.asarray(X)
    dim_y = Y.shape[0]
    dim_x = X.shape[0]
    if U is None:
        dim_u = 0
        Z = X
    else:
        U = jnp.asarray(U)
        dim_u = U.shape[0]
        Z = jnp.concatenate([X, U.astype(X.dtype)], axis=0)
    # plain transpose (not conjugate), matching the RLS recursion's
    # convention in fit_iteration and the reference (model.py:291-292)
    P0 = jnp.linalg.pinv(Z @ Z.T)
    A0 = Y @ Z.T @ P0
    return OnlineDMDc(A=A0, P=P0, dim_y=dim_y, dim_x=dim_x, dim_u=dim_u, discount=discount)


def discrep_bootstrap(A0, dim_y, dim_x, dim_u, capacity, discount=1.0, rcond=1e-15, dtype=None) -> DiscrepDMDc:
    """Bootstrap from an initial operator with an empty buffer
    (reference model.py:150-156)."""
    A0 = jnp.asarray(A0)
    dtype = dtype or A0.dtype
    return DiscrepDMDc(
        A=A0,
        Y=jnp.zeros((dim_y, capacity), dtype),
        X=jnp.zeros((dim_x, capacity), dtype),
        U=jnp.zeros((dim_u, capacity), dtype),
        count=jnp.asarray(0),
        dim_y=dim_y, dim_x=dim_x, dim_u=dim_u, capacity=capacity,
        discount=discount, rcond=rcond,
    )


def _shift_in(buf, col, discount):
    """Append a column on the right, discounting history, dropping the oldest
    if at capacity (reference model.py:181-191 semantics on a ring)."""
    rolled = jnp.roll(buf * discount, -1, axis=1)
    return rolled.at[:, -1].set(col.reshape(-1))


def discrep_fit_iteration(d: DiscrepDMDc, next_y, next_x, next_u) -> DiscrepDMDc:
    """Streaming discrepancy update (reference model.py:186-207).

    Appends the new snapshot, then - if the state history has rank >= dim_x -
    adds the correction A += (Y - A Z) pinv(Z). Fixed shapes throughout: the
    rank gate becomes a `where` on the correction.
    """
    Y = _shift_in(d.Y, jnp.asarray(next_y, d.Y.dtype), d.discount)
    X = _shift_in(d.X, jnp.asarray(next_x, d.X.dtype), d.discount)
    U = _shift_in(d.U, jnp.asarray(next_u, d.U.dtype), d.discount) if d.dim_u else d.U
    count = jnp.minimum(d.count + 1, d.capacity)

    Z = jnp.concatenate([X, U], axis=0)
    svals = jnp.linalg.svd(X, compute_uv=False)
    tol = jnp.max(svals) * max(X.shape) * jnp.finfo(svals.dtype).eps
    rank = jnp.sum(svals > tol)

    model = DMDcModel(A=d.A, dim_y=d.dim_y, dim_x=d.dim_x, dim_u=d.dim_u)
    resid = Y - predict(model, X, U)
    A1 = resid @ jnp.linalg.pinv(Z, rtol=d.rcond)
    A_new = jnp.where(rank >= d.min_rank, d.A + A1, d.A)
    return d.replace(A=A_new, Y=Y, X=X, U=U, count=count)


# ---------------------------------------------------------------------------
# Online (RLS) DMDc
# ---------------------------------------------------------------------------


@struct.dataclass
class OnlineDMDc:
    """Recursive-least-squares DMDc (reference model.py:216-313)."""

    A: jnp.ndarray  # (dim_y, dim_z)
    P: jnp.ndarray  # (dim_z, dim_z) inverse-covariance proxy
    dim_y: int = struct.field(pytree_node=False)
    dim_x: int = struct.field(pytree_node=False)
    dim_u: int = struct.field(pytree_node=False)
    discount: float = 1.0


def online_from_bootstrap(A0, dim_y, dim_x, dim_u, alpha=1e2, discount=1.0) -> OnlineDMDc:
    """P0 = alpha I (reference model.py:276-279)."""
    A0 = jnp.asarray(A0)
    dim_z = dim_x + dim_u
    return OnlineDMDc(A=A0, P=alpha * jnp.eye(dim_z, dtype=A0.dtype),
                      dim_y=dim_y, dim_x=dim_x, dim_u=dim_u, discount=discount)


def online_from_randn(key, dim_y, dim_x, dim_u, sigma=1.0, alpha=1e2, discount=1.0, dtype=jnp.float64) -> OnlineDMDc:
    """Random-normal bootstrap (reference model.py:241-260)."""
    dim_z = dim_x + dim_u
    A0 = sigma * jax.random.normal(key, (dim_y, dim_z), dtype=jnp.float64).astype(dtype)
    return OnlineDMDc(A=A0, P=alpha * jnp.eye(dim_z, dtype=dtype),
                      dim_y=dim_y, dim_x=dim_x, dim_u=dim_u, discount=discount)


# ---------------------------------------------------------------------------
# In-scan snapshot history (reference iA/_isave parity)
# ---------------------------------------------------------------------------


@struct.dataclass
class HistoryState:
    """Model state wrapped with a fixed-capacity in-carry snapshot ring.

    The reference records `iA` operator snapshots - and, for OnlineDMDc, the
    RLS covariance `iP` - every `_isave=10` fit iterations into python lists
    (reference model.py:132-135, 201-204, 308-310) - impossible inside
    `lax.scan`. Here the ring buffer `buf` lives in the scan carry: slot
    writes are one-hot multiply-adds (no scatter - complex scatter is
    unimplemented on some TPU backend paths), so streaming updates inside the
    driver are observable afterwards. `buf[0]` is the initial operator
    (reference `iA = [A0]`). When the wrapped model exposes `.P` (OnlineDMDc),
    `pbuf` rings the RLS state on the same cadence (reference `iP`).
    """

    inner: object            # the wrapped model pytree (must expose .A)
    buf: jnp.ndarray         # (n_slots, dim_y, dim_z) snapshot ring
    n_recorded: jnp.ndarray  # () int32: total snapshots taken (may exceed n_slots)
    it: jnp.ndarray          # () int32: fit iterations seen
    pbuf: object = None      # (n_slots, dim_z, dim_z) RLS-P ring, or None
    every: int = struct.field(pytree_node=False, default=10)

    @property
    def A(self):
        return self.inner.A


def with_history(model_state, n_slots: int, every: int = 10) -> HistoryState:
    """Wrap a model state so streaming updates record `A` snapshots (and `P`
    snapshots, when the model has an RLS state) in-carry.

    Use with `history_update(update_fn)` as the driver's `model_update_fn`.
    """
    if n_slots < 2:
        raise ValueError(
            f"n_slots={n_slots}: need >= 2 (slot 0 permanently holds A0, the "
            "remaining slots ring the cadenced snapshots - with one slot the "
            "ring is empty and the slot arithmetic divides by zero)")

    def ring0(M0):
        buf = jnp.zeros((n_slots,) + M0.shape, M0.dtype)
        return jnp.concatenate([M0[None], buf[1:]], axis=0)  # i* = [M0]

    pbuf = ring0(model_state.P) if hasattr(model_state, "P") else None
    return HistoryState(inner=model_state, buf=ring0(model_state.A), pbuf=pbuf,
                        n_recorded=jnp.asarray(1, jnp.int32),
                        it=jnp.asarray(0, jnp.int32), every=every)


def history_update(update_fn):
    """Lift a model update (state, y, x, u) -> state to HistoryState."""

    def fn(h: HistoryState, next_y, next_x, next_u) -> HistoryState:
        inner = update_fn(h.inner, next_y, next_x, next_u)
        it = h.it + 1
        take = (it % h.every) == 0
        n_slots = h.buf.shape[0]
        # slot 0 holds A0 permanently; writes k = 1, 2, ... ring over the
        # remaining n_slots-1 slots: slot(k) = 1 + (k-1) % (n_slots-1)
        slot = 1 + jnp.mod(h.n_recorded - 1, n_slots - 1)

        def write(buf, M):
            sel = jnp.where(take, (jnp.arange(n_slots) == slot).astype(buf.real.dtype), 0.0)
            sel = sel.reshape((n_slots,) + (1,) * (buf.ndim - 1))
            return buf * (1.0 - sel) + sel * M[None]

        pbuf = write(h.pbuf, inner.P) if h.pbuf is not None else None
        return h.replace(inner=inner, buf=write(h.buf, inner.A), pbuf=pbuf,
                         it=it, n_recorded=h.n_recorded + take.astype(jnp.int32))

    return fn


def _ring_read(buf, n):
    """The surviving writes of a slot-0-pinned ring, chronological order."""
    import numpy as np

    n_slots = buf.shape[0]
    buf = np.asarray(buf)
    if n <= n_slots:
        return [buf[i] for i in range(n)]
    # ring wrapped: the surviving writes are slot 0's and the last n_slots-1;
    # write k (k >= 1) lives at slot 1 + (k-1) % (n_slots-1)
    ks = range(n - (n_slots - 1), n)
    return [buf[0]] + [buf[1 + (k - 1) % (n_slots - 1)] for k in ks]


def history_snapshots(h: HistoryState):
    """Host-side: the recorded `A` snapshots in chronological order (numpy
    list; reference `iA`). If the ring wrapped, the oldest snapshots beyond
    capacity are gone; `buf[0]` (the initial A0) is always kept."""
    return _ring_read(h.buf, int(h.n_recorded))


def history_p_snapshots(h: HistoryState):
    """Host-side: the recorded RLS `P` snapshots in chronological order
    (reference `iP`, model.py:308-310). Same cadence/wrap semantics as
    `history_snapshots`; requires the wrapped model to expose `.P`."""
    if h.pbuf is None:
        raise ValueError("wrapped model has no RLS state P (pbuf is None); "
                         "iP history exists only for OnlineDMDc-style models")
    return _ring_read(h.pbuf, int(h.n_recorded))


def online_fit_iteration(m: OnlineDMDc, next_y, next_x, next_u) -> OnlineDMDc:
    """Rank-1 RLS update (reference model.py:295-313):
        gamma = 1/(1 + z^T P z); A += gamma (y - A z) (P z)^T;
        P = (P - gamma (P z)(P z)^T) / discount.
    """
    y = jnp.asarray(next_y, m.A.dtype).reshape(-1, 1)
    z = jnp.concatenate(
        [jnp.asarray(next_x, m.A.dtype).reshape(-1, 1),
         jnp.asarray(next_u, m.A.dtype).reshape(-1, 1)], axis=0
    )
    Az = m.A @ z
    Pz = m.P @ z
    gamma = 1.0 / (1.0 + (z.T @ Pz)[0, 0])
    A_new = m.A + gamma * (y - Az) @ Pz.T
    P_new = (m.P - gamma * Pz @ Pz.T) / m.discount
    return m.replace(A=A_new, P=P_new)
