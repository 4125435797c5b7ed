"""DMDc model family oracles: pinv fit vs numpy lstsq, RLS convergence to the
batch solution, discrepancy streaming vs a plain-numpy reimplementation of the
reference semantics, and the rcond-sweep trainer recovering a known model."""

import numpy as np
import jax
import jax.numpy as jnp

from mpc4quantum_tpu.models.dmdc import (
    dmdc_from_operator,
    get_discrete,
    predict,
    discrep_from_data,
    discrep_bootstrap,
    discrep_fit_iteration,
    online_from_bootstrap,
    online_fit_iteration,
)
from mpc4quantum_tpu.models.training import train_model, prediction_loss
from mpc4quantum_tpu.ops.library import control_powers, lift_controls, krtimes


def make_linear_system(rng, dim_x=4, dim_u=2, n=60):
    A_true = rng.normal(size=(dim_x, dim_x)) * 0.3 + np.eye(dim_x) * 0.7
    B_true = rng.normal(size=(dim_x, dim_u)) * 0.5
    X = rng.normal(size=(dim_x, n))
    U = rng.normal(size=(dim_u, n))
    Y = A_true @ X + B_true @ U
    return A_true, B_true, X, U, Y


def test_predict_and_views():
    rng = np.random.default_rng(0)
    A_true, B_true, X, U, Y = make_linear_system(rng)
    A0 = np.hstack([A_true, B_true])
    model = dmdc_from_operator(jnp.asarray(A0), 4, 4, 2)
    A_x, A_u = get_discrete(model)
    np.testing.assert_allclose(np.asarray(A_x), A_true)
    np.testing.assert_allclose(np.asarray(A_u), B_true)
    np.testing.assert_allclose(np.asarray(predict(model, jnp.asarray(X), jnp.asarray(U))), Y, atol=1e-12)


def test_discrep_from_data_recovers_operator():
    rng = np.random.default_rng(1)
    A_true, B_true, X, U, Y = make_linear_system(rng)
    d = discrep_from_data(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(U), rcond=1e-10)
    np.testing.assert_allclose(np.asarray(d.A), np.hstack([A_true, B_true]), atol=1e-8)


def test_discrep_rcond_truncation():
    # rank-deficient data: large rcond must regularize (match numpy pinv)
    rng = np.random.default_rng(2)
    X = rng.normal(size=(4, 30))
    X[3] = X[0]  # collinear row -> ill-conditioned Z
    Y = rng.normal(size=(4, 30))
    for rcond in (1e-12, 1e-2):
        d = discrep_from_data(jnp.asarray(Y), jnp.asarray(X), None, rcond=rcond)
        A_np = Y @ np.linalg.pinv(X, rcond=rcond)
        np.testing.assert_allclose(np.asarray(d.A), A_np, atol=1e-8)


def test_discrep_fit_iteration_matches_reference_semantics():
    # plain-numpy reimplementation of reference model.py:186-207 as oracle
    rng = np.random.default_rng(3)
    dim_x, dim_u = 3, 2
    A0 = rng.normal(size=(dim_x, dim_x + dim_u))
    cap = 12
    d = discrep_bootstrap(jnp.asarray(A0), dim_x, dim_x, dim_u, capacity=cap, rcond=1e-12)

    Y_hist, X_hist, U_hist = None, None, None
    A_ref = A0.copy()
    discount = 1.0
    for it in range(8):
        x = rng.normal(size=dim_x)
        u = rng.normal(size=dim_u)
        y = rng.normal(size=dim_x)
        d = discrep_fit_iteration(d, jnp.asarray(y), jnp.asarray(x), jnp.asarray(u))

        stack = lambda v, S: v.reshape(-1, 1) if S is None else np.hstack([discount * S, v.reshape(-1, 1)])
        Y_hist, X_hist, U_hist = stack(y, Y_hist), stack(x, X_hist), stack(u, U_hist)
        if np.linalg.matrix_rank(X_hist) >= dim_x:
            Z = np.vstack([X_hist, U_hist])
            pred = A_ref[:, :dim_x] @ X_hist + A_ref[:, dim_x:] @ U_hist
            A_ref = A_ref + (Y_hist - pred) @ np.linalg.pinv(Z, rcond=1e-12)
        np.testing.assert_allclose(np.asarray(d.A), A_ref, atol=1e-7, err_msg=f"iter {it}")


def test_online_rls_converges_to_batch_fit():
    rng = np.random.default_rng(4)
    A_true, B_true, X, U, Y = make_linear_system(rng, n=200)
    m = online_from_bootstrap(jnp.zeros((4, 6)), 4, 4, 2, alpha=1e3)
    for t in range(200):
        m = online_fit_iteration(m, jnp.asarray(Y[:, t]), jnp.asarray(X[:, t]), jnp.asarray(U[:, t]))
    np.testing.assert_allclose(np.asarray(m.A), np.hstack([A_true, B_true]), atol=1e-2)


def test_online_rls_jits_and_scans():
    rng = np.random.default_rng(5)
    A_true, B_true, X, U, Y = make_linear_system(rng, n=100)
    m0 = online_from_bootstrap(jnp.zeros((4, 6)), 4, 4, 2, alpha=1e3)

    def step(m, data):
        y, x, u = data
        return online_fit_iteration(m, y, x, u), None

    m_scan, _ = jax.lax.scan(step, m0, (jnp.asarray(Y.T), jnp.asarray(X.T), jnp.asarray(U.T)))
    m_loop = m0
    for t in range(100):
        m_loop = online_fit_iteration(m_loop, jnp.asarray(Y[:, t]), jnp.asarray(X[:, t]), jnp.asarray(U[:, t]))
    np.testing.assert_allclose(np.asarray(m_scan.A), np.asarray(m_loop.A), atol=1e-10)


def test_train_model_recovers_bilinear_model():
    # Generate data from a known bilinear model and verify the sweep trainer
    # selects a model with near-zero rollout loss.
    rng = np.random.default_rng(6)
    order, dim_u, dim_x = 2, 1, 4
    powers = control_powers(order, dim_u)[1:]
    Lm = powers.shape[0]
    A_x = np.eye(dim_x) + 0.05 * rng.normal(size=(dim_x, dim_x))
    A_u = 0.1 * rng.normal(size=(dim_x, Lm * dim_x))
    n = 80
    us = rng.normal(size=(dim_u, n))
    UL = np.asarray(lift_controls(jnp.asarray(us), powers))
    X = np.zeros((dim_x, n + 1))
    X[:, 0] = rng.normal(size=dim_x)
    for t in range(n):
        ux = np.asarray(krtimes(jnp.asarray(UL[:, t : t + 1]), jnp.asarray(X[:, t : t + 1])))[:, 0]
        X[:, t + 1] = A_x @ X[:, t] + A_u @ ux
    X2, X1, UL1 = X[:, 1:], X[:, :-1], UL
    model, best_rcond, losses = train_model(jnp.asarray(X2), jnp.asarray(X1), jnp.asarray(UL1))
    assert float(jnp.min(jnp.asarray(losses))) < 1e-4
    loss_best = prediction_loss(model.A, dim_x, jnp.asarray(X2), jnp.asarray(X1), jnp.asarray(UL1))
    assert float(loss_best) < 1e-4


def test_online_from_data_matches_reference_formula():
    from mpc4quantum_tpu.models.dmdc import online_from_data
    rng = np.random.default_rng(7)
    A_true, B_true, X, U, Y = make_linear_system(rng, n=80)
    m = online_from_data(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(U))
    np.testing.assert_allclose(np.asarray(m.A), np.hstack([A_true, B_true]), atol=1e-8)
    Z = np.vstack([X, U])
    np.testing.assert_allclose(np.asarray(m.P), np.linalg.pinv(Z @ Z.T), atol=1e-8)
    # and the RLS recursion continues consistently from it
    y, x, u = rng.normal(size=4), rng.normal(size=4), rng.normal(size=2)
    m2 = online_fit_iteration(m, jnp.asarray(y), jnp.asarray(x), jnp.asarray(u))
    assert np.isfinite(np.asarray(m2.A)).all()


def test_discrep_append_bulk_load():
    from mpc4quantum_tpu.models.dmdc import discrep_append
    rng = np.random.default_rng(8)
    d = discrep_bootstrap(jnp.zeros((3, 5)), 3, 3, 2, capacity=6)
    Y = rng.normal(size=(3, 4)); X = rng.normal(size=(3, 4)); U = rng.normal(size=(2, 4))
    d = discrep_append(d, Y, X, U)
    assert int(d.count) == 4
    np.testing.assert_allclose(np.asarray(d.Y)[:, -4:], Y)
    np.testing.assert_allclose(np.asarray(d.X)[:, -4:], X)
    # appending beyond capacity keeps the newest columns
    Y2 = rng.normal(size=(3, 4))
    d = discrep_append(d, Y2, rng.normal(size=(3, 4)), rng.normal(size=(2, 4)))
    assert int(d.count) == 6
    np.testing.assert_allclose(np.asarray(d.Y)[:, -4:], Y2)
    np.testing.assert_allclose(np.asarray(d.Y)[:, :2], Y[:, -2:])


def test_discrep_from_randn():
    from mpc4quantum_tpu.models.dmdc import discrep_from_randn
    d = discrep_from_randn(jax.random.PRNGKey(0), 3, 3, 2, sigma=0.5, capacity=8)
    A = np.asarray(d.A)
    assert A.shape == (3, 5) and 0.05 < A.std() < 2.0
    assert int(d.count) == 0


# ---------------------------------------------------------------------------
# In-scan snapshot history (reference iA/_isave parity, model.py:132-135,
# 201-204)
# ---------------------------------------------------------------------------


def test_history_cadence_matches_reference():
    """with_history + history_update records A every `every` fit iterations,
    starting from iA = [A0] - the reference's snapshot semantics - and the
    recording works identically inside lax.scan."""
    from mpc4quantum_tpu.models.dmdc import with_history, history_update, history_snapshots

    rng = np.random.default_rng(3)
    A_true, B_true, X, U, Y = make_linear_system(rng, n=30)
    m0 = online_from_bootstrap(jnp.zeros((4, 6)), 4, 4, 2, alpha=10.0)
    h0 = with_history(m0, n_slots=8, every=10)
    upd = history_update(online_fit_iteration)

    # python-loop ground truth of the reference semantics
    m_ref = m0
    iA_ref = [np.asarray(m0.A)]
    for k in range(25):
        m_ref = online_fit_iteration(m_ref, Y[:, k], X[:, k], U[:, k])
        if (k + 1) % 10 == 0:
            iA_ref.append(np.asarray(m_ref.A))

    # same updates inside a scan
    Yj, Xj, Uj = jnp.asarray(Y), jnp.asarray(X), jnp.asarray(U)

    def body(h, k):
        return upd(h, Yj[:, k], Xj[:, k], Uj[:, k]), None

    h_f, _ = jax.lax.scan(body, h0, jnp.arange(25))
    snaps = history_snapshots(h_f)
    assert int(h_f.it) == 25
    assert len(snaps) == len(iA_ref) == 3  # A0 + snapshots at it=10, 20
    for s, r in zip(snaps, iA_ref):
        np.testing.assert_allclose(s, r, atol=1e-12)
    # the wrapper's .A view tracks the inner model
    np.testing.assert_allclose(np.asarray(h_f.A), np.asarray(m_ref.A), atol=1e-12)


def test_history_ring_wraps_keeping_a0():
    """Beyond capacity the ring drops the oldest cadenced snapshots but A0
    (buf[0]) always survives, and order stays chronological."""
    from mpc4quantum_tpu.models.dmdc import with_history, history_update, history_snapshots

    rng = np.random.default_rng(4)
    A_true, B_true, X, U, Y = make_linear_system(rng, n=80)
    m0 = online_from_bootstrap(jnp.zeros((4, 6)), 4, 4, 2, alpha=10.0)
    h = with_history(m0, n_slots=3, every=10)  # A0 + ring of 2
    upd = history_update(online_fit_iteration)

    m_ref = m0
    iA_ref = [np.asarray(m0.A)]
    for k in range(70):
        m_ref = online_fit_iteration(m_ref, Y[:, k], X[:, k], U[:, k])
        h = upd(h, Y[:, k], X[:, k], U[:, k])
        if (k + 1) % 10 == 0:
            iA_ref.append(np.asarray(m_ref.A))

    snaps = history_snapshots(h)
    assert int(h.n_recorded) == 8  # A0 + 7 cadenced
    assert len(snaps) == 3
    np.testing.assert_allclose(snaps[0], iA_ref[0], atol=1e-12)   # A0 kept
    np.testing.assert_allclose(snaps[1], iA_ref[-2], atol=1e-12)  # last two survive
    np.testing.assert_allclose(snaps[2], iA_ref[-1], atol=1e-12)


def test_history_rings_rls_p_alongside_a():
    """For OnlineDMDc the history also rings the RLS covariance P on the same
    cadence (reference iP, model.py:308-310), including ring wrap, and
    history_p_snapshots returns it chronologically."""
    from mpc4quantum_tpu.models.dmdc import (
        with_history, history_update, history_snapshots, history_p_snapshots)

    rng = np.random.default_rng(5)
    A_true, B_true, X, U, Y = make_linear_system(rng, n=80)
    m0 = online_from_bootstrap(jnp.zeros((4, 6)), 4, 4, 2, alpha=10.0)
    h = with_history(m0, n_slots=4, every=10)  # slot 0 + ring of 3
    assert h.pbuf is not None and h.pbuf.shape == (4, 6, 6)
    upd = history_update(online_fit_iteration)

    m_ref = m0
    iP_ref = [np.asarray(m0.P)]
    for k in range(70):
        m_ref = online_fit_iteration(m_ref, Y[:, k], X[:, k], U[:, k])
        h = upd(h, Y[:, k], X[:, k], U[:, k])
        if (k + 1) % 10 == 0:
            iP_ref.append(np.asarray(m_ref.P))

    psnaps = history_p_snapshots(h)
    assert len(psnaps) == len(history_snapshots(h)) == 4  # P0 + last 3 survive
    np.testing.assert_allclose(psnaps[0], iP_ref[0], atol=1e-12)
    for s, r in zip(psnaps[1:], iP_ref[-3:]):
        np.testing.assert_allclose(s, r, atol=1e-12)


def test_history_p_absent_for_non_rls_models():
    """Wrapping a model without an RLS state keeps pbuf=None (still a valid
    pytree through scan) and history_p_snapshots raises."""
    import pytest
    from mpc4quantum_tpu.models.dmdc import (
        with_history, history_update, history_p_snapshots, discrep_bootstrap,
        discrep_fit_iteration)

    rng = np.random.default_rng(6)
    A_true, B_true, X, U, Y = make_linear_system(rng, n=30)
    d0 = discrep_bootstrap(jnp.zeros((4, 6)), 4, 4, 2, capacity=16)
    h0 = with_history(d0, n_slots=3, every=10)
    assert h0.pbuf is None
    upd = history_update(discrep_fit_iteration)

    Yj, Xj, Uj = jnp.asarray(Y), jnp.asarray(X), jnp.asarray(U)

    def body(h, k):
        return upd(h, Yj[:, k], Xj[:, k], Uj[:, k]), None

    h_f, _ = jax.lax.scan(body, h0, jnp.arange(25))
    assert int(h_f.it) == 25 and h_f.pbuf is None
    with pytest.raises(ValueError, match="no RLS state"):
        history_p_snapshots(h_f)


def test_with_history_rejects_single_slot():
    import pytest
    from mpc4quantum_tpu.models.dmdc import with_history

    m0 = online_from_bootstrap(jnp.zeros((4, 6)), 4, 4, 2, alpha=10.0)
    with pytest.raises(ValueError, match="n_slots"):
        with_history(m0, n_slots=1)
