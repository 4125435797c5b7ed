"""Data-driven model training: offline DMDc fit with an rcond hyper-sweep
selected by closed-loop rollout prediction loss.

TPU-shaped version of the reference training harness (reference
tests/util_training.py:9-110): the rcond grid is evaluated as a *batch* - the
pinv-based fit is vmapped over the grid and every candidate model is rolled
out with one `lax.scan` - instead of a python loop over sequential fits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .dmdc import DMDcModel, discrep_from_data, predict
from ..ops.library import krtimes


def prediction_loss(A, dim_x, X2, X1, UL1):
    """Closed-loop rollout loss ||X2 - X2_hat||_2 (reference
    util_training.py:88-110): roll the model forward from X1[:, 0] feeding its
    own predictions back, controls from the lifted data.

    :param A: (dim_y, dim_x + dim_lift*dim_x) stacked operator.
    :param X2/X1: (dim_x, n) snapshot matrices; :param UL1: (dim_lift, n)
        lifted controls.
    """
    A_x = A[:, :dim_x]
    A_u = A[:, dim_x:]

    def step(x, ul):
        ux = krtimes(ul[:, None], x[:, None])[:, 0]
        x_next = A_x @ x + A_u @ ux.astype(A_u.dtype)
        return x_next, x_next

    _, X2_hat = jax.lax.scan(step, X1[:, 0], UL1.T)
    return jnp.linalg.norm(X2.T - X2_hat)


def train_model(X2, X1, UL1, rconds=None, capacity: int | None = None):
    """Fit DiscrepDMDc over an rcond grid, select by rollout loss.

    :param X2, X1: (dim_x, n) successor/current snapshot matrices.
    :param UL1: (dim_lift, n) lifted controls aligned with X1; the model input
        is krtimes(UL1, X1) (reference util_training.py:45-52).
    :param rconds: candidate rcond values (default logspace(-6, -1, 10),
        reference util_training.py:61).
    :return: (best DiscrepDMDc, best rcond, losses).
    """
    if rconds is None:
        rconds = jnp.logspace(-6, -1, 10)
    rconds = jnp.asarray(rconds)
    UX1 = krtimes(UL1.astype(X1.dtype), X1)
    dim_x, n = X1.shape
    Z = jnp.concatenate([X1, UX1], axis=0)

    def fit(rcond):
        return X2 @ jnp.linalg.pinv(Z, rtol=rcond)

    A_grid = jax.vmap(fit)(rconds)
    losses = jax.vmap(lambda A: prediction_loss(A, dim_x, X2, X1, UL1))(A_grid)
    best = jnp.argmin(losses)
    best_rcond = rconds[best]
    A_best = A_grid[best]

    model = discrep_from_data(X2, X1, UX1, rcond=float(1e-15), capacity=capacity)
    # keep the swept operator (same fit, selected rcond) in the container
    model = model.replace(A=A_best, rcond=best_rcond)
    return model, best_rcond, losses
