"""Receding-horizon MPC driver: one `lax.scan` over steps, an inner
`lax.while_loop` SQP (iterative-QP), masked early exit.

Control-flow parity with reference mpc.py:128-304 (`mpc`), re-expressed as
fixed-shape masked computation:
  - SDRE-style initial guess: X_guess = repeat(lift(x0)), U_guess = 0
    (reference mpc.py:139-142)
  - inner IQP: linearize along guess -> QP -> exact quadratic line search ->
    blend guesses; exit on step < 1e-4 (reference mpc.py:173-229). With
    warm_start, steps > 1 collapse to a single full-step QP
    (reference mpc.py:208-212).
  - u_prev quirk preserved: the slew box is referenced to the *benchmark*
    control at steps 0 AND 1 (`step > 1`, reference mpc.py:185).
  - reference-window lag preserved: the tracking window for step s is
    X_targ[:, s-1 : s-1+H+1] for s >= 1 (the reference shifts the window
    at the *end* of the previous step, reference mpc.py:276-277).
  - measure_freq: the true plant is propagated one exact ZOH step per control
    (semigroup-equal to the reference's stitched re-simulation from the last
    measured state, reference mpc.py:252-259); at measurement steps the loop
    state is re-seeded with the (noisy) observation, otherwise it closes the
    loop through the model (reference mpc.py:261-267).
  - exit codes as data: 0 completed, 1 exit_condition met, 2 QP failure,
    3 non-finite objective (reference mpc.py:193-203, 289-304).

Deliberate deviations (documented):
  - Streaming model refits feed BOTH the predictor and the linearizer. In the
    reference, `WrapModel` captures numpy views of the initial operator, so
    refits silently never reach the controller (reference mpc.py:156 vs
    model.py:199) - we consider that a bug, not behavior to keep.
  - The line search is evaluated by exact 3-point parabola fit on the
    tracking cost (the cost is exactly quadratic along the step direction),
    algebraically identical to the gradient formula of reference
    mpc.py:101-125 without building the real-embedded block cost.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.bilinear import BilinearModel, model_along_traj
from ..ops.library import krtimes
from ..solvers.boxqp import BoxQPParams
from ..solvers.condense import quad_program, objective_value, QPResult
from ..solvers.lqr import lqr_quad_program
from ..models.dmdc import DMDcModel, predict
from ..plants.quantum import QuantumPlant, lift_state, proj_state, quantum_step


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Static configuration of the MPC loop (shapes + flags)."""

    horizon: int
    n_steps: int
    dt: float
    dim_u: int
    order: int
    measure_freq: int = 1
    max_iter: int = 100
    warm_start: bool = True
    streaming: bool = False
    step_tol: float = 1e-4
    qp_params: BoxQPParams = dataclasses.field(default_factory=BoxQPParams)
    # "qp": condensed box-QP via ADMM (reference optimize.py semantics);
    # "lqr": solver-free affine-tracking LQR with clipped controls
    # (reference lqr.py semantics, Delta-consistent) - no first-step slew
    # box, but no inner iterative solver: the fast path.
    solver: str = "qp"
    # box-QP backend: "chol" = adaptive ADMM with Cholesky factorization;
    # "ns" = fixed-iteration ADMM with Newton-Schulz inverse - matmul-only
    # and loop-free, the form that batches on the TPU (batched Cholesky /
    # triangular-solve lowerings are unavailable on the axon backend)
    qp_backend: str = "chol"
    # SQP loop form: 0 = lax.while_loop (data-dependent exit, the CPU
    # default); k > 0 = exactly k python-unrolled masked iterations (no
    # device loop - the TPU-batched form)
    sqp_unroll: int = 0
    # None = the reference's traced warm-start logic (single QP when
    # step > 1); True/False = static override, letting a host-driven step
    # loop compile a 1-QP steady-state program separately from the
    # multi-iteration early-step program
    single_shot: Optional[bool] = None
    # carry the ADMM dual (y) and penalty (rho) from each QP solve into the
    # next one (shifted with the receding horizon). MPC solves a sequence of
    # nearly identical QPs, so the warm duals skip the rho-rebalancing
    # rounds a cold start needs - with qp_backend="ns" (or the Pallas
    # kernels) this shortens the fixed iteration budget the steady state
    # requires, the dominant serial cost on latency-bound TPU dispatch.
    # Off by default: bit-identical to the cold-start reference semantics.
    qp_warm_duals: bool = False
    # carry the ADMM K-inverse across the steady-state solve chain and
    # refresh it with a few warm-started Newton-Schulz iterations instead of
    # recomputing it cold each solve (solvers/boxqp.ns_inverse X0 /
    # qp_params.ns_refresh). Consecutive steady solves differ only by the
    # linearization drift, so the carried inverse sits inside the NS
    # contraction region; the cold NS chain is the dominant serial cost of
    # the large-n kernel solves (experiments/logs/r4_ns_share.log). Honored
    # by the host-loop driver's Pallas QP path with the large-n kernel
    # (mpc/hostloop.py) - inert elsewhere (the small kernel inverts
    # in-kernel; the scan driver keeps the minimal TPU-validated carry).
    # Off by default: cold solves are bit-identical to the historical form.
    qp_warm_kinv: bool = False
    # seed the initial guess trajectory with the clipped affine-tracking LQR
    # solution of the step-0 linearization instead of the reference's
    # SDRE-style repeat(lift(x0)) (reference mpc.py:139-142). The LQR rollout
    # is near-feasible and near-optimal when saturation is rarely active, so
    # the warm-phase SQP starts next to its fixed point - measured to cut
    # the warm-phase iteration budget (the serial floor VERDICT r3 item 1;
    # the reference's own lqr.py is dead code proposed for exactly this).
    # Off by default: bit-identical to the reference cold init.
    lqr_seed: bool = False
    # trajectory recording inside the scan: "dus" (dynamic_update_slice row
    # writes), "onehot" (multiply-add accumulation - no scatter, for backends
    # whose loops lack DUS), "none" (final state only; xs/us outputs zeroed)
    traj_mode: str = "onehot"
    # fully unroll the step loop (no outer While): large compile, but the
    # only driver form verified end-to-end on the axon TPU backend
    unroll: bool = False


class ModelApplyFns(NamedTuple):
    """Injectable implementations of the three stacked-operator contractions
    the MPC step performs - the seam for tensor-parallel execution.

    The default (None in make_mpc_step) is the dense in-device path
    (ops/bilinear.model_along_traj + models/dmdc.predict). parallel/tensor.py
    provides row-sharded versions (`tp_model_fns`) where the operator lives
    split over a mesh axis and each application gathers once over ICI -
    everything else in the driver (QP, plant, costs) is unchanged, so the
    TP closed loop is the SAME driver code path.
    """

    linearize: Callable  # (model_A, X (dim_x, H), U (dim_u, H)) -> (A_s, B_s, D_s)
    predict: Callable    # (model_A, lift_x (dim_x,), ux (dim_x * Lm,)) -> (dim_x,)
    lift_u: Callable     # (dim_u, n) -> (Lm, n) non-constant monomial lift


class MPCResult(NamedTuple):
    xs: jnp.ndarray        # (dim_e, n_steps+1) experiment-space trajectory
    us: jnp.ndarray        # (dim_u, n_steps) applied controls
    exit_code: jnp.ndarray  # () int32: 0 ok, 1 exit_condition, 2 QP fail, 3 inf obj
    n_valid: jnp.ndarray   # () int32: number of executed steps (us[:, :n_valid])
    objs: jnp.ndarray      # (n_steps,) per-step QP objective
    sqp_iters: jnp.ndarray  # (n_steps,) inner IQP iterations used
    model_A: jnp.ndarray   # final (possibly refit) stacked model operator
    model_state: object    # final full model pytree (None if not streaming)


def _line_search_alpha(Q_s, R_s, X_ref, U_ref, X_guess, U_guess, X_opt, U_opt, step_tol):
    """Exact quadratic line search along (opt - guess) on the tracking cost.

    The cost is a PSD quadratic, so three evaluations determine the parabola
    phi(alpha) exactly; alpha* = -b/(2a). Mirrors reference mpc.py:101-125.
    Returns (alpha, small_step).
    """
    dX = X_opt - X_guess
    dU = U_opt - U_guess

    def phi(alpha):
        return objective_value(X_guess + alpha * dX, U_guess + alpha * dU, X_ref, U_ref, Q_s, R_s)

    p0, ph, p1 = phi(0.0), phi(0.5), phi(1.0)
    a = 2.0 * (p1 + p0 - 2.0 * ph)
    b = p1 - p0 - a
    alpha = jnp.where(jnp.abs(a) > 1e-30, -b / (2.0 * jnp.where(jnp.abs(a) > 1e-30, a, 1.0)), 1.0)
    alpha = jnp.where(jnp.isfinite(alpha), alpha, 1.0)
    # Deviation from reference mpc.py:121 (which leaves alpha unclamped): the
    # cost parabola can be nearly flat along the step direction, making
    # -b/(2a) arbitrarily large and exploding the guess trajectory. Clamp to
    # the convex segment [0, 1] - the damping the line search exists for.
    alpha = jnp.clip(alpha, 0.0, 1.0)
    dz_norm = jnp.sqrt(jnp.sum(jnp.abs(dX) ** 2) + jnp.sum(jnp.abs(dU) ** 2))
    new_step = jnp.abs(alpha) * dz_norm
    return alpha, new_step < step_tol


def sqp_update_from_qp(s, res: QPResult, X_ref, U_ref, Q_s, R_s,
                       single_shot, step_tol):
    """Apply one QP result to the SQP state (the tail of the IQP body):
    failure codes, line search, masked guess blend (reference
    mpc.py:193-229). Shared by the in-graph SQP loop and fleet-batched QP
    backends (e.g. the Pallas kernel path in mpc/hostloop.py)."""
    (Xg, Ug, X_opt, U_opt, obj, n_iter, _, code, y_qp, rho_qp) = s
    qp_fail = ~res.converged
    obj_inf = ~jnp.isfinite(res.obj)
    new_code = jnp.where(qp_fail, 2, jnp.where(obj_inf, 3, 0)).astype(jnp.int32)

    alpha_ls, small = _line_search_alpha(
        Q_s, R_s, X_ref, U_ref, Xg, Ug, res.X, res.U, step_tol
    )
    alpha = jnp.where(single_shot, 1.0, alpha_ls)
    iqp_done = jnp.logical_or(single_shot, small)
    iqp_done = jnp.logical_or(iqp_done, new_code > 0)

    # on QP failure the reference breaks BEFORE updating the guess
    upd = (new_code == 0).astype(Xg.real.dtype)
    Xg_new = Xg + upd * alpha * (res.X - Xg)
    Ug_new = Ug + upd * alpha * (res.U - Ug)
    # dual warm-start carriers: take the solve's final (y, rho) on success,
    # keep the old values on failure (mirrors the guess freeze). Solver
    # paths without duals (LQR) leave the carriers untouched.
    if res.y is not None:
        ok = new_code == 0
        y_qp = jnp.where(ok, res.y.astype(y_qp.dtype), y_qp)
        rho_qp = jnp.where(ok, res.rho.astype(rho_qp.dtype), rho_qp)
    return (Xg_new, Ug_new, res.X, res.U, res.obj, n_iter + 1, iqp_done,
            new_code, y_qp, rho_qp)


def make_mpc_step(
    config: MPCConfig,
    Q_s,
    R_s,
    sat,
    du=None,
    plant_step_fn: Callable = quantum_step,
    lift_fn: Callable = lift_state,
    proj_fn: Callable = proj_state,
    model_update_fn: Optional[Callable] = None,
    exit_condition: Optional[Callable] = None,
    observe_fn: Optional[Callable] = None,
    model_fns: Optional[ModelApplyFns] = None,
):
    """Build the jittable per-step MPC transition function.

    The returned function has signature
        step_fn(carry, step_idx, plant, model_state, X_targ, U_targ)
            -> (carry_new, model_state_new, outputs)
    and is what both `mpc` (under scan) and the compile-check entrypoint use.
    model_state_new == model_state unless streaming updates are configured.

    :param Q_s: (H+1, dim_x, dim_x) per-step + terminal state costs.
    :param R_s: (H, dim_u, dim_u) control costs.
    :param plant_step_fn: (plant, x, u, dt) -> x_next, one exact plant step.
    :param lift_fn/proj_fn: (plant, x) -> z / (plant, z) -> x adapters.
    :param model_update_fn: optional streaming update
        (model_state, y, x, ux) -> model_state (e.g. online_fit_iteration).
    :param exit_condition: optional (x_next, x, u) -> bool scalar
        (reference mpc.py:289-292).
    :param observe_fn: optional (plant, x_plant, key) -> x_measured
        observation model replacing the default full-state+noise observation
        (e.g. `quantum_observe` for e_ops expectation-value measurement,
        reference experiment.py:196-211).
    """
    H = config.horizon
    dim_u = config.dim_u

    def _context(carry, step, plant, model_state, X_targ, U_targ):
        """Per-step quantities shared by the SQP iterations and the advance."""
        (x_cur, x_true, X_guess, U_guess, u_last, key, exit_code, done) = carry
        dim_x = X_guess.shape[0]

        # --- reference window (with the reference's one-step lag quirk) ---
        start = jnp.maximum(step - 1, 0)
        zero = jnp.zeros((), start.dtype)  # match index dtypes (int32 step inputs)
        X_ref = jax.lax.dynamic_slice(X_targ, (zero, start), (dim_x, H + 1))
        U_ref = jax.lax.dynamic_slice(U_targ, (zero, start), (dim_u, H))

        bmodel = BilinearModel.from_stacked(
            model_state.A[:, :dim_x], model_state.A[:, dim_x:], dim_u, config.order
        )
        lift_x = lift_fn(plant, x_cur)
        # u_prev quirk (reference mpc.py:185): benchmark control at steps 0, 1
        u_prev = jnp.where(step > 1, u_last, U_ref[:, 0])

        if config.single_shot is None:
            single_shot = jnp.logical_and(jnp.asarray(config.warm_start), step > 1)
        else:
            single_shot = jnp.asarray(config.single_shot)
        return X_ref, U_ref, bmodel, lift_x, u_prev, single_shot

    def sqp_init(carry, duals=None):
        """Initial SQP state
        s = (Xg, Ug, X_opt, U_opt, obj, n_iter, done, code, y_qp, rho_qp).

        :param duals: optional (y (H*dim_u,), rho ()) carried from the
            previous step's solve (shifted); None = cold start (zeros, with
            rho = 0 as the "use the solver default" sentinel).
        """
        X_guess, U_guess = carry[2], carry[3]
        rdtype = X_guess.real.dtype
        if duals is None:
            duals = (jnp.zeros(H * dim_u, rdtype), jnp.zeros((), rdtype))
        return (X_guess, U_guess, X_guess, U_guess,
                jnp.asarray(jnp.inf, rdtype),
                jnp.asarray(0, jnp.int32), jnp.asarray(False), jnp.asarray(0, jnp.int32),
                duals[0], duals[1])

    def sqp_iter(s, carry, step, plant, model_state, X_targ, U_targ):
        """One masked SQP iteration (frozen once the exit condition fired) -
        individually jittable for host-driven fine-grained step loops."""
        X_ref, U_ref, bmodel, lift_x, u_prev, single_shot = _context(
            carry, step, plant, model_state, X_targ, U_targ)

        def iqp_body(s):
            (Xg, Ug, X_opt, U_opt, obj, n_iter, _, code, y_qp, rho_qp) = s
            if model_fns is not None:
                A_s, B_s, D_s = model_fns.linearize(model_state.A, Xg[:, :H], Ug)
            else:
                A_s, B_s, D_s = model_along_traj(bmodel, Xg[:, :H], Ug)
            if config.solver == "lqr":
                lres = lqr_quad_program(
                    lift_x, X_ref, U_ref, Q_s, R_s, A_s, B_s, sat=sat, Delta_s=D_s
                )
                # failure detection: an ill-conditioned backward pass produces
                # NaN/inf gains; treat a non-finite rollout as a solver
                # failure (exit code 2) rather than declaring success
                lqr_ok = jnp.logical_and(
                    jnp.all(jnp.isfinite(jnp.abs(lres.X))),
                    jnp.all(jnp.isfinite(lres.U)),
                )
                res = QPResult(X=lres.X, U=lres.U, obj=lres.cost,
                               iters=jnp.asarray(0), converged=lqr_ok)
            else:
                if config.qp_warm_duals:
                    # carried duals seed SINGLE-SHOT (steady) solves only:
                    # warm-phase SQP iterations re-linearize aggressively
                    # (the QP itself changes solve to solve), and feeding
                    # each one the previous solve's rho ratchets the penalty
                    # out of the stable band (measured failure mode). The
                    # warm phase runs cold - its last solve's (y, rho) then
                    # seed the steady chain, where consecutive QPs are
                    # near-identical and the warm start pays.
                    ss = jnp.asarray(single_shot)
                    Y_w = jnp.where(ss, y_qp, jnp.zeros_like(y_qp))
                    rho_w = jnp.where(ss, rho_qp, jnp.zeros_like(rho_qp))
                else:
                    Y_w = rho_w = None
                res = quad_program(
                    lift_x, X_ref, U_ref, Q_s, R_s, A_s, B_s, D_s,
                    u_prev=u_prev, sat=sat, du=du, U_warm=Ug, params=config.qp_params,
                    backend=config.qp_backend,
                    Y_warm=Y_w, rho_warm=rho_w,
                )
            return sqp_update_from_qp(s, res, X_ref, U_ref, Q_s, R_s,
                                      single_shot, config.step_tol)

        done_prev = s[6]
        s_new = iqp_body(s)
        return tuple(jnp.where(done_prev, a, b) for a, b in zip(s, s_new))

    def run_sqp(carry, step, plant, model_state, X_targ, U_targ, duals=None):
        ctx_args = (carry, step, plant, model_state, X_targ, U_targ)
        init = sqp_init(carry, duals)
        if config.sqp_unroll > 0:
            # flat masked form: exactly sqp_unroll iterations, updates
            # frozen once the exit condition fires (no device loop)
            s = init
            for _ in range(config.sqp_unroll):
                s = sqp_iter(s, *ctx_args)
            return s
        def iqp_cond(s):
            n_iter, iqp_done = s[5], s[6]
            return jnp.logical_and(~iqp_done, n_iter < config.max_iter)
        return jax.lax.while_loop(iqp_cond, lambda s: sqp_iter(s, *ctx_args), init)

    def advance(carry, s, step, plant, model_state, X_targ, U_targ):
        """Apply the SQP result: first control -> plant, measurement, model
        closure, streaming refit, guess shifting, exit bookkeeping."""
        (x_cur, x_true, X_guess, U_guess, u_last, key, exit_code, done) = carry
        dim_x = X_guess.shape[0]
        (Xg, Ug, X_opt, U_opt, obj, n_iter, _, iqp_code, y_qp, rho_qp) = s
        _, _, bmodel, lift_x, _, _ = _context(carry, step, plant, model_state, X_targ, U_targ)
        step_failed = iqp_code > 0

        # --- apply first control; propagate TRUE plant + observation ---
        # The true plant state evolves one exact ZOH step per control from
        # itself (semigroup-equal to the reference's stitched re-simulation
        # from the last measured state, reference mpc.py:256-259); the
        # *observed* state x_cur only re-syncs with it at measurement steps.
        u_apply = U_opt[:, 0]
        key, k_noise = jax.random.split(key)
        x_plant = plant_step_fn(plant, x_true, u_apply, config.dt)

        is_measure = ((step + 1) % config.measure_freq) == 0
        if observe_fn is not None:
            x_measured = observe_fn(plant, x_plant, k_noise)
        else:
            rdtype = x_plant.real.dtype
            noise = plant.sigma * (
                jax.random.normal(k_noise, x_plant.shape, rdtype)
                + 1j * jax.random.normal(jax.random.fold_in(k_noise, 1), x_plant.shape, rdtype)
            ) if hasattr(plant, "sigma") else 0.0
            x_measured = x_plant + noise
        # the noisy measurement re-seeds the plant too (the reference restarts
        # simulation from the measured value, reference mpc.py:259)
        x_true_next = jnp.where(is_measure, x_measured, x_plant)

        lift_u = bmodel.lift_u(u_apply.reshape(-1, 1))
        ux = krtimes(lift_u.astype(lift_x.dtype), lift_x.reshape(-1, 1))
        if model_fns is not None:
            x_model = proj_fn(plant, model_fns.predict(model_state.A, lift_x, ux[:, 0]))
        else:
            dmdc = DMDcModel(A=model_state.A, dim_y=dim_x, dim_x=dim_x, dim_u=model_state.A.shape[1] - dim_x)
            x_model = proj_fn(plant, predict(dmdc, lift_x.reshape(-1, 1), ux)[:, 0])
        x_next = jnp.where(is_measure, x_measured, x_model)

        # --- streaming model refit ---
        if model_update_fn is not None and config.streaming:
            lift_next = lift_fn(plant, x_next)
            model_new = model_update_fn(model_state, lift_next, lift_x, ux[:, 0])
            model_state = jax.tree.map(
                lambda old, new: jnp.where(jnp.logical_or(done, step_failed), old, new),
                model_state, model_new,
            )

        # --- guess/target shifting (reference mpc.py:71-73, 271-272) ---
        Xg_shift = jnp.concatenate([Xg[:, 1:], Xg[:, -1:]], axis=1)
        Ug_shift = jnp.concatenate([Ug[:, 1:], Ug[:, -1:]], axis=1)
        # dual warm-start shift: y is time-major (H*dim_u,) like vec(U) -
        # drop the applied step's block, duplicate the last (the same
        # receding-horizon shift as the guesses); frozen once the lane is
        # done (mirrors the guess freeze below)
        y_shift = jnp.concatenate([y_qp[dim_u:], y_qp[-dim_u:]])
        duals_out = (jnp.where(done, y_qp, y_shift), rho_qp)

        # --- exit bookkeeping ---
        cond_exit = (
            exit_condition(x_next, x_cur, u_apply) if exit_condition is not None else jnp.asarray(False)
        )
        new_code = jnp.where(
            step_failed, iqp_code, jnp.where(cond_exit, 1, 0)
        ).astype(jnp.int32)
        active = ~jnp.logical_or(done, step_failed)  # control applied this step

        sel = lambda old, new: jnp.where(done, old, new)
        carry_new = (
            sel(x_cur, jnp.where(step_failed, x_cur, x_next)),
            sel(x_true, jnp.where(step_failed, x_true, x_true_next)),
            sel(X_guess, Xg_shift),
            sel(U_guess, Ug_shift),
            sel(u_last, jnp.where(step_failed, u_last, u_apply)),
            key,
            jnp.where(done, exit_code, new_code),
            jnp.logical_or(done, jnp.logical_or(step_failed, cond_exit)),
        )
        outputs = (
            carry_new[0],  # x after this step
            jnp.where(active, u_apply, jnp.zeros_like(u_apply)),
            jnp.where(done, jnp.zeros_like(obj), obj),
            jnp.where(done, 0, n_iter).astype(jnp.int32),
            active,
            duals_out,  # shifted (y, rho) for the next step's QP warm start
        )
        return carry_new, model_state, outputs

    def step_fn(carry, step, plant, model_state, X_targ, U_targ, duals=None):
        s = run_sqp(carry, step, plant, model_state, X_targ, U_targ, duals)
        return advance(carry, s, step, plant, model_state, X_targ, U_targ)

    # expose the pieces for host-driven fine-grained loops (mpc/hostloop.py):
    # one SQP iteration and the advance are each small jittable programs;
    # context provides the per-step quantities for fleet-batched QP backends
    step_fn.sqp_init = sqp_init
    step_fn.sqp_iter = sqp_iter
    step_fn.advance = advance
    step_fn.context = _context
    return step_fn


def lqr_seed_guess(model_A, lift_x0, X_targ, U_targ, Q_s, R_s, sat, config):
    """Warm-phase initial guess from the affine-tracking LQR fast path.

    Linearizes the bilinear model at the SDRE-style guess (X = repeat(x0),
    U = 0 - the reference init, mpc.py:139-142), solves the horizon with the
    solver-free clipped LQR (reference lqr.py:14-79 semantics,
    Delta-consistent), and returns its rollout as (X_guess, U_guess). The
    rollout is dynamics-consistent and saturation-clipped, so the first QP's
    linearization is taken along a near-optimal trajectory and its ADMM warm
    start (U_warm = U_guess) begins near the solution - the LQR-seeded
    attack on the warm-phase serial-iteration floor.

    :param model_A: (dim_x, dim_x*L) stacked model operator.
    :param lift_x0: (dim_x,) model-space initial state.
    :return: (X_guess (dim_x, H+1) complex, U_guess (dim_u, H) real).
    """
    H, dim_u = config.horizon, config.dim_u
    dim_x = lift_x0.shape[0]
    cdtype = model_A.dtype
    Xg = jnp.tile(lift_x0[:, None].astype(cdtype), (1, H + 1))
    Ug = jnp.zeros((dim_u, H), Xg.real.dtype)
    bmodel = BilinearModel.from_stacked(
        model_A[:, :dim_x], model_A[:, dim_x:], dim_u, config.order)
    A_s, B_s, D_s = model_along_traj(bmodel, Xg[:, :H], Ug)
    X_ref = jnp.asarray(X_targ, cdtype)[:, : H + 1]
    U_ref = jnp.asarray(U_targ)[:, :H].astype(Ug.dtype)
    res = lqr_quad_program(lift_x0.astype(cdtype), X_ref, U_ref, Q_s, R_s,
                           A_s, B_s, sat=sat, Delta_s=D_s)
    X_seed = jnp.where(jnp.all(jnp.isfinite(jnp.abs(res.X))), res.X, Xg)
    U_seed = jnp.where(jnp.all(jnp.isfinite(res.U)), res.U.astype(Ug.dtype), Ug)
    return X_seed, U_seed


def mpc(
    x0,
    model_state,
    plant,
    X_targ,
    U_targ,
    Q,
    R,
    Qf,
    config: MPCConfig,
    sat,
    du=None,
    key=None,
    plant_step_fn: Callable = quantum_step,
    lift_fn: Callable = lift_state,
    proj_fn: Callable = proj_state,
    model_update_fn: Optional[Callable] = None,
    exit_condition: Optional[Callable] = None,
    observe_fn: Optional[Callable] = None,
    model_fns: Optional[ModelApplyFns] = None,
) -> MPCResult:
    """Run the full receding-horizon MPC loop (reference mpc.py:128-304).

    :param x0: (dim_e,) experiment-space initial state.
    :param model_state: pytree with field `.A` - the stacked model operator
        (dim_x, dim_x * (1 + L-1)); e.g. DMDcModel / OnlineDMDc / DiscrepDMDc.
    :param plant: plant pytree (QuantumPlant by default); vmappable, so
        scenario batches can carry per-lane plant parameters.
    :param X_targ: (dim_x, n_steps + H + 1) target trajectory;
        :param U_targ: (dim_u, n_steps + H).
    :param Q, R, Qf: cost matrices ((dim_x,dim_x), (dim_u,dim_u), (dim_x,dim_x)).
    :param config: static MPCConfig.
    :param key: PRNG key for measurement noise (default PRNGKey(0)).
    :return: MPCResult with fixed-shape outputs + exit_code/n_valid metadata.
    """
    H, n_steps, dim_u = config.horizon, config.n_steps, config.dim_u
    x0 = jnp.asarray(x0)
    cdtype = model_state.A.dtype if jnp.iscomplexobj(model_state.A) else jnp.asarray(X_targ).dtype
    key = jax.random.PRNGKey(0) if key is None else key

    lift_x0 = lift_fn(plant, x0)
    dim_x = lift_x0.shape[0]
    Q_s = jnp.concatenate(
        [jnp.tile(jnp.asarray(Q, cdtype)[None], (H, 1, 1)),
         jnp.asarray(Qf, cdtype)[None]], axis=0,
    )
    # tile (materialize) instead of broadcast_to: degenerate-stride operands
    # inside deeply nested control flow hit backend limitations on some TPU
    # paths
    R_s = jnp.tile(jnp.asarray(R)[None], (H, 1, 1))

    step_fn = make_mpc_step(
        config, Q_s, R_s, sat, du,
        plant_step_fn=plant_step_fn, lift_fn=lift_fn, proj_fn=proj_fn,
        model_update_fn=model_update_fn, exit_condition=exit_condition,
        observe_fn=observe_fn, model_fns=model_fns,
    )

    X_guess0 = jnp.tile(lift_x0[:, None].astype(cdtype), (1, H + 1))
    U_guess0 = jnp.zeros((dim_u, H), jnp.asarray(sat).dtype if hasattr(sat, "dtype") else X_guess0.real.dtype)
    if config.lqr_seed:
        X_guess0, U_guess0 = lqr_seed_guess(
            model_state.A, lift_x0, X_targ, U_targ, Q_s, R_s, sat, config)
        U_guess0 = U_guess0.astype(
            jnp.asarray(sat).dtype if hasattr(sat, "dtype") else X_guess0.real.dtype)

    Xt = jnp.asarray(X_targ, cdtype)
    Ut = jnp.asarray(U_targ)

    streaming = config.streaming and model_update_fn is not None
    rdtype = jnp.zeros(0, cdtype).real.dtype
    is_cx = jnp.issubdtype(cdtype, jnp.complexfloating)
    E = x0.shape[0]

    # ------------------------------------------------------------------
    # TPU-backend loop-state contract (measured, see CLAUDE.md): the shape
    # of the scan state is fragile on the experimental backend - the flat
    # 8-element carry below plus ONE trajectory matrix is the empirically
    # validated form (extra operands, nested pytrees, in-loop complex
    # repacking, and plain ys stacking all raise UNIMPLEMENTED). Trajectory
    # rows are accumulated by one-hot multiply-add ("onehot", default) or
    # dynamic_update_slice ("dus"); both identical numerically.
    # ------------------------------------------------------------------
    if streaming:
        model_leaves, model_def = jax.tree.flatten(model_state)
    else:
        model_leaves, model_def = [], None

    carry0 = (
        x0.astype(cdtype),
        x0.astype(cdtype),  # true plant state (diverges from x_cur when measure_freq > 1)
        X_guess0,
        U_guess0,
        U_targ[:, 0].astype(U_guess0.dtype),
        key,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    record = config.traj_mode != "none"
    row_len = 2 * E + 3 + dim_u
    traj_tuple0 = (jnp.zeros((n_steps, row_len), rdtype),) if record else ()
    # dual warm-start state (y, rho), threaded only when enabled so the
    # default scan-state shape is untouched (the TPU-validated form)
    warm_duals = config.qp_warm_duals
    duals_tuple0 = ((jnp.zeros(H * dim_u, rdtype), jnp.zeros((), rdtype))
                    if warm_duals else ())
    n_traj = 1 if record else 0
    n_duals = 2 if warm_duals else 0

    def scan_body(state, step):
        carry = state[:8]
        traj_tuple = state[8 : 8 + n_traj]
        duals = state[8 + n_traj : 8 + n_traj + n_duals] if warm_duals else None
        mleaves = state[8 + n_traj + n_duals:]
        mstate = jax.tree.unflatten(model_def, list(mleaves)) if streaming else model_state
        carry_new, m_new, outs = step_fn(carry, step, plant, mstate, Xt, Ut,
                                         duals=duals)
        duals_tuple = outs[5] if warm_duals else ()

        if record:
            (traj,) = traj_tuple
            # trajectory row: [re(x), im(x), obj, iters, active, u...]
            x_next, u_apply, obj, iters, active = outs[:5]
            row = jnp.concatenate([
                jnp.real(x_next).astype(rdtype),
                jnp.imag(x_next).astype(rdtype),
                jnp.reshape(obj, (1,)).astype(rdtype),
                jnp.reshape(iters, (1,)).astype(rdtype),
                jnp.reshape(active, (1,)).astype(rdtype),
                u_apply.reshape(-1).astype(rdtype),
            ])
            if config.traj_mode == "dus":
                traj = jax.lax.dynamic_update_slice(traj, row[None, :], (step, 0))
            else:  # onehot
                onehot = (jnp.arange(n_steps) == step).astype(rdtype)
                traj = traj + onehot[:, None] * row[None, :]
            traj_tuple = (traj,)

        m_new_leaves = tuple(jax.tree.leaves(m_new)) if streaming else ()
        return carry_new + traj_tuple + duals_tuple + m_new_leaves, None

    state_f, _ = jax.lax.scan(scan_body,
                              carry0 + traj_tuple0 + duals_tuple0 + tuple(model_leaves),
                              jnp.arange(n_steps),
                              unroll=n_steps if config.unroll else 1)
    carry_f = state_f[:8]
    traj_f = state_f[8] if record else jnp.zeros((n_steps, row_len), rdtype)
    model_f = (jax.tree.unflatten(model_def, list(state_f[8 + n_traj + n_duals:]))
               if streaming else model_state)
    intbuf_f = jnp.stack([carry_f[6], carry_f[7].astype(jnp.int32)])

    xs_re = traj_f[:, :E]
    xs_im = traj_f[:, E : 2 * E]
    xs_steps = jax.lax.complex(xs_re, xs_im) if is_cx else xs_re
    objs = traj_f[:, 2 * E]
    iters = traj_f[:, 2 * E + 1].astype(jnp.int32)
    active = traj_f[:, 2 * E + 2].astype(jnp.int32)
    us_steps = traj_f[:, 2 * E + 3 :]
    if config.traj_mode == "none":
        # degraded recording: only the final state survives (from the
        # carry); intermediate rows stay zero. n_valid is exact only when no
        # early exit fired. Assembled by concat, NOT .at[].set - complex
        # scatter is unimplemented on some TPU backend paths.
        x_final = carry_f[0]
        xs_steps = jnp.concatenate(
            [jnp.zeros((n_steps - 1, E), cdtype), x_final[None, :]], axis=0
        )
        active = jnp.where(intbuf_f[0] == 0, jnp.ones(n_steps, jnp.int32), jnp.zeros(n_steps, jnp.int32))

    xs = jnp.concatenate([x0[None].astype(cdtype), xs_steps], axis=0).T
    us = us_steps.T
    n_valid = jnp.sum(active)
    return MPCResult(
        xs=xs, us=us,
        exit_code=intbuf_f[0], n_valid=n_valid,
        objs=objs, sqp_iters=iters,
        model_A=model_f.A, model_state=model_f,
    )


def trim(result: MPCResult):
    """Python-side trimming that mirrors the reference's early-exit slicing
    (reference mpc.py:294-304): returns (xs, us) cut to the executed steps.

    Reference semantics: a normal exit (code 0) and a solver failure
    (codes 2/3, which fire *before* the step's control is applied) keep all
    applied controls; an `exit_condition` exit (code 1) drops the last
    attempted entry - the state AND control of the step that triggered it
    (reference mpc.py:298-304). Where the reference returns `us=None` for a
    code-1 exit at step 0, we return the empty (dim_u, 0) slice.
    """
    import numpy as np

    n = int(result.n_valid)
    code = int(result.exit_code)
    xs = np.asarray(result.xs)
    us = np.asarray(result.us)
    if code == 1:
        # the exit step's control WAS applied (counted in n_valid); the
        # reference discards it along with the resulting state
        return xs[:, :n], us[:, : max(n - 1, 0)]
    return xs[:, : n + 1], us[:, :n]
