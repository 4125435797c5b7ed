"""Host-driven chunked MPC driver: small jitted programs, device-resident state.

The scan-based driver (mpc/driver.py) is the right form when the backend can
lower a batched `lax.scan` of the full step. The axon TPU backend cannot
(measured, round 2: a vmapped MPC step inside any loop primitive - and even
the monolithic unrolled step - raises UNIMPLEMENTED or compiles for tens of
minutes). This driver runs the *receding-horizon loop on the host* instead,
dispatching four small compiled programs per rollout batch:

    init     carry -> SQP state                  (trivial)
    iter     one masked SQP iteration            (~1 condensed QP)
    advance  apply control, plant step, shift    (~1 plant step)

with every array staying on device between calls (CxPair-split at the jit
boundary, so no complex dtype ever crosses host<->device - see utils/cxio).
Steps 0..1 run `warm_sqp_iters` masked iterations (the reference's
line-searched IQP, mpc.py:208-225); steps >= 2 run the single-shot QP
(warm-start collapse, reference mpc.py:208-212). Composed from the same
`make_mpc_step` pieces as the scan driver; the one deliberate approximation
is that warm steps run a FIXED budget of `warm_sqp_iters` masked SQP
iterations instead of the scan driver's run-to-convergence while_loop
(config.max_iter cap, default 100) - equivalent whenever warm steps
converge within the budget (they do on every preset at the default 12;
equivalence asserted lane-for-lane in tests/test_mpc_e2e.py), and a
truncated-but-feasible solve otherwise. Raise `warm_sqp_iters` toward
config.max_iter to recover exact scan-driver semantics at higher cost.

Intended pairing: config.qp_backend="ns" + quantum_step_taylor, making each
program a flat chain of batched matmuls (no Cholesky/LU/while) - the form
the TPU backend executes and the MXU-shaped form for scenario fleets.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Any, Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .driver import MPCConfig, make_mpc_step
from ..plants.quantum import quantum_step, lift_state, proj_state
from ..utils.cxio import split_cx, CxPair, merge_cx


class PropagatedPlant(NamedTuple):
    """Plant wrapper carrying a precomputed one-step propagator U.

    Used by the fleet-batched Pallas plant path (plant_impl="pallas"): the
    whole fleet's U_b = expm(-i dt H_b(u_b)) are computed by ONE kernel call,
    then the per-lane advance applies rho' = U rho U^H through this wrapper
    (exact ZOH semantics, identical to plants/quantum.quantum_step)."""

    base: Any          # the underlying plant pytree (QuantumPlant)
    U: jnp.ndarray     # (d, d) per-lane propagator (leading batch axis under vmap)

    @property
    def sigma(self):
        # the advance's default observation model reads plant.sigma
        return self.base.sigma


class HostLoopMPC:
    """Compiled-program bundle for host-driven batched MPC rollouts.

    Build once per (config, shapes); `run(...)` any number of times - the
    four programs are jit-cached across calls, so benchmark repetitions pay
    only dispatch cost.
    """

    def __init__(self, config: MPCConfig, sat, du=None,
                 plant_step_fn: Callable = quantum_step,
                 lift_fn: Callable = lift_state,
                 proj_fn: Callable = proj_state,
                 model_update_fn: Optional[Callable] = None,
                 exit_condition: Optional[Callable] = None,
                 observe_fn: Optional[Callable] = None,
                 warm_sqp_iters: int = 12,
                 granularity: str = "sqp",
                 qp_impl: str = "xla",
                 plant_impl: str = "xla",
                 steady_fuse: int = 1,
                 steady_qp_params=None,
                 qp_kernel: str = "auto",
                 pallas_interpret: bool = False,
                 pallas_max_squarings: int = 12,
                 pallas_taylor_k: int = 18):
        """:param granularity: "sqp" = four small programs (one per SQP
        iteration + advance; fastest compile, most dispatches); "step" = two
        fused whole-step programs (warm with `warm_sqp_iters` unrolled SQP
        iterations, steady single-shot; ~4x fewer dispatches per rollout at
        the cost of a long one-time compile of the warm program); "mixed" =
        warm steps at "sqp" granularity, steady steps as ONE fused
        iteration+advance program each - the dispatch-latency sweet spot
        (small compiles, 1 launch per steady step instead of 3).
        :param steady_fuse: with granularity "mixed"/"step", fuse this many
        CONSECUTIVE steady steps into one program (k full init+QP+advance
        step bodies back to back) - k-fold fewer dispatches at k-fold
        program size. Only the chunk's last per-step outputs are returned,
        so it applies when run(record=False); recorded runs fall back to
        per-step programs.
        :param qp_impl: "xla" = the QP solves inside the lane vmap
        (config.qp_backend selects chol/ns; config.solver selects qp/lqr);
        "pallas" = per-lane assembly is vmapped but the whole fleet's box
        QPs are solved by ONE call to the lane-batched Pallas ADMM kernel
        (ops/pallas_qp.py) per SQP iteration - the fused hot-kernel path,
        available at every granularity (requires config.solver="qp").
        :param steady_qp_params: optional BoxQPParams override for the
        steady-state (single-shot) programs only. With config.qp_warm_duals
        the steady QPs start from the previous step's (shifted) ADMM dual
        and rebalanced rho, so they need a fraction of the cold-start
        iteration budget - e.g. BoxQPParams(max_iter=10, n_rounds=1) against
        a 3x15 warm-phase budget. None = same budget both phases.
        :param plant_impl: "xla" = per-lane `plant_step_fn` inside the
        advance vmap; "pallas" = the fleet's one-step propagators
        U_b = expm(-i dt H_b(u_b)) computed by ONE call to the lane-batched
        Pallas expm kernel (ops/pallas_expm.py), applied per lane as
        rho' = U rho U^H. Requires a QuantumPlant (H0/H1s fields AND
        density-matrix conjugation step semantics - NOT valid for e.g.
        SynthesisPlant, whose step is kron(U, U*) on a process state);
        replaces `plant_step_fn` with the exact ZOH step."""
        if qp_impl == "pallas" and config.solver != "qp":
            raise ValueError(
                "qp_impl='pallas' runs the condensed box-QP kernel and cannot "
                f"honor config.solver={config.solver!r}; use qp_impl='xla'")
        if granularity not in ("sqp", "step", "mixed"):
            raise ValueError(
                f"granularity={granularity!r} is not one of 'sqp'/'step'/'mixed' "
                "- a typo here would silently run (and record) the wrong engine "
                "configuration")
        if qp_kernel not in ("auto", "small", "big", "big_unroll"):
            raise ValueError(
                f"qp_kernel={qp_kernel!r} is not one of 'auto'/'small'/'big'/"
                "'big_unroll'. auto = the fully-unrolled in-kernel-inverse "
                "kernel at n_qp <= 16, the looped large-n kernel beyond; "
                "small/big force one; big_unroll = the XLA-inverse kernel "
                "with the ADMM chain unrolled (shortest serial chain at "
                "flagship sizes)")
        self.qp_kernel = qp_kernel
        self.config = config
        self.sat = sat
        self.du = du
        # warm_sqp_iters: one budget for every warm step (int), or a
        # per-warm-step tuple, e.g. (8, 2): step 0 runs 8 masked SQP
        # iterations, steps >= 1 run 2 (steps beyond the tuple use its last
        # entry - only reachable when warm_start=False makes every step
        # warm). Measured motivation: from the shifted step-0 guess, step 1
        # converges in 1-2 line-searched iterations on the state-prep
        # presets, so a flat budget wastes most of the second warm
        # program's serial QP chain.
        wi = (tuple(int(v) for v in warm_sqp_iters)
              if isinstance(warm_sqp_iters, (tuple, list))
              else (int(warm_sqp_iters),))
        if not wi or any(v < 1 for v in wi):
            raise ValueError(f"warm_sqp_iters={warm_sqp_iters!r}: need >= 1 "
                             "iteration per warm step")
        self._warm_iters = wi
        self.warm_sqp_iters = max(wi)
        self.granularity = granularity
        self.qp_impl = qp_impl
        self.plant_impl = plant_impl
        self.steady_fuse = int(steady_fuse)
        # K-inverse carry across the steady solve chain (MPCConfig
        # .qp_warm_kinv): only meaningful on the Pallas QP path with the
        # large-n kernel, whose between-round Newton-Schulz inverse is the
        # dominant serial cost (experiments/logs/r4_ns_share.log); the small
        # kernel inverts in-kernel and the XLA path keeps the proven cold
        # form. Resolution mirrors pallas_sqp_iter's auto rule.
        n_qp = config.horizon * config.dim_u
        kind0 = qp_kernel if qp_kernel != "auto" else (
            "small" if n_qp <= 16 else "big")
        self._kinv_carry = bool(config.qp_warm_kinv and qp_impl == "pallas"
                                and config.solver == "qp" and kind0 != "small")
        self.pallas_interpret = pallas_interpret
        # expm kernel budget (plant_impl="pallas"): the serial in-kernel
        # chain is taylor_k + max_squarings matmuls. The defaults (18, 12)
        # are the conservative any-norm form; fleet drivers with a host-side
        # ||dt*H|| bound pass e.g. (12, 0) - see benchfleet's auto budget.
        self.pallas_max_squarings = pallas_max_squarings
        self.pallas_taylor_k = pallas_taylor_k
        self._lift_fn = lift_fn
        mk = lambda cfg: lambda Q_s, R_s: make_mpc_step(
            cfg, Q_s, R_s, sat, du,
            plant_step_fn=plant_step_fn, lift_fn=lift_fn, proj_fn=proj_fn,
            model_update_fn=model_update_fn, exit_condition=exit_condition,
            observe_fn=observe_fn,
        )
        if plant_impl == "pallas":
            # the same step pieces, but plant/lift/proj/observe unwrap a
            # PropagatedPlant whose U was produced by the fleet-level kernel
            def prop_step(p, x, u, dt):
                d = p.U.shape[-1]
                rho = x.reshape(d, d).astype(p.U.dtype)
                return (p.U @ rho @ p.U.conj().T).reshape(-1)

            prop_lift = lambda p, x: lift_fn(p.base, x)
            prop_proj = lambda p, z: proj_fn(p.base, z)
            prop_obs = (None if observe_fn is None
                        else (lambda p, x, key: observe_fn(p.base, x, key)))
            self._mk_prop = lambda cfg: lambda Q_s, R_s: make_mpc_step(
                cfg, Q_s, R_s, sat, du,
                plant_step_fn=prop_step, lift_fn=prop_lift, proj_fn=prop_proj,
                model_update_fn=model_update_fn, exit_condition=exit_condition,
                observe_fn=prop_obs,
            )
        # two SQP-iteration programs: line-searched (warm phase) and
        # single-shot alpha=1 (steady phase, reference warm-start collapse);
        # the steady phase may run a reduced QP budget (dual warm-starting)
        self._steady_qp_params = (config.qp_params if steady_qp_params is None
                                  else steady_qp_params)
        self._mk_warm = mk(dataclasses.replace(config, single_shot=False,
                                               sqp_unroll=warm_sqp_iters))
        self._mk_steady = mk(dataclasses.replace(config, single_shot=True,
                                                 sqp_unroll=1,
                                                 qp_params=self._steady_qp_params))
        self._programs = self._build_programs()

    def _build_programs(self):
        H = self.config.horizon

        def costs(Q, R, Qf):
            cdtype = Q.dtype
            Q_s = jnp.concatenate(
                [jnp.tile(jnp.asarray(Q, cdtype)[None], (H, 1, 1)),
                 jnp.asarray(Qf, cdtype)[None]], axis=0)
            R_s = jnp.tile(jnp.asarray(R)[None], (H, 1, 1))
            return Q_s, R_s

        def resplit(tree):
            return jax.tree.map(
                lambda x: CxPair(re=jnp.real(x), im=jnp.imag(x))
                if jnp.issubdtype(x.dtype, jnp.complexfloating) else x,
                tree,
            )

        def init_prog(carry_s, duals):
            carry = merge_cx(carry_s)
            step0 = self._mk_steady(None, None)  # sqp_init needs no costs
            s = jax.vmap(step0.sqp_init)(carry, duals)
            return resplit(s)

        # NOTE: the model state is kept PER-LANE (leading batch axis) through
        # the whole loop - `advance` returns it through the lane vmap (so
        # streaming refits are per-lane, as in the scan driver), and the SQP
        # iterations consume it per-lane again.
        def make_iter(mk):
            def prog(carry_s, s_s, step, plants_s, model_s, Xt_s, Ut, Q_s_, R_, Qf_s_):
                carry = merge_cx(carry_s)
                s = merge_cx(s_s)
                plants = merge_cx(plants_s)
                model = merge_cx(model_s)
                Xt = merge_cx(Xt_s)
                Q = merge_cx(Q_s_)
                Qf = merge_cx(Qf_s_)
                Q_s, R_s = costs(Q, R_, Qf)
                step_fn = mk(Q_s, R_s)

                def one(c, si, p, m):
                    return step_fn.sqp_iter(si, c, step, p, m,
                                            jnp.asarray(Xt, Q.dtype), jnp.asarray(Ut))

                s_new = jax.vmap(one, in_axes=(0, 0, 0, 0))(carry, s, plants, model)
                return resplit(s_new)
            return jax.jit(prog)

        def do_advance(carry, s, step, plants, model, Xtc, Utc, Q_s, R_s):
            """Shared advance core (merged/complex domain). With
            plant_impl="pallas" the fleet's plant propagators are computed by
            ONE Pallas expm kernel call (ops/pallas_expm.py): assemble the B
            generators -i dt (H0_b + sum_i u_bi H1_bi), batch-expm them on
            lanes, then run the per-lane advance through PropagatedPlant."""
            if self.plant_impl == "pallas":
                from ..ops.pallas_expm import expm_pallas

                step_fn = self._mk_prop(
                    dataclasses.replace(self.config, single_shot=True, sqp_unroll=1)
                )(Q_s, R_s)
                # the control the advance will apply: U_opt[:, 0] per lane
                u_apply = s[3][:, :, 0]                       # (B, dim_u)
                Hs = plants.H0 + jnp.sum(
                    u_apply[:, :, None, None].astype(plants.H1s.real.dtype)
                    * plants.H1s, axis=1)                     # (B, d, d)
                Us = expm_pallas((-1j * float(self.config.dt)) * Hs,
                                 max_squarings=self.pallas_max_squarings,
                                 taylor_k=self.pallas_taylor_k,
                                 interpret=self.pallas_interpret)
                adv_plants = PropagatedPlant(base=plants, U=Us)
            else:
                step_fn = self._mk_steady(Q_s, R_s)
                adv_plants = plants

            def one(c, si, p, m):
                return step_fn.advance(c, si, step, p, m, Xtc, Utc)

            return jax.vmap(one, in_axes=(0, 0, 0, 0))(carry, s, adv_plants, model)

        def adv_prog(carry_s, s_s, step, plants_s, model_s, Xt_s, Ut, Q_s_, R_, Qf_s_):
            carry = merge_cx(carry_s)
            s = merge_cx(s_s)
            plants = merge_cx(plants_s)
            model = merge_cx(model_s)
            Xt = merge_cx(Xt_s)
            Q = merge_cx(Q_s_)
            Qf = merge_cx(Qf_s_)
            Q_s, R_s = costs(Q, R_, Qf)
            out = do_advance(carry, s, step, plants, model,
                             jnp.asarray(Xt, Q.dtype), jnp.asarray(Ut), Q_s, R_s)
            return resplit(out)

        def make_step(mk, n_iters: int, k: int = 1):
            """Fused k-step program on the XLA QP path: k repetitions of
            (sqp_init + n_iters vmapped SQP iterations + advance) in one
            dispatch. Built from the same pieces as the per-program path -
            including do_advance, so plant_impl="pallas" is honored here
            too. The QP dual warm-start (y, rho) flows between the fused
            steps in-graph and in/out of the program at its boundary."""
            def prog(carry_s, duals, step, plants_s, model_s, Xt_s, Ut, Q_s_, R_, Qf_s_):
                carry = merge_cx(carry_s)
                plants = merge_cx(plants_s)
                model = merge_cx(model_s)
                Xt = merge_cx(Xt_s)
                Q = merge_cx(Q_s_)
                Qf = merge_cx(Qf_s_)
                Q_s, R_s = costs(Q, R_, Qf)
                step_fn = mk(Q_s, R_s)
                Xtc = jnp.asarray(Xt, Q.dtype)
                Utc = jnp.asarray(Ut)
                outs = None
                for j in range(k):
                    stp = step + j
                    s = jax.vmap(step_fn.sqp_init)(carry, duals)
                    for _ in range(n_iters):
                        s = jax.vmap(
                            lambda c, si, p, m: step_fn.sqp_iter(si, c, stp, p, m, Xtc, Utc),
                            in_axes=(0, 0, 0, 0))(carry, s, plants, model)
                    carry, model, outs = do_advance(carry, s, stp, plants, model,
                                                    Xtc, Utc, Q_s, R_s)
                    duals = outs[5]
                return resplit((carry, model, outs))
            return jax.jit(prog)

        # --- fleet-batched Pallas QP iteration core -----------------------
        # One SQP iteration with the fleet's QPs solved by ONE kernel call:
        # vmapped per-lane linearize+condense+assemble, one boxqp_pallas
        # dispatch, vmapped line-search/blend tail. The kernel runs the same
        # warm-started, rho-rebalanced fixed-iteration ADMM as
        # solve_boxqp_fixed and its acceptance rule, so qp_impl="pallas" and
        # qp_backend="ns" are interchangeable.
        cfgH = self.config.horizon
        warm_duals = self.config.qp_warm_duals

        def pallas_sqp_iter(step_fn, Q_s, R_s, single_shot, qp,
                            carry, s, step, plants, model, Xtc, Utc,
                            kinv0=None, want_kinv=False):
            """One fleet SQP iteration via the QP kernel (merged domain).

            Kernel selection by QP size n = H*dim_u: the fully-unrolled
            sublane-packed kernel at n <= 16 (flagship-sized - flat FMA
            chain, 8x lane packing), the looped large-n kernel beyond
            (boxqp_pallas_big - covers every preset up to cnot's n = 150
            at its full ADMM budget). `qp` is the phase's BoxQPParams
            (steady programs may run a reduced dual-warm-started budget);
            python scalars are extracted here because struct-dataclass
            leaves closed over inside jit become tracers, which pallas
            kernels must receive as static parameters."""
            from ..ops.pallas_qp import boxqp_pallas, boxqp_pallas_big, boxqp_accept
            from ..ops.bilinear import model_along_traj
            from ..solvers.condense import qp_data, qp_finish, QPResult
            from .driver import sqp_update_from_qp

            qp_iters = int(qp.max_iter)
            qp_rounds = int(qp.n_rounds)
            qp_rho0 = float(qp.rho0)
            qp_sigma = float(qp.sigma)
            qp_alpha = float(qp.alpha)
            qp_scale = bool(qp.scale)

            # Riccati exact K-inverse (BoxQPParams.kinv="riccati"): the
            # large-n kernels' dominant serial cost is the cold NS inverse
            # chain; the per-lane (A_s, B_s) linearization that built P is
            # handed (real-embedded) to the kernel wrapper so round 1's
            # inverse comes from one exact LQR factorization instead
            # (solvers/riccati.py; VERDICT r4 item 2). Inert at "ns".
            n_qp_static = cfgH * self.config.dim_u
            kind_res = (self.qp_kernel if self.qp_kernel != "auto"
                        else ("small" if n_qp_static <= 16 else "big"))
            use_ric = (kind_res != "small"
                       and qp.kinv in ("riccati", "riccati_pscan"))

            def pre(c, si, p, m):
                X_ref, U_ref, bm, lift_x, u_prev, _ = step_fn.context(
                    c, step, p, m, Xtc, Utc)
                Xg, Ug = si[0], si[1]
                A_s, B_s, D_s = model_along_traj(bm, Xg[:, :cfgH], Ug)
                P, q, lb, ub, w, M = qp_data(
                    lift_x, X_ref, U_ref, Q_s, R_s, A_s, B_s, D_s,
                    u_prev=u_prev, sat=self.sat, du=self.du, unroll=True)
                if use_ric:
                    return P, q, lb, ub, w, M, X_ref, U_ref, A_s, B_s
                return P, q, lb, ub, w, M, X_ref, U_ref

            pre_out = jax.vmap(pre)(carry, s, plants, model)
            P, q, lb, ub, w, M, X_ref, U_ref = pre_out[:8]
            # warm start from the current guess, time-major like condense
            Ug = s[1]
            U_warm = jnp.swapaxes(Ug, 1, 2).reshape(Ug.shape[0], -1)

            # fleet-batched kernel solve (the hot op); with qp_warm_duals the
            # carried (y, rho) from the previous solve seed the ADMM
            n_qp = P.shape[-1]
            kind = self.qp_kernel
            if kind == "auto":
                # small (fully-unrolled in-kernel Gauss-Jordan) wherever it
                # compiles (n <= 16): the round-4 within-process ROLLOUT A/B
                # on the chip (experiments/logs/r4_kernels.log) measured
                # small 11,526 r/s vs big_unroll 6,238 / big 6,348 at
                # flagship B=8192 - the ONE-kernel-launch-per-solve form
                # wins ~2x over the XLA-NS-inverse forms, settling the
                # round-3 session conflict (the lost session-1 kernel-level
                # 2.2-2.7x for big_unroll did not hold at the rollout level
                # in either committed session; advisor finding confirmed).
                # Beyond n = 16 the unrolled program explodes - use the
                # looped large-n kernel (fori_loop over iters; deep budgets
                # cost loop trips, not program size).
                kind = "small" if n_qp <= 16 else "big"
            if kind == "small" and n_qp > 16:
                raise ValueError(
                    f"qp_kernel='small' is fully unrolled and uncompilable at "
                    f"n_qp={n_qp} (> 16); use 'big'/'big_unroll'/'auto'")
            extra = {} if kind == "small" else {
                "unroll_iters": kind == "big_unroll",
                "ns_iters": int(qp.ns_iters)}
            if kind != "small" and qp.kinv == "gj":
                # exact Gauss-Jordan K-inverse outside the kernel
                # (utils/linalg.gj_inverse): kills the kernels' measured
                # per-solve fixed cost (experiments/logs/r5_roofline.log)
                extra["kinv_method"] = "gj"
            if use_ric:
                from ..solvers.riccati import embed_costs, embed_ltv

                A_s_b, B_s_b = pre_out[8], pre_out[9]
                Ar_b, Br_b = jax.vmap(embed_ltv)(A_s_b, B_s_b)
                Qr_s, Rr_s = embed_costs(Q_s, R_s)
                f32 = lambda a: jnp.asarray(a, jnp.float32)
                extra["lqr_data"] = (f32(Ar_b), f32(Br_b),
                                     f32(Qr_s), f32(Rr_s))
                extra["ns_polish"] = int(qp.ns_polish)
                extra["ns_refresh"] = int(qp.ns_refresh)
                extra["lqr_unroll"] = bool(qp.unroll)
                extra["lqr_pscan"] = qp.kinv == "riccati_pscan"
            # K-inverse carry (MPCConfig.qp_warm_kinv, steady programs only -
            # the carry-enabled program variants pass kinv0/want_kinv): warm-
            # started NS refresh in place of the cold inverse chain. Left off
            # the call entirely otherwise so the historical programs (and
            # their remote-compile cache entries) are byte-identical.
            if kind != "small" and (kinv0 is not None or want_kinv):
                extra["ns_refresh"] = int(qp.ns_refresh)
                if kinv0 is not None:
                    extra["kinv0"] = kinv0
            solve = boxqp_pallas if kind == "small" else boxqp_pallas_big
            # carried duals seed single-shot (steady) solves only - warm-phase
            # SQP iterations run cold (see mpc/driver.py sqp_iter rationale)
            use_duals = warm_duals and single_shot
            Uvec, aux = solve(P, q, lb, ub, x0=U_warm,
                              y0=s[8] if use_duals else None,
                              rho0=s[9] if use_duals else None,
                              iters=qp_iters, rounds=qp_rounds,
                              rho_scale=qp_rho0, sigma=qp_sigma,
                              alpha=qp_alpha,
                              eps_abs=float(qp.eps_abs), eps_rel=float(qp.eps_rel),
                              acc_abs=float(qp.accept_abs), acc_rel=float(qp.accept_rel),
                              interpret=self.pallas_interpret,
                              return_aux=True, scale=qp_scale, **extra)
            Uvec = Uvec.astype(P.dtype)
            conv = boxqp_accept(aux, float(qp.eps_abs), float(qp.eps_rel),
                                float(qp.accept_abs), float(qp.accept_rel))

            def post(si, Uv, ok, y_i, rho_i, wi, Mi, X_ref_i, U_ref_i):
                X_opt, U_opt, obj = qp_finish(wi, Mi, Uv, X_ref_i, U_ref_i, Q_s, R_s)
                res = QPResult(X=X_opt, U=U_opt, obj=obj,
                               iters=jnp.asarray(qp_iters * qp_rounds),
                               converged=ok, y=y_i, rho=rho_i)
                s_new = sqp_update_from_qp(si, res, X_ref_i, U_ref_i, Q_s, R_s,
                                           jnp.asarray(single_shot),
                                           self.config.step_tol)
                done_prev = si[6]
                return tuple(jnp.where(done_prev, a, b) for a, b in zip(si, s_new))

            s_new = jax.vmap(post)(s, Uvec, conv, aux.y, aux.rho, w, M, X_ref, U_ref)
            if not want_kinv:
                return s_new
            # carry freeze mirrors the dual carriers (sqp_update_from_qp):
            # an accepted solve hands its refreshed inverse forward, a failed
            # one keeps the previous carry (a failed lane's refresh may be a
            # guard fallback at the short budget). A cold solve's inverse is
            # full-budget NS - always usable.
            kinv_new = aux.kinv
            if kinv0 is not None:
                kinv_new = jnp.where(conv[:, None, None], kinv_new, kinv0)
            return s_new, kinv_new

        def make_iter_pallas(mk, single_shot: bool, qp):
            def prog(carry_s, s_s, step, plants_s, model_s, Xt_s, Ut, Q_s_, R_, Qf_s_):
                carry = merge_cx(carry_s)
                s = merge_cx(s_s)
                plants = merge_cx(plants_s)
                model = merge_cx(model_s)
                Xt = merge_cx(Xt_s)
                Q = merge_cx(Q_s_)
                Qf = merge_cx(Qf_s_)
                Q_s, R_s = costs(Q, R_, Qf)
                step_fn = mk(Q_s, R_s)
                s_new = pallas_sqp_iter(step_fn, Q_s, R_s, single_shot, qp,
                                        carry, s, step, plants, model,
                                        jnp.asarray(Xt, Q.dtype), jnp.asarray(Ut))
                return resplit(s_new)

            return jax.jit(prog)

        def make_step_pallas(mk, single_shot: bool, qp, n_iters: int, k: int = 1,
                             kinv_mode: str = "none"):
            """Fused k-step program on the Pallas QP path: k repetitions of
            (sqp_init + n_iters kernel-solved SQP iterations + advance) in
            ONE dispatch (the steady state collapses to n_iters=1, so each
            steady step chunk is a single program launch). The QP dual
            warm-start (y, rho) flows between fused steps in-graph and
            in/out of the program at its boundary.

            kinv_mode ("none"/"cold"/"warm") selects the K-inverse carry
            form (MPCConfig.qp_warm_kinv, steady programs only): "cold" =
            the chain's ENTRY program (first solve computes the full cold
            inverse, later fused solves refresh from it in-graph; returns
            the carry), "warm" = the cruise program (takes the carry as an
            extra operand, every solve refreshes). "none" = the historical
            carry-free program, byte-identical dispatch."""
            def body(carry, duals, kinv, step, plants, model, Xtc, Utc, Q_s, R_s):
                step_fn = mk(Q_s, R_s)
                outs = None
                for j in range(k):
                    stp = step + j
                    s = jax.vmap(step_fn.sqp_init)(carry, duals)
                    for _ in range(n_iters):
                        if kinv_mode == "none":
                            s = pallas_sqp_iter(step_fn, Q_s, R_s, single_shot,
                                                qp, carry, s, stp, plants,
                                                model, Xtc, Utc)
                        else:
                            s, kinv = pallas_sqp_iter(step_fn, Q_s, R_s,
                                                      single_shot, qp, carry,
                                                      s, stp, plants, model,
                                                      Xtc, Utc, kinv0=kinv,
                                                      want_kinv=True)
                    carry, model, outs = do_advance(carry, s, stp, plants,
                                                    model, Xtc, Utc, Q_s, R_s)
                    duals = outs[5]
                return carry, model, outs, kinv

            def prep(carry_s, plants_s, model_s, Xt_s, Q_s_, R_, Qf_s_):
                carry = merge_cx(carry_s)
                plants = merge_cx(plants_s)
                model = merge_cx(model_s)
                Xt = merge_cx(Xt_s)
                Q = merge_cx(Q_s_)
                Qf = merge_cx(Qf_s_)
                Q_s, R_s = costs(Q, R_, Qf)
                return carry, plants, model, jnp.asarray(Xt, Q.dtype), Q_s, R_s

            if kinv_mode == "warm":
                def prog(carry_s, duals, kinv, step, plants_s, model_s, Xt_s,
                         Ut, Q_s_, R_, Qf_s_):
                    carry, plants, model, Xtc, Q_s, R_s = prep(
                        carry_s, plants_s, model_s, Xt_s, Q_s_, R_, Qf_s_)
                    carry, model, outs, kinv = body(
                        carry, duals, kinv, step, plants, model, Xtc,
                        jnp.asarray(Ut), Q_s, R_s)
                    return resplit((carry, model, outs, kinv))
            else:
                def prog(carry_s, duals, step, plants_s, model_s, Xt_s,
                         Ut, Q_s_, R_, Qf_s_):
                    carry, plants, model, Xtc, Q_s, R_s = prep(
                        carry_s, plants_s, model_s, Xt_s, Q_s_, R_, Qf_s_)
                    carry, model, outs, kinv = body(
                        carry, duals, None, step, plants, model, Xtc,
                        jnp.asarray(Ut), Q_s, R_s)
                    if kinv_mode == "cold":
                        return resplit((carry, model, outs, kinv))
                    return resplit((carry, model, outs))

            return jax.jit(prog)

        progs = {
            "init": jax.jit(init_prog),
            "advance": jax.jit(adv_prog),
        }
        qp_warm = self.config.qp_params
        qp_steady = self._steady_qp_params
        if self.qp_impl == "pallas":
            progs["iter_warm"] = make_iter_pallas(self._mk_warm,
                                                  single_shot=False, qp=qp_warm)
            progs["iter_steady"] = make_iter_pallas(self._mk_steady,
                                                    single_shot=True, qp=qp_steady)
        else:
            progs["iter_warm"] = make_iter(self._mk_warm)
            progs["iter_steady"] = make_iter(self._mk_steady)
        if self.granularity in ("step", "mixed"):
            if self.qp_impl == "pallas":
                progs["step_steady"] = make_step_pallas(self._mk_steady,
                                                        single_shot=True,
                                                        qp=qp_steady, n_iters=1)
                if self.steady_fuse > 1:
                    progs["step_steady_k"] = make_step_pallas(
                        self._mk_steady, single_shot=True, qp=qp_steady,
                        n_iters=1, k=self.steady_fuse)
                if self._kinv_carry:
                    # K-inverse-carry variants of the steady programs: the
                    # chain entry (cold first inverse, returns the carry) and
                    # the cruise form (carry in/out). jit is lazy, so the
                    # carry-free programs above cost nothing unless
                    # dispatched.
                    for suff, mode in (("_cold", "cold"), ("_warm", "warm")):
                        progs["step_steady" + suff] = make_step_pallas(
                            self._mk_steady, single_shot=True, qp=qp_steady,
                            n_iters=1, kinv_mode=mode)
                        if self.steady_fuse > 1:
                            progs["step_steady_k" + suff] = make_step_pallas(
                                self._mk_steady, single_shot=True,
                                qp=qp_steady, n_iters=1, k=self.steady_fuse,
                                kinv_mode=mode)
                if self.granularity == "step":
                    for n_it in sorted(set(self._warm_iters)):
                        progs[f"step_warm_{n_it}"] = make_step_pallas(
                            self._mk_warm, single_shot=False, qp=qp_warm,
                            n_iters=n_it)
            else:
                progs["step_steady"] = make_step(self._mk_steady, n_iters=1)
                if self.steady_fuse > 1:
                    progs["step_steady_k"] = make_step(self._mk_steady, n_iters=1,
                                                       k=self.steady_fuse)
                if self.granularity == "step":
                    for n_it in sorted(set(self._warm_iters)):
                        progs[f"step_warm_{n_it}"] = make_step(
                            self._mk_warm, n_iters=n_it)
        return progs

    def _warm_iters_for(self, step: int) -> int:
        """Per-warm-step SQP iteration budget (tuple indexed by step,
        clamped to its last entry)."""
        return self._warm_iters[min(step, len(self._warm_iters) - 1)]

    @staticmethod
    def _fetch_state_leaf(x):
        """Device->host fetch of one checkpoint leaf, chip-safe: int/bool
        transfers are unimplemented on the axon backend, so those cast
        through f32 on device (CLAUDE.md); CxPair re/im parts are already
        real leaves by the time the tree is flattened."""
        if isinstance(x, np.ndarray):
            return x
        xj = jnp.asarray(x)
        dt = np.dtype(xj.dtype)
        if dt.kind in "ib":
            return np.asarray(xj.astype(jnp.float32)).astype(dt)
        return np.asarray(xj)

    @staticmethod
    def _combine_rec(prefix, new):
        """Concatenate two per-step record dicts along their step axes."""
        if prefix is None:
            return new
        if new is None:
            return prefix
        ax = {"xs": 2, "us": 2, "objs": 1, "iters": 1, "active": 1}
        return {k: np.concatenate([prefix[k], new[k]], axis=ax[k])
                for k in prefix}

    def _save_ckpt(self, path, state, step, rec):
        """Atomically persist the loop state (+ the recorded prefix) as one
        npz: the round-trip is exact, so a resumed run is lane-for-lane
        identical to an uninterrupted one (tests/test_mpc_e2e.py)."""
        leaves = jax.tree.leaves(state)
        data = {f"l{i}": self._fetch_state_leaf(l) for i, l in enumerate(leaves)}
        data["__step__"] = np.asarray(step, np.int64)
        if rec is not None:
            for k, v in rec.items():
                if np.iscomplexobj(v):
                    data[f"rec_{k}_re"] = np.ascontiguousarray(v.real)
                    data[f"rec_{k}_im"] = np.ascontiguousarray(v.imag)
                else:
                    data[f"rec_{k}"] = v
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **data)
        os.replace(tmp, path)

    def run(self, x0, model_state, plants, X_targ, U_targ, Q, R, Qf, keys,
            record: bool = True, checkpoint_path: str | None = None,
            checkpoint_every: int = 0, resume: bool = True,
            progress_every: int = 0, verbose: bool = False):
        """Run the batched receding-horizon loop.

        :param x0: (dim_e,) shared or (B, dim_e) per-lane initial states.
        :param plants: stacked plant pytree with leading batch axis B.
        :param keys: (B, 2) per-lane PRNG keys.
        :param checkpoint_path: optional .npz file; with checkpoint_every=k
            the full loop state (carry, model state, QP duals, step cursor,
            recorded trajectory prefix) is persisted atomically every k
            steps, chip-safely (no complex/int transfers). The reference
            has no persistence at all (SURVEY.md section 5.6); on this
            environment's TPU tunnel - which drops for hours at a time - a
            200-step cnot fleet is not runnable without it.
        :param resume: when True (default) and checkpoint_path exists, the
            loop restores and continues from the saved step; the final
            outputs are exactly those of an uninterrupted run. Pass False
            to overwrite and start cold.
        :param progress_every: emit a heartbeat line to stderr every k host
            steps (step cursor, wall throughput, fleet done-fraction) - the
            tqdm analogue (reference mpc.py:161) for long fleets whose
            checkpoints are minutes apart. Each heartbeat syncs one small
            device fetch; 0 (default) = silent.
        :param verbose: per-SOLVE diagnostics to stderr - the analogue of
            the reference's `verbose` passthrough to the OSQP solver
            (reference mpc.py:128 -> optimize.py:59): after every step the
            fleet's QP objective (mean/max) and the running failure count
            are printed. Syncs the device each step - debugging only.
        :return: dict with final_x (B, dim_e) complex, exit_code (B,),
            and - when record=True - the reference's full [xs, us] contract
            (reference mpc.py:294-304): xs (B, dim_e, n_steps+1) per-step
            states including x0, us (B, dim_u, n_steps), plus objs,
            sqp_iters, n_valid, model_state (final).
        """
        cfg = self.config
        B = int(jax.tree.leaves(plants)[0].shape[0])
        x0 = np.asarray(x0)
        cdtype = np.complex64 if jnp.zeros(0).dtype == jnp.float32 else np.complex128
        if x0.ndim == 1:
            x0 = np.tile(x0[None, :], (B, 1))
        x0 = x0.astype(cdtype)
        H = cfg.horizon

        # SDRE-style initial guess in MODEL space: X_guess = repeat(lift(x0))
        # (reference mpc.py:135-142). Computed host-side on the CPU backend
        # so no complex array crosses the accelerator boundary.
        with jax.default_device(jax.devices("cpu")[0]):
            lx0 = np.asarray(jax.vmap(self._lift_fn)(
                jax.tree.map(jnp.asarray, plants), jnp.asarray(x0))).astype(cdtype)
        Xg = np.repeat(lx0[:, :, None], H + 1, axis=2)
        Ug = np.zeros((B, cfg.dim_u, H), x0.real.dtype)
        if cfg.lqr_seed:
            # LQR-seeded warm-phase guess (see driver.lqr_seed_guess),
            # computed host-side on the CPU backend like the SDRE init above.
            # The model/targets/costs are lane-identical at init, so when the
            # lifted initial states are too (the fleet case: one x0, per-lane
            # plant detunings) ONE seed is solved and tiled - free at any B.
            from .driver import lqr_seed_guess

            with jax.default_device(jax.devices("cpu")[0]):
                A0 = jnp.asarray(np.asarray(model_state.A))
                Q_sj = jnp.concatenate(
                    [jnp.tile(jnp.asarray(Q)[None], (H, 1, 1)),
                     jnp.asarray(Qf)[None]], axis=0)
                R_sj = jnp.tile(jnp.asarray(R)[None], (H, 1, 1))
                if np.all(lx0 == lx0[0]):
                    Xs, Us = lqr_seed_guess(A0, jnp.asarray(lx0[0]),
                                            jnp.asarray(X_targ), jnp.asarray(U_targ),
                                            Q_sj, R_sj, self.sat, cfg)
                    Xg = np.tile(np.asarray(Xs)[None], (B, 1, 1)).astype(cdtype)
                    Ug = np.tile(np.asarray(Us)[None], (B, 1, 1)).astype(x0.real.dtype)
                else:
                    seed = jax.vmap(lambda l: lqr_seed_guess(
                        A0, l, jnp.asarray(X_targ), jnp.asarray(U_targ),
                        Q_sj, R_sj, self.sat, cfg))(jnp.asarray(lx0))
                    Xg = np.asarray(seed[0]).astype(cdtype)
                    Ug = np.asarray(seed[1]).astype(x0.real.dtype)
        u_last = np.tile(np.asarray(U_targ)[None, :, 0], (B, 1)).astype(x0.real.dtype)
        carry = split_cx((
            x0, x0.copy(), Xg, Ug, u_last, np.asarray(keys),
            np.zeros((B,), np.int32), np.zeros((B,), bool),
        ))

        # per-lane model state (see _build_programs note); tiled in numpy so
        # no complex array touches the device outside the split boundary
        model_b = jax.tree.map(
            lambda l: np.tile(np.asarray(l)[None], (B,) + (1,) * np.asarray(l).ndim),
            model_state,
        )
        args = (split_cx(jax.tree.map(np.asarray, plants)),
                split_cx(model_b), split_cx(np.asarray(X_targ)),
                np.asarray(U_targ), split_cx(np.asarray(Q)), np.asarray(R),
                split_cx(np.asarray(Qf)))
        progs = self._programs
        model_s = args[1]

        # QP dual warm-start carriers, device-resident between dispatches
        # (cold zeros; rho = 0 is the "solver default" sentinel). Inert
        # unless cfg.qp_warm_duals - the programs then seed each solve from
        # the previous one's shifted (y, rho).
        rdt = x0.real.dtype
        duals = (np.zeros((B, cfg.dim_u * H), rdt), np.zeros((B,), rdt))
        # K-inverse carry handle (config.qp_warm_kinv + Pallas big kernel):
        # None until the first steady dispatch returns it, then a
        # device-resident (B, n_qp, n_qp) f32 handed to the "warm" program
        # variants. Deliberately NOT checkpointed - a resumed run re-enters
        # through the cold program (the refresh re-converges in one solve;
        # final iterates agree to NS tolerance, not bit-exactly).
        kinv = None
        use_kinv = self._kinv_carry and self.granularity in ("step", "mixed")
        # Measurement-aligned cold re-entry: with measure_freq = m > 1 the
        # observed state re-syncs with the (noisy) plant at every m-th step,
        # and the solve right after a measurement sees a JUMPED linearization
        # - the carried inverse is out of the NS contraction region there
        # (measured: freq's m=5 spikes have guard residual 19-75 vs 0.1-0.3
        # between measurements, experiments/sweep_kinv_chain.py; carrying
        # across them killed every lane on chip, r4_warm_kinv.log). The host
        # knows the cadence, so it re-enters through the cold program at
        # every step = 0 (mod m) and never lets a chunk contain an interior
        # spike. With steady_fuse == m the chunks align exactly: one
        # cold-entry chunk per measurement period, the carry living in-graph
        # only.
        kinv_m = int(cfg.measure_freq) if use_kinv else 0

        def _spike(s: int) -> bool:
            return kinv_m > 1 and s % kinv_m == 0

        # int/bool device->host fetches are unimplemented on the axon
        # backend: route them through an eager f32 cast on device
        fetch_i = lambda a: np.asarray(jnp.asarray(a).astype(jnp.float32)).astype(np.int32)
        fetch_x = lambda o: (np.asarray(o.re) + 1j * np.asarray(o.im)
                             if isinstance(o, CxPair) else np.asarray(o))

        def rec_stacks(per):
            """per-step device outs -> host record dict (step axis last/1)."""
            if not per:
                return None
            return {
                "xs": np.stack([fetch_x(o[0]) for o in per], axis=2),
                "us": np.stack([np.asarray(o[1]) for o in per], axis=2),
                "objs": np.stack([np.asarray(o[2]) for o in per], axis=1),
                "iters": np.stack([fetch_i(o[3]) for o in per], axis=1),
                "active": np.stack([fetch_i(o[4]) for o in per], axis=1),
            }

        per_step = []
        rec_prefix = None  # host-side record restored/flushed at checkpoints
        step = 0
        if checkpoint_path and resume and os.path.exists(checkpoint_path):
            data = np.load(checkpoint_path)
            state = (carry, model_s, duals)
            leaves, treedef = jax.tree.flatten(state)
            loaded = [np.asarray(data[f"l{i}"],
                                 dtype=np.asarray(l).dtype).reshape(np.asarray(l).shape)
                      for i, l in enumerate(leaves)]
            carry, model_s, duals = jax.tree.unflatten(treedef, loaded)
            step = int(data["__step__"])
            if "rec_xs_re" in data:
                rec_prefix = {
                    "xs": np.asarray(data["rec_xs_re"]) + 1j * np.asarray(data["rec_xs_im"]),
                    "us": np.asarray(data["rec_us"]),
                    "objs": np.asarray(data["rec_objs"]),
                    "iters": np.asarray(data["rec_iters"]),
                    "active": np.asarray(data["rec_active"]),
                }
        last_saved = step
        hb_t0, hb_step0, last_hb = time.time(), step, step

        def vprint(after_step, outs_v, carry_v):
            objs = np.asarray(outs_v[2])
            iters = fetch_i(outs_v[3])
            fails = int((fetch_i(carry_v[6]) >= 2).sum())
            print(f"[solve] step {after_step:>3d}: obj mean={objs.mean():.4e} "
                  f"max={objs.max():.4e} sqp_iters={int(iters.max())} "
                  f"qp_fails={fails}/{B}", file=sys.stderr, flush=True)

        while step < cfg.n_steps:
            if progress_every and step - last_hb >= progress_every:
                # done flags are bool on device; fetch through f32 (chip-safe)
                done_frac = float(np.asarray(
                    jnp.asarray(carry[7]).astype(jnp.float32)).mean())
                dt = max(time.time() - hb_t0, 1e-9)
                print(f"[hostloop] step {step}/{cfg.n_steps} B={B} "
                      f"{(step - hb_step0) / dt:.2f} steps/s "
                      f"({B * (step - hb_step0) / dt:.0f} lane-steps/s) "
                      f"done_frac={done_frac:.3f} elapsed={dt:.1f}s",
                      file=sys.stderr, flush=True)
                last_hb = step
            warm = (step <= 1) if cfg.warm_start else True
            step_arr = np.asarray(step, np.int32)
            fused = (self.granularity == "step"
                     or (self.granularity == "mixed" and not warm))
            # k-step chunk: only when not recording (a chunk returns only
            # its last step's outputs)
            k = self.steady_fuse
            if _spike(step):
                kinv = None  # cold re-entry at the post-measurement solve
            chunk_ok = (fused and not warm and not record and k > 1
                        and step + k <= cfg.n_steps)
            if chunk_ok and kinv_m > 1:
                # a chunk may START at a spike (its first solve is the cold
                # one) but must not contain an interior spike
                chunk_ok = all((step + j) % kinv_m for j in range(1, k))
            if chunk_ok:
                if use_kinv and kinv is None:
                    carry, model_s, outs, kinv = progs["step_steady_k_cold"](
                        carry, duals, step_arr, args[0], model_s, *args[2:])
                elif use_kinv:
                    carry, model_s, outs, kinv = progs["step_steady_k_warm"](
                        carry, duals, kinv, step_arr, args[0], model_s,
                        *args[2:])
                else:
                    carry, model_s, outs = progs["step_steady_k"](
                        carry, duals, step_arr, args[0], model_s, *args[2:])
                duals = outs[5]
                step += k
                if verbose:
                    vprint(step - 1, outs, carry)
                if (checkpoint_path and checkpoint_every
                        and step - last_saved >= checkpoint_every
                        and step < cfg.n_steps):
                    self._save_ckpt(checkpoint_path, (carry, model_s, duals),
                                    step, rec_prefix)
                    last_saved = step
                continue
            if fused:
                if not warm and use_kinv and kinv is None:
                    carry, model_s, outs, kinv = progs["step_steady_cold"](
                        carry, duals, step_arr, args[0], model_s, *args[2:])
                elif not warm and use_kinv:
                    carry, model_s, outs, kinv = progs["step_steady_warm"](
                        carry, duals, kinv, step_arr, args[0], model_s,
                        *args[2:])
                else:
                    prog = (progs[f"step_warm_{self._warm_iters_for(step)}"]
                            if warm else progs["step_steady"])
                    carry, model_s, outs = prog(carry, duals, step_arr,
                                                args[0], model_s, *args[2:])
            else:
                it_prog = progs["iter_warm"] if warm else progs["iter_steady"]
                n_it = self._warm_iters_for(step) if warm else 1
                s = progs["init"](carry, duals)
                for _ in range(n_it):
                    s = it_prog(carry, s, step_arr, args[0], model_s, *args[2:])
                carry, model_s, outs = progs["advance"](carry, s, step_arr, args[0],
                                                        model_s, *args[2:])
            duals = outs[5]
            if verbose:
                vprint(step, outs, carry)
            if record:
                per_step.append(outs)
            step += 1
            if (checkpoint_path and checkpoint_every
                    and step - last_saved >= checkpoint_every
                    and step < cfg.n_steps):
                # flush recorded outs to host so the checkpoint carries the
                # full prefix (and their device buffers can be freed)
                rec_prefix = self._combine_rec(rec_prefix, rec_stacks(per_step))
                per_step = []
                self._save_ckpt(checkpoint_path, (carry, model_s, duals),
                                step, rec_prefix)
                last_saved = step

        jax.block_until_ready(carry[0].re)
        final_x = np.asarray(carry[0].re) + 1j * np.asarray(carry[0].im)
        out = {
            "final_x": final_x,
            "exit_code": fetch_i(carry[6]),
            "model_state": merge_cx(jax.tree.map(np.asarray, model_s)),
        }
        if record:
            # per-step states: each advance's outs[0] (x after the step, the
            # same quantity the scan driver records), prepended with x0 -
            # the reference's xs contract (reference mpc.py:294-304);
            # checkpoint-restored prefixes concatenate ahead of this run's
            # steps so a resumed run returns the identical full trajectory
            rec = self._combine_rec(rec_prefix, rec_stacks(per_step))
            xs = np.concatenate([x0[:, :, None], rec["xs"]], axis=2)
            out.update(xs=xs, us=rec["us"], objs=rec["objs"],
                       sqp_iters=rec["iters"],
                       n_valid=rec["active"].astype(np.int32).sum(axis=1))
        if checkpoint_path and os.path.exists(checkpoint_path):
            os.remove(checkpoint_path)  # completed: the checkpoint is stale
        return out
