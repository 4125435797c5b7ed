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
`make_mpc_step` pieces as the scan driver, so semantics are identical.

Intended pairing: config.qp_backend="ns" + quantum_step_taylor, making each
program a flat chain of batched matmuls (no Cholesky/LU/while) - the form
the TPU backend executes and the MXU-shaped form for scenario fleets.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .driver import MPCConfig, make_mpc_step
from ..plants.quantum import quantum_step, lift_state, proj_state
from ..utils.cxio import split_cx, CxPair, merge_cx


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
                 warm_sqp_iters: int = 12):
        self.config = config
        self.sat = sat
        self.du = du
        self.warm_sqp_iters = warm_sqp_iters
        mk = lambda cfg: lambda Q_s, R_s: make_mpc_step(
            cfg, Q_s, R_s, sat, du,
            plant_step_fn=plant_step_fn, lift_fn=lift_fn, proj_fn=proj_fn,
            model_update_fn=model_update_fn, exit_condition=exit_condition,
            observe_fn=observe_fn,
        )
        # two SQP-iteration programs: line-searched (warm phase) and
        # single-shot alpha=1 (steady phase, reference warm-start collapse)
        self._mk_warm = mk(dataclasses.replace(config, single_shot=False))
        self._mk_steady = mk(dataclasses.replace(config, single_shot=True))
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

        def init_prog(carry_s):
            carry = merge_cx(carry_s)
            step0 = self._mk_steady(None, None)  # sqp_init needs no costs
            s = jax.vmap(step0.sqp_init)(carry)
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

        def adv_prog(carry_s, s_s, step, plants_s, model_s, Xt_s, Ut, Q_s_, R_, Qf_s_):
            carry = merge_cx(carry_s)
            s = merge_cx(s_s)
            plants = merge_cx(plants_s)
            model = merge_cx(model_s)
            Xt = merge_cx(Xt_s)
            Q = merge_cx(Q_s_)
            Qf = merge_cx(Qf_s_)
            Q_s, R_s = costs(Q, R_, Qf)
            step_fn = self._mk_steady(Q_s, R_s)

            def one(c, si, p, m):
                c_new, m_new, outs = step_fn.advance(c, si, step, p, m,
                                                     jnp.asarray(Xt, Q.dtype), jnp.asarray(Ut))
                return c_new, m_new, outs

            carry_new, model_new, outs = jax.vmap(one, in_axes=(0, 0, 0, 0))(carry, s, plants, model)
            return resplit((carry_new, model_new, outs))

        return {
            "init": jax.jit(init_prog),
            "iter_warm": make_iter(self._mk_warm),
            "iter_steady": make_iter(self._mk_steady),
            "advance": jax.jit(adv_prog),
        }

    def run(self, x0, model_state, plants, X_targ, U_targ, Q, R, Qf, keys,
            record: bool = True):
        """Run the batched receding-horizon loop.

        :param x0: (dim_e,) shared or (B, dim_e) per-lane initial states.
        :param plants: stacked plant pytree with leading batch axis B.
        :param keys: (B, 2) per-lane PRNG keys.
        :return: dict with final_x (B, dim_e) complex, exit_code (B,),
            us ((B, dim_u, n_steps) if record), objs, sqp_iters, n_valid,
            model_state (final).
        """
        cfg = self.config
        B = int(jax.tree.leaves(plants)[0].shape[0])
        x0 = np.asarray(x0)
        cdtype = np.complex64 if jnp.zeros(0).dtype == jnp.float32 else np.complex128
        if x0.ndim == 1:
            x0 = np.tile(x0[None, :], (B, 1))
        x0 = x0.astype(cdtype)
        H = cfg.horizon

        Xg = np.repeat(x0[:, :, None], H + 1, axis=2)
        Ug = np.zeros((B, cfg.dim_u, H), x0.real.dtype)
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

        per_step = []
        for step in range(cfg.n_steps):
            warm = (step <= 1) if cfg.warm_start else True
            it_prog = progs["iter_warm"] if warm else progs["iter_steady"]
            n_it = self.warm_sqp_iters if warm else 1
            step_arr = np.asarray(step, np.int32)
            s = progs["init"](carry)
            for _ in range(n_it):
                s = it_prog(carry, s, step_arr, args[0], model_s, *args[2:])
            carry, model_s, outs = progs["advance"](carry, s, step_arr, args[0],
                                                    model_s, *args[2:])
            if record:
                per_step.append(outs)

        jax.block_until_ready(carry[0].re)
        # int/bool device->host fetches are unimplemented on the axon
        # backend: route them through an eager f32 cast on device
        fetch_i = lambda a: np.asarray(jnp.asarray(a).astype(jnp.float32)).astype(np.int32)
        final_x = np.asarray(carry[0].re) + 1j * np.asarray(carry[0].im)
        out = {
            "final_x": final_x,
            "exit_code": fetch_i(carry[6]),
            "model_state": merge_cx(jax.tree.map(np.asarray, model_s)),
        }
        if record:
            us = np.stack([np.asarray(o[1]) for o in per_step], axis=2)  # (B, dim_u, n)
            objs = np.stack([np.asarray(o[2]) for o in per_step], axis=1)
            iters = np.stack([fetch_i(o[3]) for o in per_step], axis=1)
            active = np.stack([fetch_i(o[4]) for o in per_step], axis=1)
            out.update(us=us, objs=objs, sqp_iters=iters,
                       n_valid=active.astype(np.int32).sum(axis=1))
        return out
