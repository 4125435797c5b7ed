"""TPU probe G: bisect the batched MPC step into pieces to find which op
class raises UNIMPLEMENTED when batched. Each piece is a small program with a
(1,) f32 digest output; each gets its own try/except with an immediate fetch
so the failing dispatch is localized. NOTE: after a failed execution the
backend can wedge, so results after the FIRST failure may be unreliable -
rerun with PB_SKIP=<n> to start from piece n in a fresh process.

Env: PB_BATCH (default 1024), PB_SKIP (default 0), PB_ONLY (comma list).
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, "/root/repo")

batch = int(os.environ.get("PB_BATCH", "1024"))
skip = int(os.environ.get("PB_SKIP", "0"))
only = os.environ.get("PB_ONLY", "")
only = set(only.split(",")) if only else None

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

import mpc4quantum_tpu as m4q
from mpc4quantum_tpu.ops.bilinear import BilinearModel, model_along_traj
from mpc4quantum_tpu.ops.expm import expm_taylor
from mpc4quantum_tpu.solvers.boxqp import ns_inverse, solve_boxqp_fixed, BoxQPParams
from mpc4quantum_tpu.solvers.condense import condense_horizon, _assemble_cost
from mpc4quantum_tpu.plants.quantum import quantum_step_taylor
from mpc4quantum_tpu.utils.cxio import split_cx, merge_cx
from probe_tpu_safe import build, matrix_units, perturbed_rho0, H, DT, ORDER, SAT, DU

model, plants, keys, rho0, X_targ, U_targ, Q, R = build(batch)
cdtype = np.complex64 if jnp.zeros(0).dtype == jnp.float32 else np.complex128
rdtype = np.float32 if cdtype == np.complex64 else np.float64

rng = np.random.default_rng(0)
Xg = np.tile(rho0[None, :, None], (batch, 1, H)).astype(cdtype)
Ug = (0.1 * SAT * rng.normal(size=(batch, 1, H))).astype(rdtype)


def digest(x):
    return float(np.asarray(jnp.mean(jnp.abs(jnp.asarray(x))).astype(jnp.float32).reshape(1))[0])


def stage(name, fn):
    t0 = time.time()
    try:
        out = fn()
        print(f"[OK]   {name} ({time.time() - t0:.1f}s): {out}", flush=True)
        return True
    except Exception as e:
        print(f"[FAIL] {name} ({time.time() - t0:.1f}s): {type(e).__name__}", flush=True)
        for line in traceback.format_exc().splitlines()[-3:]:
            print("       " + line, flush=True)
        return False


PIECES = []


def piece(name):
    def deco(fn):
        PIECES.append((name, fn))
        return fn
    return deco


@piece("g0_transfer_bool_int_uint")
def g0():
    done = np.zeros((batch,), bool)
    code = np.zeros((batch,), np.int32)

    def prog(d, c, k):
        return (d.astype(jnp.float32).sum() + c.astype(jnp.float32).sum()
                + k.astype(jnp.float32).sum()).reshape(1)

    out = jax.jit(prog)(done, code, keys)
    return digest(out)


@piece("g7_plant_step_taylor")
def g7():
    def prog(plants_s, x_s, u):
        plants_m = merge_cx(plants_s)
        x = merge_cx(x_s)
        xn = jax.vmap(lambda p, xi, ui: quantum_step_taylor(p, xi, ui, DT))(
            plants_m, x, u)
        return jnp.mean(jnp.abs(xn)).astype(jnp.float32).reshape(1)

    x0b = np.tile(rho0[None, :], (batch, 1)).astype(cdtype)
    ub = (0.1 * SAT * rng.normal(size=(batch, 1))).astype(rdtype)
    out = jax.jit(prog)(split_cx(plants), split_cx(x0b), ub)
    return digest(out)


@piece("g5_ns_inverse")
def g5():
    A = rng.normal(size=(batch, 10, 10)).astype(rdtype)
    K = np.einsum("bij,bkj->bik", A, A) + 0.5 * np.eye(10, dtype=rdtype)

    def prog(K):
        X = ns_inverse(K, iters=30)
        return jnp.mean(jnp.abs(X)).astype(jnp.float32).reshape(1)

    return digest(jax.jit(prog)(K))


@piece("g6_boxqp_fixed")
def g6():
    A = rng.normal(size=(batch, 10, 10)).astype(rdtype)
    P = np.einsum("bij,bkj->bik", A, A) + 0.5 * np.eye(10, dtype=rdtype)
    q = rng.normal(size=(batch, 10)).astype(rdtype)
    lb = np.full((batch, 10), -0.5, rdtype)
    ub = np.full((batch, 10), 0.5, rdtype)

    def prog(P, q, lb, ub):
        qp = BoxQPParams(max_iter=60, n_rounds=2)
        sol = jax.vmap(lambda Pi, qi, li, ui: solve_boxqp_fixed(Pi, qi, li, ui, params=qp).x)(
            P, q, lb, ub)
        return jnp.mean(jnp.abs(sol)).astype(jnp.float32).reshape(1)

    return digest(jax.jit(prog)(P, q, lb, ub))


@piece("g3_linearize")
def g3():
    def prog(model_s, Xg_s, Ug):
        m = merge_cx(model_s)
        Xgm = merge_cx(Xg_s)
        bmodel = BilinearModel.from_stacked(m.A[:, :4], m.A[:, 4:], 1, ORDER)
        A_s, B_s, D_s = jax.vmap(lambda X, U: model_along_traj(bmodel, X, U))(Xgm, Ug)
        return (jnp.mean(jnp.abs(A_s)) + jnp.mean(jnp.abs(B_s))
                + jnp.mean(jnp.abs(D_s))).astype(jnp.float32).reshape(1)

    return digest(jax.jit(prog)(split_cx(model), split_cx(Xg), Ug))


@piece("g4_condense_assemble")
def g4():
    def prog(model_s, Xg_s, Ug, Xt_s, Q_s_, R_):
        m = merge_cx(model_s)
        Xgm = merge_cx(Xg_s)
        Xt = merge_cx(Xt_s)
        Qm = merge_cx(Q_s_)
        bmodel = BilinearModel.from_stacked(m.A[:, :4], m.A[:, 4:], 1, ORDER)
        Q_s = jnp.concatenate([jnp.tile(Qm[None], (H, 1, 1)), Qm[None]], axis=0)
        R_s = jnp.tile(jnp.asarray(R_)[None], (H, 1, 1))

        def one(X, U, x0):
            A_s, B_s, D_s = model_along_traj(bmodel, X, U)
            w, M = condense_horizon(A_s, B_s, D_s, x0, unroll=True)
            P, q, _ = _assemble_cost(w, M, jnp.asarray(Xt[:, :H + 1], Qm.dtype),
                                     jnp.zeros((1, H), U.dtype), Q_s, R_s)
            return P, q

        P, q = jax.vmap(one)(Xgm, Ug, Xgm[:, :, 0])
        return (jnp.mean(jnp.abs(P)) + jnp.mean(jnp.abs(q))).astype(jnp.float32).reshape(1)

    return digest(jax.jit(prog)(split_cx(model), split_cx(Xg), Ug,
                                split_cx(X_targ), split_cx(Q), R))


@piece("g1_prng")
def g1():
    def prog(k):
        def one(ki):
            k1, k2 = jax.random.split(ki)
            z = jax.random.normal(k2, (4,))
            return z.sum()
        s = jax.vmap(one)(k)
        return jnp.mean(s).astype(jnp.float32).reshape(1)

    return digest(jax.jit(prog)(keys))


@piece("g2_complex_concat_shift")
def g2():
    def prog(Xg_s):
        Xgm = merge_cx(Xg_s)  # (B, 4, H)
        shifted = jnp.concatenate([Xgm[:, :, 1:], Xgm[:, :, -1:]], axis=2)
        return jnp.mean(jnp.abs(shifted)).astype(jnp.float32).reshape(1)

    return digest(jax.jit(prog)(split_cx(Xg)))




# --- finer bisection of g3 (appended after first run) ---
from mpc4quantum_tpu.ops.bilinear import (bilinear_df_dx, bilinear_df_du,
                                          bilinear_f)


def _bmodel_from(m):
    return BilinearModel.from_stacked(m.A[:, :4], m.A[:, 4:], 1, ORDER)


@piece("h1_lift_u")
def h1():
    def prog(model_s, Ug):
        m = merge_cx(model_s)
        bm = _bmodel_from(m)
        out = jax.vmap(lambda U: bm.lift_u(U))(Ug)
        return jnp.mean(jnp.abs(out)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(split_cx(model), Ug))


@piece("h2_df_dx")
def h2():
    def prog(model_s, Ug):
        m = merge_cx(model_s)
        bm = _bmodel_from(m)
        out = jax.vmap(jax.vmap(lambda u: bilinear_df_dx(bm, u), in_axes=1))(Ug)
        return jnp.mean(jnp.abs(out)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(split_cx(model), Ug))


@piece("h3_df_du")
def h3():
    def prog(model_s, Xg_s, Ug):
        m = merge_cx(model_s)
        X = merge_cx(Xg_s)
        bm = _bmodel_from(m)
        out = jax.vmap(jax.vmap(lambda x, u: bilinear_df_du(bm, x, u), in_axes=(1, 1)))(X, Ug)
        return jnp.mean(jnp.abs(out)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(split_cx(model), split_cx(Xg), Ug))


@piece("h4_bilinear_f")
def h4():
    def prog(model_s, Xg_s, Ug):
        m = merge_cx(model_s)
        X = merge_cx(Xg_s)
        bm = _bmodel_from(m)
        out = jax.vmap(jax.vmap(lambda x, u: bilinear_f(bm, x, u), in_axes=(1, 1)))(X, Ug)
        return jnp.mean(jnp.abs(out)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(split_cx(model), split_cx(Xg), Ug))



from mpc4quantum_tpu.ops.library import diff_library_powers, diff_lift_controls


def _mat_stage(upto):
    def prog(model_s, Xg_s, Ug):
        m = merge_cx(model_s)
        X_all = merge_cx(Xg_s)
        bm = _bmodel_from(m)
        dim_x, Lm = 4, bm.polyu_dim
        cdt = bm.N.dtype

        def one(X, U):
            Hh = U.shape[1]
            polyu = bm.lift_u(U).astype(cdt)
            acc = jnp.mean(jnp.abs(polyu))
            if upto >= 2:
                N_flat = jnp.transpose(bm.N, (1, 0, 2)).reshape(Lm, dim_x * dim_x)
                A_s = bm.A[None] + (polyu.T @ N_flat).reshape(Hh, dim_x, dim_x)
                acc = acc + jnp.mean(jnp.abs(A_s))
            if upto >= 3:
                NX = (bm.N.reshape(dim_x * Lm, dim_x) @ X.astype(cdt))
                NX = jnp.transpose(NX.reshape(dim_x, Lm, Hh), (2, 0, 1))
                acc = acc + jnp.mean(jnp.abs(NX))
            if upto >= 4:
                dpowers, dcoefs = diff_library_powers(bm.order, bm.dim_u)
                dpolyu = diff_lift_controls(U, dpowers, dcoefs).astype(cdt)
                B_s = NX @ jnp.transpose(dpolyu, (2, 1, 0))
                acc = acc + jnp.mean(jnp.abs(B_s))
            if upto >= 5:
                D_s = -(B_s @ jnp.transpose(U.astype(cdt), (1, 0))[:, :, None])[:, :, 0]
                acc = acc + jnp.mean(jnp.abs(D_s))
            return acc

        out = jax.vmap(one)(X_all, Ug)
        return jnp.mean(out).astype(jnp.float32).reshape(1)

    return digest(jax.jit(prog)(split_cx(model), split_cx(Xg), Ug))


@piece("m1_polyu")
def m1():
    return _mat_stage(1)


@piece("m2_A_s")
def m2():
    return _mat_stage(2)


@piece("m3_NX")
def m3():
    return _mat_stage(3)


@piece("m4_B_s")
def m4():
    return _mat_stage(4)


@piece("m5_D_s")
def m5():
    return _mat_stage(5)



@piece("m0a_mults_only")
def m0a():
    def prog(Ug):
        def one(U):
            u0 = U[0]
            return jnp.mean(jnp.abs(u0)) + jnp.mean(jnp.abs(u0 * u0))
        return jnp.mean(jax.vmap(one)(Ug)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(Ug))


@piece("m0b_mults_stack")
def m0b():
    def prog(Ug):
        def one(U):
            u0 = U[0]
            st = jnp.stack([u0, u0 * u0], axis=0)
            return jnp.mean(jnp.abs(st))
        return jnp.mean(jax.vmap(one)(Ug)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(Ug))


@piece("m0c_mults_concat")
def m0c():
    def prog(Ug):
        def one(U):
            u0 = U[0]
            st = jnp.concatenate([u0[None, :], (u0 * u0)[None, :]], axis=0)
            return jnp.mean(jnp.abs(st))
        return jnp.mean(jax.vmap(one)(Ug)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(Ug))



@piece("m0d_dead_complex_inputs")
def m0d():
    def prog(model_s, Xg_s, Ug):
        m = merge_cx(model_s)        # merged complex, then unused
        X_all = merge_cx(Xg_s)       # merged complex, then unused
        def one(U):
            u0 = U[0]
            st = jnp.stack([u0, u0 * u0], axis=0)
            return jnp.mean(jnp.abs(st))
        return jnp.mean(jax.vmap(one)(Ug)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(split_cx(model), split_cx(Xg), Ug))


@piece("m0e_lift_u_only")
def m0e():
    def prog(model_s, Ug):
        m = merge_cx(model_s)
        bm = _bmodel_from(m)
        out = jax.vmap(lambda U: bm.lift_u(U))(Ug)
        return jnp.mean(jnp.abs(out)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(split_cx(model), Ug))



@piece("m0h_cast_complex_matmul")
def m0h():
    def prog(model_s, Ug):
        m = merge_cx(model_s)
        W = m.A[:2, :]              # (2, 12) complex, genuinely used

        def one(U):
            u0 = U[0]
            st = jnp.stack([u0, u0 * u0], axis=0)          # (2, H) real
            Z = st.T.astype(W.dtype) @ W                   # cast-complex matmul
            return jnp.mean(jnp.abs(Z))

        return jnp.mean(jax.vmap(one)(Ug)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(split_cx(model), Ug))


@piece("m0i_splitreal_matmul")
def m0i():
    def prog(model_s, Ug):
        m = merge_cx(model_s)
        W = m.A[:2, :]
        Wre, Wim = jnp.real(W), jnp.imag(W)

        def one(U):
            u0 = U[0]
            st = jnp.stack([u0, u0 * u0], axis=0)
            Zre = st.T @ Wre                               # real-only matmuls
            Zim = st.T @ Wim
            Z = jax.lax.complex(Zre, Zim)
            return jnp.mean(jnp.abs(Z))

        return jnp.mean(jax.vmap(one)(Ug)).astype(jnp.float32).reshape(1)
    return digest(jax.jit(prog)(split_cx(model), Ug))


def main():
    print("device:", jax.devices()[0], flush=True)
    for i, (name, fn) in enumerate(PIECES):
        if i < skip:
            continue
        if only is not None and name.split("_")[0] not in only:
            continue
        stage(name, fn)
    print("PROBE_G_DONE", flush=True)


if __name__ == "__main__":
    main()
