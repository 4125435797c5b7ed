"""Real-embedded problem transform: run the whole MPC pipeline in R^{2n}.

The reference embeds complex quantities as [[Re, -Im], [Im, Re]] blocks only
inside its line search (reference mpc.py:82-125). Here the SAME embedding is
applied to the *entire problem* - model operator, targets, costs, states -
so every compiled program in the loop is pure-real arithmetic:

    vec(rho) in C^n          ->  [Re x; Im x] in R^{2n}
    A (n, n) complex         ->  [[Ar, -Im], [Im, Ar]] (2n, 2n) real
    Re <e, Q e> (Hermitian Q)  ==  e_r^T Q_emb e_r      (exact identity)

Why: the axon TPU backend's *batched* complex lowerings are unreliable
(cast-fed dots raise UNIMPLEMENTED; other complex contractions fail
fusion-dependently - see CLAUDE.md round-2 findings), while pure-real
batched matmul chains (the NS-ADMM QP, g5/g6 probes) run. The embedding
buys backend robustness at 2x state-dimension cost; the condensed QP is in
control space and does not grow at all.

The transform composes through the driver's existing hooks (lift_fn /
proj_fn / plant_step_fn / observe_fn): the plant still propagates complex
internally (verified pattern on-chip), and only real vectors cross between
programs. Streaming model updates are NOT supported in embedded mode (an
embedded refit would not preserve complex-linearity of the operator).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.linalg import complex_to_real_op
from ..plants.quantum import quantum_step_taylor, lift_state, proj_state


def embed_vec(x):
    """C^n -> R^2n: [Re x; Im x] (works on (..., n) along the last axis)."""
    x = jnp.asarray(x)
    return jnp.concatenate([jnp.real(x), jnp.imag(x)], axis=-1)


def unembed_vec(z):
    """R^2n -> C^n."""
    z = jnp.asarray(z)
    n = z.shape[-1] // 2
    return jax.lax.complex(z[..., :n], z[..., n:])


def embed_op(A):
    """C^(m,n) -> R^(2m,2n) block embedding [[Re, -Im], [Im, Re]]."""
    return complex_to_real_op(A)


def embed_stacked_model(A_stacked, dim_x: int):
    """Embed a stacked DMDc/bilinear operator [A | N_1 | N_2 | ...].

    Each (dim_x, dim_x) block embeds independently (the monomial lift f(u)
    is real, so the krtimes structure survives the embedding exactly).

    :param A_stacked: (dim_x, dim_x * L) complex.
    :return: (2*dim_x, 2*dim_x * L) real.
    """
    A_stacked = np.asarray(A_stacked)
    L = A_stacked.shape[1] // dim_x
    blocks = [np.asarray(embed_op(A_stacked[:, l * dim_x:(l + 1) * dim_x]))
              for l in range(L)]
    return np.concatenate(blocks, axis=1)


def embed_cost(Q):
    """Hermitian Q -> real symmetric Q_emb with
    Re <e, Q e> == e_emb^T Q_emb e_emb (exact)."""
    return np.asarray(embed_op(Q)).real if np.iscomplexobj(np.asarray(Q)) \
        else np.asarray(embed_op(np.asarray(Q).astype(complex))).real


class EmbeddedProblem(NamedTuple):
    x0: np.ndarray        # (2 dim_e,) real
    model_A: np.ndarray   # (2 dim_x, 2 dim_x L) real
    X_targ: np.ndarray    # (2 dim_x, T) real
    Q: np.ndarray         # (2 dim_x, 2 dim_x) real
    Qf: np.ndarray
    plant_step_fn: Callable
    lift_fn: Callable
    proj_fn: Callable


def embed_problem(x0, model_A, X_targ, Q, Qf, dim_x: int,
                  plant_step_fn: Callable = quantum_step_taylor,
                  lift_fn: Callable = lift_state,
                  proj_fn: Callable = proj_state,
                  observe_fn: Optional[Callable] = None):
    """Build the real-embedded problem data + plant adapters.

    The returned plant adapters keep the *experiment* state real-embedded at
    the program boundary and reassemble complex only inside the plant step
    (lax.complex / real / imag are verified elementwise ops on-chip).

    :param dim_x: model-space complex dimension.
    :return: (EmbeddedProblem, observe_emb) - pass observe_emb as the
        driver's observe_fn (it replaces the driver's complex-noise default,
        which must not run on embedded states).
    """
    x0 = np.asarray(x0)

    def plant_step_emb(plant, xe, u, dt):
        x = unembed_vec(xe)
        x_next = plant_step_fn(plant, x, u, dt)
        return embed_vec(x_next)

    def lift_emb(plant, xe):
        return embed_vec(lift_fn(plant, unembed_vec(xe)))

    def proj_emb(plant, ze):
        return embed_vec(proj_fn(plant, unembed_vec(ze)))

    if observe_fn is not None:
        def observe_emb(plant, xe, key):
            return embed_vec(observe_fn(plant, unembed_vec(xe), key))
    else:
        # default observation: i.i.d. real Gaussian of scale sigma on the
        # embedded vector == complex Gaussian of scale sigma on the complex
        # state (the driver's default complex-noise branch must not run in
        # embedded mode - it would promote the real state to complex)
        def observe_emb(plant, xe, key):
            if not hasattr(plant, "sigma"):
                return xe
            return xe + plant.sigma * jax.random.normal(key, xe.shape, xe.dtype)

    prob = EmbeddedProblem(
        x0=np.concatenate([x0.real, x0.imag]),
        model_A=embed_stacked_model(model_A, dim_x),
        X_targ=np.concatenate([np.asarray(X_targ).real, np.asarray(X_targ).imag], axis=0),
        Q=embed_cost(Q),
        Qf=embed_cost(Qf),
        plant_step_fn=plant_step_emb,
        lift_fn=lift_emb,
        proj_fn=proj_emb,
    )
    return prob, observe_emb
