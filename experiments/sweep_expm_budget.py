"""Validate the fleet auto expm budget (benchfleet.run_hostloop_fleet).

For every preset, the fleet driver sizes the plant-propagator Taylor expm
from a host-side worst-case norm bound over the control box:

    expm_sq = ceil(log2(bound * 1.3 / 0.8))  (clamped >= 0),  order = 12

i.e. the SHORTEST scaling-and-squaring chain whose scaled norm stays <= 0.8
with a 1.3x margin for the fleet's per-lane ~1% detunings. This sweep
certifies, per preset, in x64 on CPU:

  1. MARGIN: the realized per-lane worst-case ||dt*G(u)||_1 over box-corner
     controls never exceeds 0.8 * 2^expm_sq (the budget's validity domain);
  2. EXACTNESS: max |expm_taylor(order=12, fixed_squarings=expm_sq)
     - expm_pade| over (lanes x sampled controls) is at rounding level.

CPU-runnable (no chip needed): the budgeted chain is bit-identical math to
what the XLA/Pallas plant steps execute on the TPU, so accuracy conclusions
transfer; only throughput needs the chip (probe_tpu_r5_expm.py).
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from mpc4quantum_tpu.presets import PRESETS
from mpc4quantum_tpu.ops.expm import expm_pade, expm_taylor
from mpc4quantum_tpu.parallel.fleet import make_scenario_batch
from mpc4quantum_tpu.plants.lindblad import LindbladPlant, lindblad_norm_bound
from mpc4quantum_tpu.plants.quantum import taylor_norm_bound

BATCH = 256
N_RAND = 32


def generators(plant, us, dt):
    """dt * G(u) for each control row in `us` — the matrices the plant
    steps exponentiate ((-1j dt H(u)) closed-system, dt A(u) Lindblad)."""
    if isinstance(plant, LindbladPlant):
        G0, G1s, pref = plant.A0, plant.A1s, dt
    else:
        G0, G1s, pref = plant.H0, plant.H1s, -1j * dt
    return pref * (G0[None] + jnp.einsum("ck,kij->cij",
                                         us.astype(G1s.real.dtype), G1s))


def main():
    rng = np.random.default_rng(0)
    print(f"{'preset':<16} {'bound':>8} {'sq':>3} {'margin_ok':>9} "
          f"{'worst_norm':>10} {'cap':>8} {'max_err':>10}")
    all_ok = True
    for name, ctor in PRESETS.items():
        sc = ctor()
        dt, sat = float(sc.config.dt), np.asarray(sc.sat, float)
        plant = sc.plant
        if isinstance(plant, LindbladPlant):
            bound = lindblad_norm_bound(plant, dt, sat)
        else:
            bound = taylor_norm_bound(plant, dt, sat)
        expm_sq = max(0, int(np.ceil(np.log2(max(bound, 1e-12) * 1.3 / 0.8))))
        cap = 0.8 * 2.0 ** expm_sq

        plants, _ = make_scenario_batch(jax.random.PRNGKey(1), plant, BATCH,
                                        detune_scale=0.01)
        dim_u = (plant.A1s if isinstance(plant, LindbladPlant)
                 else plant.H1s).shape[0]
        sat_v = np.broadcast_to(sat, (dim_u,))
        # box corners (worst case for the affine norm) + random interior
        n_corn = min(2 ** dim_u, 64)
        corners = np.array([[(1 if (c >> k) & 1 else -1) * sat_v[k]
                             for k in range(dim_u)] for c in range(n_corn)])
        randu = rng.uniform(-1, 1, (N_RAND, dim_u)) * sat_v
        us = jnp.asarray(np.concatenate([corners, randu]))

        gen_b = jax.vmap(lambda p: generators(p, us, dt))(plants)  # (B,C,d,d)
        A = gen_b.reshape((-1,) + gen_b.shape[-2:])
        worst = float(jnp.max(jnp.sum(jnp.abs(A), axis=-2)))

        U_ref = expm_pade(A)
        U_fast = expm_taylor(A, order=12, fixed_squarings=expm_sq)
        err = float(jnp.max(jnp.abs(U_fast - U_ref)))

        ok = worst <= cap and err < 1e-10
        all_ok &= ok
        print(f"{name:<16} {bound:8.4f} {expm_sq:3d} {str(worst <= cap):>9} "
              f"{worst:10.4f} {cap:8.4f} {err:10.2e}")
    print("ALL OK" if all_ok else "FAILURES ABOVE")
    return 0 if all_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
