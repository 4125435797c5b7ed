"""Scenario runner CLI: `python -m mpc4quantum_tpu <preset> [options]`.

Runs a named benchmark scenario (presets.py) end-to-end and prints one JSON
line of metrics. The reference has no CLI (problem definitions live in its
test code, reference README.rst:20-27); this is the user-facing entry point
for the named workloads.
"""

import argparse
import json
import time


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mpc4quantum_tpu",
                                     description="Run a quantum-MPC benchmark scenario")
    parser.add_argument("preset", nargs="?", default="not_state",
                        help="scenario name (see --list)")
    parser.add_argument("--list", action="store_true", help="list presets and exit")
    parser.add_argument("--order", type=int, default=None, help="discretization order")
    parser.add_argument("--batch", type=int, default=0,
                        help="run a detuning-sweep fleet of this size instead of one rollout")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    parser.add_argument("--solver", choices=["qp", "lqr"], default=None)
    parser.add_argument("--checkpoint", default="",
                        help="npz path for mid-run checkpoint/resume of the "
                             "hostloop fleet (tunnel-outage insurance); "
                             "resumes automatically if the file exists")
    parser.add_argument("--checkpoint-every", type=int, default=10,
                        help="MPC steps between checkpoints (with --checkpoint)")
    parser.add_argument("--progress-every", type=int, default=0,
                        help="hostloop heartbeat: print step/throughput/"
                             "done-fraction every k steps (0 = silent)")
    parser.add_argument("--hostloop", action="store_true",
                        help="with --batch: run the fleet through the host-driven "
                             "TPU engine (mpc/hostloop.py) with the tuned kernel "
                             "defaults - the production path on the axon backend")
    args = parser.parse_args(argv)
    if args.hostloop and args.batch <= 0:
        parser.error("--hostloop requires --batch N (it is the fleet engine)")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import dataclasses
    import numpy as np
    import jax.numpy as jnp
    import mpc4quantum_tpu as m4q
    from mpc4quantum_tpu import presets

    if args.list:
        for name, fn in presets.PRESETS.items():
            print(f"{name:16s} {fn.__doc__.splitlines()[0]}")
        return 0

    build = presets.PRESETS[args.preset]
    kwargs = {}
    if args.order is not None:
        kwargs["order"] = args.order
    # scenario construction runs eager complex jnp ops - keep it off the
    # TPU device (complex transfers are unimplemented on the axon backend)
    with jax.default_device(jax.devices("cpu")[0]):
        sc = build(**kwargs)
    if args.solver is not None:
        sc = dataclasses.replace(sc, config=dataclasses.replace(sc.config, solver=args.solver))

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    if args.batch > 0 and args.hostloop:
        # the shared fleet runner (benchfleet.py): every preset's QP runs
        # through a kernel on hardware - the unrolled one at n <= 16, the
        # looped large-n one beyond (selection inside HostLoopMPC; interpret
        # mode is test-only, so --cpu uses the XLA impls)
        from mpc4quantum_tpu.benchfleet import run_hostloop_fleet

        metrics, _ = run_hostloop_fleet(sc, args.batch, key=key, cpu=args.cpu,
                                        checkpoint_path=args.checkpoint or None,
                                        checkpoint_every=args.checkpoint_every,
                                        progress_every=args.progress_every)
        out = dict(metrics, engine="hostloop")
    elif args.batch > 0:
        from mpc4quantum_tpu.parallel.fleet import make_scenario_batch, batched_mpc, fleet_summary

        plants, keys = make_scenario_batch(key, sc.plant, args.batch, detune_scale=0.01)
        res = batched_mpc(jnp.asarray(sc.x0), sc.model, plants, sc.X_targ, sc.U_targ,
                          sc.Q, sc.R, sc.Qf, sc.config, sc.sat, du=sc.du, keys=keys,
                          plant_step_fn=sc.plant_step_fn, lift_fn=sc.lift_fn,
                          proj_fn=sc.proj_fn, exit_condition=sc.exit_condition)
        jax.block_until_ready(res.us)
        elapsed = time.time() - t0
        fid = jnp.real(jnp.einsum("bd,d->b", res.xs[:, :, -1], jnp.conj(jnp.asarray(sc.target_state))))
        out = {
            "preset": sc.name, "batch": args.batch, "elapsed_s": round(elapsed, 3),
            "rollouts_per_s": round(args.batch / elapsed, 2),
            "fidelity_mean": round(float(jnp.mean(fid)), 5),
            "fidelity_min": round(float(jnp.min(fid)), 5),
            "completed_frac": round(float(jnp.mean((res.exit_code == 0) | (res.exit_code == 1))), 3),
        }
    else:
        res = m4q.mpc(**sc.mpc_args(), key=key)
        jax.block_until_ready(res.us)
        elapsed = time.time() - t0
        xf = np.asarray(res.xs)[:, int(res.n_valid)]
        fid = float(np.real(np.vdot(np.asarray(sc.target_state), xf)))
        out = {
            "preset": sc.name, "elapsed_s": round(elapsed, 3),
            "exit_code": int(res.exit_code), "n_valid": int(res.n_valid),
            "fidelity": round(fid, 5),
            "mean_sqp_iters": round(float(np.mean(np.asarray(res.sqp_iters))), 2),
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
