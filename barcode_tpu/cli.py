"""Command-line entry point.

Usage (mirrors barcode/main.cc:65-220: run next to an input.par, optional
restart):

    python -m barcode_tpu [input.par] [--resume] [--chains N] [--samples N]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

from barcode_tpu.config import RunConfig
from barcode_tpu.runner import Runner


def main(argv=None):
    p = argparse.ArgumentParser(prog="barcode_tpu")
    p.add_argument("input_par", nargs="?", default="input.par",
                   help="parameter file (reference input.par format)")
    p.add_argument("restart_iteration", nargs="?", type=int, default=None,
                   help="restart marker (reference main.cc argv[1] semantics): "
                        "resume from checkpoint.npz when present, else from "
                        "the dumped deltaLAG_<k> + performance-log replay")
    p.add_argument("--resume", action="store_true",
                   help="restore sampler state from checkpoint.npz")
    p.add_argument("--chains", type=int, default=None)
    p.add_argument("--samples", type=int, default=None,
                   help="override N_Gibbs")
    p.add_argument("--out", default=None, help="output directory override")
    p.add_argument("--dashboard", action="store_true", default=None,
                   help="force the live candidate table (the ncurses-UI "
                        "equivalent; auto-enabled on a TTY)")
    p.add_argument("--no-dashboard", dest="dashboard", action="store_false")
    p.add_argument("--rhat-stop", type=float, default=None,
                   help="stop when cross-chain split R-hat of psi drops "
                        "below this threshold")
    p.add_argument("--nan-check", action="store_true",
                   help="abort on non-finite sampler state (the reference's "
                        "NAN_DETECTION trap)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of the run into DIR "
                        "(the timers/flamegraph view the reference lacks, "
                        "SURVEY.md §5.1)")
    p.add_argument("--sharded", action="store_true",
                   help="config-5 mode: slab-shard every field over a "
                        "('chains','grid') device mesh (grids too large for "
                        "one chip); devices/chains slabs per chain")
    p.add_argument("--halo", type=int, default=None,
                   help="deposit halo cells for --sharded (default: "
                        "displacement-bound heuristic)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: jax.distributed coordinator address "
                        "(host:port); on TPU pods omit all three flags — the "
                        "environment autodetects")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() with env "
                        "autodetection before building the device mesh")
    args = p.parse_args(argv)

    if args.multihost or args.coordinator is not None:
        from barcode_tpu.parallel.distributed import initialize_multihost
        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)

    if Path(args.input_par).exists():
        conf = RunConfig.from_input_par(args.input_par)
    else:
        print(f"note: {args.input_par} not found, using built-in defaults")
        conf = RunConfig()

    import contextlib
    import json as _json

    prof = contextlib.nullcontext()
    if args.profile:
        import jax
        prof = jax.profiler.trace(args.profile)

    if args.sharded:
        import dataclasses

        from barcode_tpu.parallel.sharded_runner import ShardedRunner
        if args.chains:
            conf = dataclasses.replace(conf, n_chains=args.chains)
        runner = ShardedRunner(conf, out_dir=args.out, halo=args.halo).setup()
        if args.restart_iteration is not None and \
                not (runner.dir / "checkpoint_sharded.npz").exists():
            # reference restart semantics (main.cc:121-131): resume from the
            # dumped deltaLAG_<k> + performance-log replay
            print(f"no checkpoint_sharded.npz — resuming from "
                  f"deltaLAG_{args.restart_iteration} + performance-log replay")
            runner.restore_from_dumps(args.restart_iteration)
        elif args.resume or args.restart_iteration is not None:
            runner.restore()
        try:
            with prof:
                runner.run(n_samples=args.samples, rhat_stop=args.rhat_stop,
                           dashboard=args.dashboard,
                           nan_check=args.nan_check)
        finally:
            runner.checkpoint()
            print(_json.dumps(runner.diagnostics(), default=float))
        return 0

    runner = Runner(conf, out_dir=args.out).setup(n_chains=args.chains)
    if args.restart_iteration is not None and \
            not (runner.dir / "checkpoint.npz").exists():
        # reference restart semantics (main.cc:121-131): no checkpoint, so
        # resume from the dumped deltaLAG_<k> + win/nobs/sigma files alone
        print(f"no checkpoint.npz — resuming from deltaLAG_{args.restart_iteration}"
              " + performance-log replay")
        runner.restore_from_dumps(args.restart_iteration)
    elif args.resume or args.restart_iteration is not None:
        runner.restore()
    try:
        with prof:
            runner.run(n_samples=args.samples, rhat_stop=args.rhat_stop,
                       dashboard=args.dashboard, nan_check=args.nan_check)
    finally:
        runner.checkpoint()
        print(_json.dumps(runner.diagnostics(), default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
