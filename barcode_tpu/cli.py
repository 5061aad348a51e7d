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
                   help="restart marker (reference main.cc argv[1] semantics); "
                        "any value implies --resume from the checkpoint")
    p.add_argument("--resume", action="store_true",
                   help="restore sampler state from checkpoint.npz")
    p.add_argument("--chains", type=int, default=None)
    p.add_argument("--samples", type=int, default=None,
                   help="override N_Gibbs")
    p.add_argument("--out", default=None, help="output directory override")
    args = p.parse_args(argv)

    if Path(args.input_par).exists():
        conf = RunConfig.from_input_par(args.input_par)
    else:
        print(f"note: {args.input_par} not found, using built-in defaults")
        conf = RunConfig()

    runner = Runner(conf, out_dir=args.out).setup(n_chains=args.chains)
    if args.resume or args.restart_iteration is not None:
        runner.restore()
    try:
        runner.run(n_samples=args.samples)
    finally:
        runner.checkpoint()
    return 0


if __name__ == "__main__":
    sys.exit(main())
