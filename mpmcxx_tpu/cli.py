"""Command-line entry point.

Mirrors the reference CLI contract (src/main.cpp:24-66, src/args_etc.h:216-
263): ``mpmcxx-tpu [-P <trotter#>] [-xyz <frames file>] <input file>``,
plus signal-safe shutdown (SIGTERM/SIGUSR1/SIGUSR2 print and exit, as in
src/args_etc.h:306-347).

Usage: python -m mpmcxx_tpu.cli [-P 8] [-xyz frames.xyz] input.in
"""

from __future__ import annotations

import argparse
import signal
import sys

from . import constants as const


def _install_signal_handlers():
    def handler(signum, frame):
        sys.stderr.write(f"MPMC-TPU: received signal {signum}; exiting.\n")
        raise SystemExit(104)  # interrupt_signal_received

    for sig in (signal.SIGTERM, signal.SIGUSR1, signal.SIGUSR2):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):
            pass


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="mpmcxx-tpu",
        description="TPU-native Massively Parallel Monte Carlo")
    parser.add_argument("-P", type=int, default=0, metavar="TROTTER",
                        help="Trotter number (bead count) for pi_nvt runs")
    parser.add_argument("-xyz", type=str, default="", metavar="FILE",
                        help="write all-bead XYZ frames at each corrtime")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--replicas", type=int, default=1,
                        help="number of vmapped independent replica chains "
                             "(the MPI-rank role, sharded over devices)")
    parser.add_argument("input", help="simulation input file")
    args = parser.parse_args(argv)

    _install_signal_handlers()

    from .config.parser import read_config
    cfg = read_config(args.input)
    if not args.quiet:
        print(f"SIM_CONTROL: running parameters found in: {args.input}")
        print("SIM_CONTROL: Finished reading config file.")
    if args.P:
        cfg.total_trotter_number = args.P

    if cfg.ensemble == const.ENSEMBLE_PATH_INTEGRAL_NVT:
        from .mc.pi import PISimulation
        sim = PISimulation(cfg, quiet=args.quiet)
        if args.xyz:
            sim.xyz_path = args.xyz
    elif cfg.ensemble == const.ENSEMBLE_NVT_GIBBS:
        from .mc.gibbs import GibbsSimulation
        sim = GibbsSimulation(cfg, quiet=args.quiet)
    elif args.replicas > 1 or cfg.parallel_tempering:
        from .parallel.driver import ReplicaSimulation
        n = max(args.replicas, 2 if cfg.parallel_tempering else 1)
        sim = ReplicaSimulation(cfg, n, quiet=args.quiet)
    else:
        from .runner import Simulation
        sim = Simulation(cfg, quiet=args.quiet)

    if not args.quiet:
        from .io.output import display_sim_control
        n_sys = getattr(sim, "P", None) or \
            (2 if cfg.ensemble == const.ENSEMBLE_NVT_GIBBS else 1)
        display_sim_control(sim.cfg, n_systems=n_sys)
    sim.run()
    print("SIM_CONTROL: Simulation complete!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
