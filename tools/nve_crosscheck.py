"""NVE vs the reference binary: executable demonstration of the
documented N=0 quirk (no distributional agreement is possible).

The reference assigns its NVE ``N`` from ``observables->N`` inside
``countN()``'s loop right after zeroing it (src/System.cpp:916-927), so
``N`` is always 0 and the acceptance pow(E_tot-E, 3N/2) degenerates to
1: every finite-energy move accepts, and the reference chain random-
walks into overlaps (energies run away past 1e9 K within a few thousand
steps).  We intentionally implement the intended microcanonical weight
with the true movable-molecule count (README Fidelity), validated
analytically in tests/test_statmech.py::TestMicrocanonicalNVE — so this
tool does not compare distributions; it runs the identical-input
displace-only argon-lattice NVE job through both engines (serial
ref_run driver, .claude/skills/verify/SKILL.md) and checks that

  (a) the reference runs away (always-accept: max |E| beyond 1e9 K), and
  (b) ours samples a stable bounded microcanonical distribution
      (every sampled U within [U_min, total_energy]).

Usage: python tools/nve_crosscheck.py [--steps 30000]
Prints a table + verdict; results go into README Fidelity by hand.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)
REF_RUN = os.path.join(REPO, ".refbuild", "ref_run")

CONFIG = """job_name ar_nve
ensemble nve
temperature 100.0
total_energy {total_energy}
numsteps {steps}
corrtime {corrtime}
seed {seed}
move_factor {move_factor}
pqr_input lattice.pqr
energy_output g.energy.dat
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
"""


def write_lattice(path: str):
    """27 LJ argon atoms on a 3x3x3 lattice (spacing 6.667 A) in the
    20 A box: U_init ~ -700 K, far from overlap."""
    with open(path, "w") as f:
        i = 0
        for a in range(3):
            for b in range(3):
                for c in range(3):
                    i += 1
                    x, y, z = (20.0 / 3 * (a - 1), 20.0 / 3 * (b - 1),
                               20.0 / 3 * (c - 1))
                    f.write(f"ATOM  {i:5d} Ar   ARG  M {i:4d}   "
                            f"{x:8.3f}{y:8.3f}{z:8.3f} "
                            f"39.94800  0.00000 0.00000 "
                            f"119.80000 3.40500 0.00000 0.00000\n")
        f.write("END\n")


def stats_from_rows(rows, burn_frac=0.25) -> dict:
    import numpy as np
    E = np.asarray(rows)
    tail = E[max(int(len(E) * burn_frac), 1):]
    sd = max(len(tail) - 1, 1) ** 0.5
    return {"E": (float(tail.mean()), float(tail.std() / sd)),
            "absmax": float(np.abs(E).max()), "max": float(E.max())}


def parse_energy_dat(path: str):
    # columns: #step #energy ... (src/System.Output.cpp:34)
    rows = []
    with open(path) as f:
        for line in f.read().splitlines()[1:]:
            t = line.split()
            if len(t) >= 2:
                try:
                    rows.append(float(t[1]))
                except ValueError:
                    pass
    return rows


def _run(d: str, args, seed: int, ours: bool) -> dict:
    write_lattice(os.path.join(d, "lattice.pqr"))
    with open(os.path.join(d, "run.in"), "w") as f:
        f.write(CONFIG.format(steps=args.steps, corrtime=args.corrtime,
                              seed=seed, total_energy=args.total_energy,
                              move_factor=args.move_factor))
    if ours:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        from mpmcxx_tpu import runner as runner_mod
        old = os.getcwd()
        os.chdir(d)
        try:
            runner_mod.run_input_file("run.in", quiet=True)
        finally:
            os.chdir(old)
    else:
        r = subprocess.run([REF_RUN, "run.in"], cwd=d, capture_output=True,
                           text=True, timeout=3600)
        if r.returncode != 0:
            raise RuntimeError(f"reference nve failed rc={r.returncode}: "
                               f"{(r.stdout + r.stderr)[-800:]}")
    return stats_from_rows(parse_energy_dat(
        os.path.join(d, "g.energy.dat")), burn_frac=args.burn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60000)
    ap.add_argument("--corrtime", type=int, default=250)
    ap.add_argument("--seed", type=int, default=9)
    ap.add_argument("--total-energy", type=float, default=4000.0,
                    help="K; must exceed the sampled potential range "
                         "(U_init ~ -700 K, kinetic ~ 4700 K over "
                         "40.5 dof -> T_eff ~ 115 K)")
    ap.add_argument("--move-factor", type=float, default=0.5)
    ap.add_argument("--burn", type=float, default=0.25)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as dref, \
            tempfile.TemporaryDirectory() as dours:
        ref = _run(dref, args, args.seed, ours=False)
        ours = _run(dours, args, args.seed + 1, ours=True)

    print(f"reference: <E> = {ref['E'][0]:.4g} +- {ref['E'][1]:.3g} K, "
          f"max|E| = {ref['absmax']:.4g} K")
    print(f"ours:      <E> = {ours['E'][0]:.4g} +- {ours['E'][1]:.3g} K, "
          f"max|E| = {ours['absmax']:.4g} K")
    ref_runs_away = ref["absmax"] > 1e9
    # the microcanonical bound is on signed U (U < E_tot); |U| can
    # legitimately exceed E_tot on the attractive side
    ours_stable = ours["max"] < args.total_energy and \
        -5000.0 < ours["E"][0] < args.total_energy
    print(f"reference always-accept runaway (N stuck at 0, "
          f"src/System.cpp:916-927): "
          f"{'CONFIRMED' if ref_runs_away else 'NOT SEEN'}")
    print(f"ours bounded microcanonical sampling (U < E_tot always): "
          f"{'CONFIRMED' if ours_stable else 'VIOLATED'}")
    print("VERDICT:", "QUIRK CONFIRMED, FIX HOLDS"
          if ref_runs_away and ours_stable else "UNEXPECTED")


if __name__ == "__main__":
    main()
