"""NPT distributional cross-check vs the reference binary.

Volume moves are the one single-box acceptance law without a direct
reference-oracle check (uVT/Gibbs/PI have theirs; NPT so far only had
the analytic ideal-gas volume-distribution test in
tests/test_statmech.py).  Identical argon NPT inputs through both
engines; compares the per-corrtime <E_pot> and <V> within combined
error bars.  The single-box (N+1)·lnV acceptance
(src/System.MonteCarlo.cpp:1402-1434) is reproduced faithfully here —
unlike the two-box Gibbs volume ratio, which the reference inverts and
we fix (documented in README).

Usage: python tools/npt_crosscheck.py [--steps 100000 --burn 0.5]
Prints a table + verdict; results go into README Fidelity by hand.
NOTE: the 135 K / 60 atm default condenses the box from V=8000 to the
~1270 A^3 liquid; 30k steps is NOT enough for the reference side to
equilibrate (it reads 4.5 sigma high on <V> there) — run >=100k steps
with --burn 0.5.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)
REF_RUN = os.path.join(REPO, ".refbuild", "ref_run")

CONFIG = """job_name ar_npt
ensemble npt
temperature {temperature}
pressure {pressure}
volume_probability 0.05
volume_change_factor 0.12
numsteps {steps}
corrtime {corrtime}
seed {seed}
move_factor 0.3
pqr_input boxA.pqr
energy_output g.energy.dat
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
"""


def stats_from_rows(rows, burn_frac=0.25) -> dict:
    import numpy as np
    rows = rows[max(int(len(rows) * burn_frac), 1):]
    E = np.asarray([r[0] for r in rows])
    V = np.asarray([r[1] for r in rows])
    sd = max(len(E) - 1, 1) ** 0.5
    return {"E": (float(E.mean()), float(E.std() / sd)),
            "V": (float(V.mean()), float(V.std() / sd))}


def parse_energy_dat(path: str):
    # columns: #step #energy #coulombic #rd #polar #vdw #kinetic
    # #kin_temp #N #spin_ratio #volume ... (src/System.Output.cpp:34)
    rows = []
    with open(path) as f:
        for line in f.read().splitlines()[1:]:
            t = line.split()
            if len(t) >= 11:
                try:
                    rows.append((float(t[1]), float(t[10])))
                except ValueError:
                    pass
    return rows


def run_reference(d: str, steps: int, corrtime: int, seed: int,
                  pressure: float, temperature: float,
                  burn: float = 0.25) -> dict:
    shutil.copy(os.path.join(REPO, "examples/gibbs-argon/boxA.pqr"), d)
    with open(os.path.join(d, "run.in"), "w") as f:
        f.write(CONFIG.format(steps=steps, corrtime=corrtime, seed=seed,
                              pressure=pressure, temperature=temperature))
    r = subprocess.run([REF_RUN, "run.in"], cwd=d, capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"reference npt failed rc={r.returncode}: "
                           f"{(r.stdout + r.stderr)[-800:]}")
    return stats_from_rows(parse_energy_dat(
        os.path.join(d, "g.energy.dat")), burn_frac=burn)


def run_ours(d: str, steps: int, corrtime: int, seed: int,
             pressure: float, temperature: float,
             burn: float = 0.25) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mpmcxx_tpu import runner as runner_mod

    shutil.copy(os.path.join(REPO, "examples/gibbs-argon/boxA.pqr"), d)
    with open(os.path.join(d, "run.in"), "w") as f:
        f.write(CONFIG.format(steps=steps, corrtime=corrtime, seed=seed,
                              pressure=pressure, temperature=temperature))
    old = os.getcwd()
    os.chdir(d)
    try:
        runner_mod.run_input_file("run.in", quiet=True)
        return stats_from_rows(parse_energy_dat("g.energy.dat"),
                               burn_frac=burn)
    finally:
        os.chdir(old)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--corrtime", type=int, default=250)
    ap.add_argument("--seed", type=int, default=9)
    ap.add_argument("--pressure", type=float, default=60.0)
    ap.add_argument("--temperature", type=float, default=135.0)
    ap.add_argument("--burn", type=float, default=0.25)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as dref, \
            tempfile.TemporaryDirectory() as dours:
        ref = run_reference(dref, args.steps, args.corrtime, args.seed,
                            args.pressure, args.temperature, args.burn)
        ours = run_ours(dours, args.steps, args.corrtime, args.seed + 1,
                        args.pressure, args.temperature, args.burn)

    print(f"{'':>8s} {'reference':>22s} {'ours':>22s} {'sigma':>8s}")
    ok = True
    for q in ("E", "V"):
        r, ro = ref[q], ours[q]
        err = max((r[1] ** 2 + ro[1] ** 2) ** 0.5, 1e-9)
        ns = abs(r[0] - ro[0]) / err
        flag = "" if ns < 3.0 else "  <-- DISAGREES"
        ok &= ns < 3.0
        print(f"{q:>8s} {r[0]:>12.3f} +- {r[1]:<8.3f}"
              f"{ro[0]:>12.3f} +- {ro[1]:<8.3f}{ns:>8.2f}{flag}")
    print("VERDICT:", "AGREE (all within 3 sigma)" if ok else "DISAGREE")


if __name__ == "__main__":
    main()
