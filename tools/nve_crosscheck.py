"""NVE distributional cross-check vs the reference binary.

The microcanonical (E_tot - E)^{3N/2} acceptance law
(src/System.MonteCarlo.cpp:1459-1462) so far had only the analytic
two-atom integration test in tests/test_statmech.py; this runs the same
identical-input displace-only argon NVE job through both engines (the
serial ref_run driver handles standard ensembles, see
.claude/skills/verify/SKILL.md) and compares the per-corrtime <E_pot>
within combined error bars.  total_energy is set well above the initial
potential so the 24-atom weight has a healthy acceptance rate.

Usage: python tools/nve_crosscheck.py [--steps 60000]
Prints a table + verdict; results go into README Fidelity by hand.
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

CONFIG = """job_name ar_nve
ensemble nve
temperature 100.0
total_energy {total_energy}
numsteps {steps}
corrtime {corrtime}
seed {seed}
move_factor {move_factor}
pqr_input boxA.pqr
energy_output g.energy.dat
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
"""


def stats_from_rows(rows, burn_frac=0.25) -> dict:
    import numpy as np
    rows = rows[max(int(len(rows) * burn_frac), 1):]
    E = np.asarray(rows)
    sd = max(len(E) - 1, 1) ** 0.5
    return {"E": (float(E.mean()), float(E.std() / sd))}


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
    shutil.copy(os.path.join(REPO, "examples/gibbs-argon/boxA.pqr"), d)
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
    ap.add_argument("--total-energy", type=float, default=500.0,
                    help="K; must exceed the initial potential")
    ap.add_argument("--move-factor", type=float, default=0.5)
    ap.add_argument("--burn", type=float, default=0.25)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as dref, \
            tempfile.TemporaryDirectory() as dours:
        ref = _run(dref, args, args.seed, ours=False)
        ours = _run(dours, args, args.seed + 1, ours=True)

    print(f"{'':>8s} {'reference':>22s} {'ours':>22s} {'sigma':>8s}")
    ok = True
    for q in ("E",):
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
