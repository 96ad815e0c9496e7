"""Gibbs two-box distributional cross-check vs the reference binary.

VERDICT r2 item 5: displace+transfer-only argon coexistence (volume moves
excluded — the reference's volume-ratio acceptance bug,
src/SimulationControl.Gibbs.cpp:466, is fixed on our side and documented,
so exact agreement there is impossible by design).  Both engines run the
identical input file; we compare the per-box running averages
(<E_pot>, <N>) within combined error bars.

The reference side needs tools/ref_run.cpp (the serial-fallback driver:
the shipped binary segfaults on every non-PI ensemble without MPI — null
`mpi_data.temperature` at src/System.MonteCarlo.cpp:1978 and the
template system's null checkpoint in backup_observables_ALL_SYSTEMS,
src/SimulationControl.cpp:2839).

Usage: python tools/gibbs_crosscheck.py [--steps 30000]
Prints a table + verdict; results go into README Fidelity by hand.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)
REF_RUN = os.path.join(REPO, ".refbuild", "ref_run")

CONFIG = """job_name ar_gibbs
ensemble nvt_gibbs
temperature 110.0
transfer_probability 0.3
volume_probability 0.0000001
numsteps {steps}
corrtime {corrtime}
seed {seed}
move_factor 0.25
pqr_input boxA.pqr
pqr_input_B boxB.pqr
energy_output g.energy.dat
basis1 20 0 0
basis2 0 20 0
basis3 0 0 20
"""


def stats_from_rows(rows, burn_frac=0.25) -> dict:
    """Mean +- sdom of (E, N) from per-corrtime energy.dat samples for
    box A.  (The reference's own Gibbs running averages are NaN — its
    update_root_averages uses a function-static counter shared by both
    systems, so m=(counter-1)/2 is 0 for the first two calls and the
    division poisons every mean, src/System.Averages.cpp:10-31.  Raw
    energy.dat rows are unaffected.)"""
    import numpy as np
    rows = rows[max(int(len(rows) * burn_frac), 1):]
    E = np.asarray([r[0] for r in rows])
    N = np.asarray([r[1] for r in rows])
    sd = max(len(E) - 1, 1) ** 0.5
    return {"E": (float(E.mean()), float(E.std() / sd)),
            "N": (float(N.mean()), float(N.std() / sd))}


def parse_energy_dat(path: str):
    rows = []
    with open(path) as f:
        for line in f.read().splitlines()[1:]:
            t = line.split()
            if len(t) >= 9:
                try:
                    rows.append((float(t[1]), float(t[8])))
                except ValueError:
                    pass
    return rows


def run_reference(d: str, steps: int, corrtime: int, seed: int) -> dict:
    shutil.copy(os.path.join(REPO, "examples/gibbs-argon/boxA.pqr"), d)
    shutil.copy(os.path.join(REPO, "examples/gibbs-argon/boxB.pqr"), d)
    with open(os.path.join(d, "run.in"), "w") as f:
        f.write(CONFIG.format(steps=steps, corrtime=corrtime, seed=seed))
    r = subprocess.run([REF_RUN, "run.in"], cwd=d, capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"reference gibbs failed rc={r.returncode}: "
                           f"{(r.stdout + r.stderr)[-500:]}")
    # the reference writes box A's samples to the shared energy file
    return {0: stats_from_rows(parse_energy_dat(
        os.path.join(d, "g.energy.dat")))}


def run_ours(d: str, steps: int, corrtime: int, seed: int) -> dict:
    import io

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mpmcxx_tpu.config.parser import read_config
    from mpmcxx_tpu.mc.gibbs import GibbsSimulation

    shutil.copy(os.path.join(REPO, "examples/gibbs-argon/boxA.pqr"), d)
    shutil.copy(os.path.join(REPO, "examples/gibbs-argon/boxB.pqr"), d)
    with open(os.path.join(d, "run.in"), "w") as f:
        f.write(CONFIG.format(steps=steps, corrtime=corrtime, seed=seed))
    from mpmcxx_tpu.io.pqr import make_filename

    old = os.getcwd()
    os.chdir(d)
    try:
        cfg = read_config("run.in")
        sim = GibbsSimulation(cfg, quiet=True)
        sim.run()
        return {0: stats_from_rows(parse_energy_dat(
            make_filename("g.energy.dat", 0)))}
    finally:
        os.chdir(old)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--corrtime", type=int, default=500)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as dref, \
            tempfile.TemporaryDirectory() as dours:
        ref = run_reference(dref, args.steps, args.corrtime, args.seed)
        ours = run_ours(dours, args.steps, args.corrtime, args.seed + 1)

    print(f"{'':>10s} {'reference':>22s} {'ours':>22s} {'sigma':>8s}")
    ok = True
    for sysid in (0,):
        for q in ("E", "N"):
            r, ro = ref[sysid][q], ours[sysid][q]
            err = max((r[1] ** 2 + ro[1] ** 2) ** 0.5, 1e-9)
            ns = abs(r[0] - ro[0]) / err
            flag = "" if ns < 3.0 else "  <-- DISAGREES"
            ok &= ns < 3.0
            print(f"box{sysid} {q:>5s} {r[0]:>12.3f} +- {r[1]:<8.3f}"
                  f"{ro[0]:>12.3f} +- {ro[1]:<8.3f}{ns:>8.2f}{flag}")
    print("VERDICT:", "AGREE (all within 3 sigma)" if ok else "DISAGREE")


if __name__ == "__main__":
    main()
