"""uVT GCMC distributional cross-check vs the reference binary.

The flagship workload is uVT, so the headline ensemble deserves the same
stochastic validation the PI and Gibbs paths got: an identical argon
GCMC input (insert/remove/displace, ideal-gas fugacity from ``pressure``
— the reference uses P directly when no species EoS flag is set,
src/System.MonteCarlo.cpp:1353-1365) run through both engines, comparing
the per-corrtime ``energy.dat`` samples' <E_pot> and <N> within combined
error bars.

The reference side needs tools/ref_run.cpp (the serial-fallback driver;
the shipped binary segfaults on every non-PI ensemble without MPI — see
.claude/skills/verify/SKILL.md for the three latent serial-path crashes
it patches).

Usage: python tools/uvt_crosscheck.py [--steps 30000]
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

CONFIG = """job_name ar_uvt
ensemble uvt
temperature 110.0
pressure {pressure}
insert_probability 0.4
numsteps {steps}
corrtime {corrtime}
seed {seed}
move_factor 0.25
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
    N = np.asarray([r[1] for r in rows])
    sd = max(len(E) - 1, 1) ** 0.5
    return {"E": (float(E.mean()), float(E.std() / sd)),
            "N": (float(N.mean()), float(N.std() / sd))}


def parse_energy_dat(path: str):
    # columns: #step #energy #coulombic #rd #polar #vdw #kinetic
    # #kin_temp #N ... (src/System.Output.cpp:34)
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


def run_reference(d: str, steps: int, corrtime: int, seed: int,
                  pressure: float) -> dict:
    shutil.copy(os.path.join(REPO, "examples/gibbs-argon/boxA.pqr"), d)
    with open(os.path.join(d, "run.in"), "w") as f:
        f.write(CONFIG.format(steps=steps, corrtime=corrtime, seed=seed,
                              pressure=pressure))
    r = subprocess.run([REF_RUN, "run.in"], cwd=d, capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"reference uvt failed rc={r.returncode}: "
                           f"{(r.stdout + r.stderr)[-800:]}")
    return stats_from_rows(parse_energy_dat(
        os.path.join(d, "g.energy.dat")))


def run_ours(d: str, steps: int, corrtime: int, seed: int,
             pressure: float) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from mpmcxx_tpu import runner as runner_mod

    shutil.copy(os.path.join(REPO, "examples/gibbs-argon/boxA.pqr"), d)
    with open(os.path.join(d, "run.in"), "w") as f:
        f.write(CONFIG.format(steps=steps, corrtime=corrtime, seed=seed,
                              pressure=pressure))
    old = os.getcwd()
    os.chdir(d)
    try:
        runner_mod.run_input_file("run.in", quiet=True)
        return stats_from_rows(parse_energy_dat("g.energy.dat"))
    finally:
        os.chdir(old)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--corrtime", type=int, default=250)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--pressure", type=float, default=15.0)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as dref, \
            tempfile.TemporaryDirectory() as dours:
        ref = run_reference(dref, args.steps, args.corrtime, args.seed,
                            args.pressure)
        ours = run_ours(dours, args.steps, args.corrtime, args.seed + 1,
                        args.pressure)

    print(f"{'':>8s} {'reference':>22s} {'ours':>22s} {'sigma':>8s}")
    ok = True
    for q in ("E", "N"):
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
