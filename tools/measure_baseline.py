"""Measure the CPU reference's rate on the flagship workload.

The non-MPI reference build crashes on standard ensembles (size=0 calloc,
src/System.MonteCarlo.cpp:245), so the measurable proxy is the pi_nvt
identical-beads trick (.claude/skills/verify/SKILL.md): a displace-only
P-bead PI run evaluates all P bead-system energies every step
(PI_calculate_potential, src/SimulationControl.PathIntegral.cpp:118), and
one reference uVT move performs exactly one such full-system energy
recompute (src/System.MonteCarlo.cpp:94-134).  So

    ref moves/sec  =  P * steps / wall_of_steps

with setup time cancelled by differencing two runs of different lengths.

Writes flagship_ref_moves_per_sec into .bench_baseline.json (committed, so
the measurement travels with the repo and bench.py never re-runs it).

Usage: python tools/measure_baseline.py [--steps-a 1 --steps-b 3 -P 4]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import flagship  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BINARY = os.path.join(REPO, ".refbuild", "mpmcxx")
WRITERS = {"ar": flagship.write_pqr, "co2": flagship.write_pqr_co2,
           "h2": flagship.write_pqr_h2}
CACHE = os.path.join(REPO, ".bench_baseline.json")


def write_input(d: str, nsteps: int):
    with open(os.path.join(d, "run.in"), "w") as f:
        f.write(f"""job_name flag
ensemble pi_nvt
temperature {flagship.TEMPERATURE}
numsteps {nsteps}
corrtime 1
seed 1
move_factor {flagship.MOVE_FACTOR}
bead_perturb_probability 0.0
PI_trial_chain_length 2
parallel_restarts on
polarization on
polar_iterative on
polar_max_iter {flagship.POLAR_MAX_ITER}
polar_damp_type exponential
polar_damp {flagship.POLAR_DAMP}
polar_ewald on
ewald_alpha {flagship.EWALD_ALPHA}
polar_ewald_alpha {flagship.EWALD_ALPHA}
pqr_input base.pqr
basis1 {flagship.L} 0 0
basis2 0 {flagship.L} 0
basis3 0 0 {flagship.L}
""")


def timed_run(workdir: str, nsteps: int, P: int, model: str = "ar") -> float:
    d = os.path.join(workdir, f"{model}-n{nsteps}")
    os.makedirs(d, exist_ok=True)
    WRITERS[model](os.path.join(d, "base.pqr"))
    for s in range(P):
        shutil.copy(os.path.join(d, "base.pqr"),
                    os.path.join(d, f"flag.restart-{s:04d}.pqr"))
    write_input(d, nsteps)
    t0 = time.time()
    r = subprocess.run([REF_BINARY, "-P", str(P), "run.in"], cwd=d,
                       capture_output=True, text=True, timeout=6 * 3600)
    dt = time.time() - t0
    tail = (r.stdout + r.stderr)[-2000:]
    print(f"[n={nsteps}] rc={r.returncode} wall={dt:.1f}s", flush=True)
    if r.returncode != 0:
        print(tail, flush=True)
        raise RuntimeError(f"reference run failed (rc={r.returncode})")
    return dt


def singlepoint_fixture(workdir: str, nsteps: int, model: str):
    """Record row 0 of the timed run's energy.dat as a golden single-point
    fixture (the identical-beads trick: row 0 = exact potential breakdown
    of the written configuration)."""
    d = os.path.join(workdir, f"{model}-n{nsteps}")
    dat = os.path.join(d, "flag.energy.dat")
    with open(dat) as f:
        cols = f.read().splitlines()[1].split()
    fix = {
        "name": f"flagship_{model}_singlepoint",
        "model": model,
        "expected": {
            "energy": float(cols[1]), "coulombic": float(cols[2]),
            "rd": float(cols[3]), "polar": float(cols[4]),
            "vdw": float(cols[5]), "kinetic": float(cols[6]),
        },
    }
    out = os.path.join(REPO, "tests", "golden",
                       f"flagship_{model}_singlepoint.json")
    with open(out, "w") as f:
        json.dump(fix, f, indent=1)
    print(f"single-point fixture -> {out}: {fix['expected']}", flush=True)


def rowtime_run(workdir: str, nsteps: int, P: int, model: str) -> float:
    """Single run; per-step cost from energy.dat row-arrival timestamps
    (one setup instead of two — the reference's A/B-matrix allocation at
    10k atoms costs upward of an hour on this 1-core host).  Returns the
    fastest uncontended per-step wall time."""
    d = os.path.join(workdir, f"{model}-rowtime")
    os.makedirs(d, exist_ok=True)
    WRITERS[model](os.path.join(d, "base.pqr"))
    for s in range(P):
        shutil.copy(os.path.join(d, "base.pqr"),
                    os.path.join(d, f"flag.restart-{s:04d}.pqr"))
    write_input(d, nsteps)
    dat = os.path.join(d, "flag.energy.dat")
    if os.path.exists(dat):
        os.unlink(dat)
    proc = subprocess.Popen([REF_BINARY, "-P", str(P), "run.in"], cwd=d,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    stamps = {}
    t0 = time.time()
    while True:
        rows = 0
        if os.path.exists(dat):
            with open(dat) as f:
                rows = max(len(f.read().splitlines()) - 1, 0)
        if rows and rows not in stamps:
            stamps[rows] = time.time()
            print(f"[rowtime] row {rows} at +{stamps[rows] - t0:.0f}s",
                  flush=True)
        if proc.poll() is not None or rows > nsteps:
            break
        time.sleep(5)
    proc.wait(timeout=600) if proc.poll() is None else None
    keys = sorted(stamps)
    diffs = [stamps[b] - stamps[a] for a, b in zip(keys, keys[1:])]
    if not diffs:
        raise RuntimeError(f"not enough energy.dat rows: {stamps}")
    per_step = min(diffs)
    print(f"[rowtime] per-step diffs: {[round(x, 1) for x in diffs]}",
          flush=True)
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-a", type=int, default=1)
    ap.add_argument("--steps-b", type=int, default=3)
    ap.add_argument("-P", type=int, default=4)
    ap.add_argument("--workdir", default=os.path.join(REPO, ".bench_ref"))
    ap.add_argument("--model", choices=("ar", "co2", "h2"),
                    default="ar")
    ap.add_argument("--rowtime", action="store_true",
                    help="single run, per-step from row timestamps")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    if args.rowtime:
        per_step = rowtime_run(args.workdir, args.steps_b, args.P,
                               args.model)
        d = os.path.join(args.workdir, f"{args.model}-rowtime")
        # reuse the run's row 0 as the single-point fixture
        dst = os.path.join(args.workdir, f"{args.model}-n{args.steps_a}")
        os.makedirs(dst, exist_ok=True)
        shutil.copy(os.path.join(d, "flag.energy.dat"),
                    os.path.join(dst, "flag.energy.dat"))
        singlepoint_fixture(args.workdir, args.steps_a, args.model)
    else:
        wa = timed_run(args.workdir, args.steps_a, args.P, args.model)
        wb = timed_run(args.workdir, args.steps_b, args.P, args.model)
        singlepoint_fixture(args.workdir, args.steps_a, args.model)
        if wb <= wa:
            raise RuntimeError(
                f"no measurable step cost: {wa:.1f}s vs {wb:.1f}s")
        per_step = (wb - wa) / (args.steps_b - args.steps_a)
    rate = args.P / per_step          # one move == one bead energy()
    print(f"per PI step (= {args.P} full energies): {per_step:.2f}s "
          f"-> reference {rate:.5f} moves/sec", flush=True)

    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    prefix = {"ar": "flagship_", "co2": "flagship_co2_",
              "h2": "flagship_h2_"}[args.model]
    n_atoms = {"ar": flagship.N_TOTAL, "co2": flagship.N_TOTAL_CO2,
               "h2": flagship.N_TOTAL_H2}[args.model]
    cache.update({
        prefix + "ref_moves_per_sec": rate,
        prefix + "n_atoms": n_atoms,
        prefix + "per_energy_sec": per_step / args.P,
        prefix + "measured_on":
            f"{os.uname().machine}, "
            f"{os.cpu_count()} visible core(s), pi_nvt "
            f"P={args.P} displace-only on the identical configuration; "
            + ("per-step from energy.dat row-arrival timestamps, fastest "
               "uncontended step" if args.rowtime else
               f"differenced {args.steps_a}->{args.steps_b} steps"),
    })
    with open(CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    print(f"cached to {CACHE}", flush=True)


if __name__ == "__main__":
    main()
