"""SPECTRE end-to-end cross-check vs the reference binary.

The SPECTRE charge-perturbation law was KS-tested against a numpy mirror
of the C++ do/while (tests/test_mc.py::TestSpectreChargeLaw), but no
SPECTRE *chain* had ever been compared against the binary (VERDICT r4
missing item 4).  This runs an identical NVT SPECTRE input — one charged
target particle + a cloud of floating SPECTRE charges
(src/System.MonteCarlo.cpp:1152-1221, System.cpp:1302-1342) — through
both engines and compares:

  - the per-corrtime <E>, <coulombic>, <rd> distributionally
    (block-averaged errors), and
  - the final-snapshot sum(q^2) over SPECTRE sites across seeds
    (the charge-breadth observable the displacement law drives).

``--save-golden`` additionally pins the step-0 single-point breakdown
from the reference side as tests/golden/spectre_nvt.json — the first
oracle single-point for the SPECTRE energy path (coulombic_nopbc +
repulsion-only LJ, src/System.Energy.cpp:48-49,971-975).

The reference side needs tools/ref_run.cpp (.refbuild/ref_run): the
shipped binary's PI trick cannot host SPECTRE (check_spectre_options
requires plain NVT, src/SimulationControl.cpp:2176-2191).

Usage: python -m tools.spectre_crosscheck [--steps 100000] [--seeds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)
sys.path.insert(0, REPO)
REF_RUN = os.path.join(REPO, ".refbuild", "ref_run")

# 1 target (+1e, wrap center) + 12 SPECTRE sites on a jittered ring well
# inside the 2*max_target cube so the startup wrapall is the identity
# (keeps the step-0 single point start-state independent).  SPECTRE rows
# carry the S flag, the target row T (src/System.cpp:599-606).
N_SPECTRE = 12


def _spectre_pqr() -> str:
    import numpy as np
    rng = np.random.default_rng(7)
    # +0.25e target: at +1e the induced-charge well (~E proportional to
    # -q^2) swamps kT and the chain pins at the max_charge boundary,
    # where the reference's redraw do/while grinds (and its reject-leak
    # can push |q| past the bound entirely — see
    # moves.spectre_reject_restore); at +0.25e / 500 K the charge cloud
    # stays thermal and both engines sample freely
    lines = [
        "ATOM      1 Tg   TGT T    1      0.000    0.000    0.000 "
        "50.000  0.2500  0.0000 100.0  3.000  0.0  0.0"]
    pts = []
    while len(pts) < N_SPECTRE:
        p = rng.uniform(-4.0, 4.0, 3)
        r = np.sqrt((p ** 2).sum())
        if r < 2.5:           # off the target's repulsive core
            continue
        if any(np.sqrt(((p - q) ** 2).sum()) < 2.0 for q in pts):
            continue
        pts.append(p)
    for m, p in enumerate(pts):
        # start charges at exactly 0: spectre_max_charge bounds the
        # INTERNAL (reduced, e*E2REDUCED) charge and the U[-1,1] redraw
        # perturbs it in those units (src/System.MonteCarlo.cpp:1174-1176)
        # — a nonzero e-scale start charge (x408.8 internally) would spin
        # the reference's do/while forever
        lines.append(
            f"ATOM  {m + 2:5d} Sp   SPC S {m + 2:4d}   "
            f"{p[0]:8.3f} {p[1]:8.3f} {p[2]:8.3f}  1.000  0.0000  "
            f"0.0000  50.0  2.500  0.0  0.0")
    return "\n".join(lines) + "\nEND\n"


CONFIG = """job_name sp_nvt
ensemble nvt
temperature {temperature}
spectre on
spectre_max_charge {max_charge}
spectre_max_target {max_target}
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


def _write_inputs(d: str, steps: int, corrtime: int, seed: int,
                  temperature: float, max_charge: float, max_target: float,
                  move_factor: float, pqr_text: str | None = None) -> None:
    with open(os.path.join(d, "boxA.pqr"), "w") as f:
        f.write(pqr_text if pqr_text is not None else _spectre_pqr())
    with open(os.path.join(d, "run.in"), "w") as f:
        f.write(CONFIG.format(steps=steps, corrtime=corrtime, seed=seed,
                              temperature=temperature, max_charge=max_charge,
                              max_target=max_target,
                              move_factor=move_factor))


def parse_energy_dat(path: str):
    # columns: #step #energy #coulombic #rd ... (src/System.Output.cpp:34)
    rows = []
    with open(path) as f:
        for line in f.read().splitlines()[1:]:
            t = line.split()
            if len(t) >= 4:
                try:
                    rows.append((float(t[1]), float(t[2]), float(t[3])))
                except ValueError:
                    pass
    return rows


def sum_q2(restart_path: str) -> float:
    """sum q^2 (e^2) over SPECTRE rows of a restart PQR."""
    total = 0.0
    with open(restart_path) as f:
        for line in f:
            t = line.split()
            # ATOM id name type flag molid x y z mass charge ...
            if len(t) >= 11 and t[0] == "ATOM" and t[4] == "S":
                total += float(t[10]) ** 2
    return total


def stats_from_rows(rows, burn_frac=0.25, n_blocks=10):
    import numpy as np
    rows = rows[max(int(len(rows) * burn_frac), 1):]

    def block_stats(x):
        x = np.asarray(x)
        nb = min(n_blocks, max(len(x) // 2, 1))
        bm = np.array([b.mean() for b in np.array_split(x, nb)])
        return (float(x.mean()),
                float(bm.std(ddof=1) / len(bm) ** 0.5 if len(bm) > 1
                      else 0.0))

    return {"E": block_stats([r[0] for r in rows]),
            "coul": block_stats([r[1] for r in rows]),
            "rd": block_stats([r[2] for r in rows])}


def run_reference(d: str, **kw):
    _write_inputs(d, **kw)
    r = subprocess.run([REF_RUN, "run.in"], cwd=d, capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"reference spectre failed rc={r.returncode}: "
                           f"{(r.stdout + r.stderr)[-800:]}")
    rows = parse_energy_dat(os.path.join(d, "g.energy.dat"))
    q2 = sum_q2(os.path.join(d, "sp_nvt.restart.pqr"))
    return rows, q2


def restart_text(d: str) -> str:
    with open(os.path.join(d, "sp_nvt.restart.pqr")) as f:
        return f.read()


def run_ours(d: str, **kw):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from mpmcxx_tpu import runner as runner_mod

    _write_inputs(d, **kw)
    old = os.getcwd()
    os.chdir(d)
    try:
        runner_mod.run_input_file("run.in", quiet=True)
        rows = parse_energy_dat("g.energy.dat")
        q2 = sum_q2("sp_nvt.restart.pqr")
    finally:
        os.chdir(old)
    return rows, q2


def save_golden(pqr: str, max_charge, max_target, temperature, **kw) -> None:
    """Pin a reference step-0 single point as a golden fixture.

    ``pqr`` should be an *equilibrated* snapshot (a restart PQR from a
    prior chain) so the fixture has nonzero spectre charges — the
    t=0 configuration's all-zero charges would make coulombic trivially
    0 and test only the repulsion-only LJ.
    """
    with tempfile.TemporaryDirectory() as d:
        rows, _ = run_reference(d, pqr_text=pqr, steps=100, corrtime=100,
                                seed=1, temperature=temperature,
                                max_charge=max_charge,
                                max_target=max_target, move_factor=0.0,
                                **kw)
    fix = {
        "name": "spectre_nvt",
        "comment": "SPECTRE single point via tools/spectre_crosscheck.py "
                   "--save-golden (ref_run NVT row 0 on an equilibrated "
                   "restart snapshot; the PI oracle cannot host SPECTRE)",
        "basis": 20.0,
        "temperature": temperature,
        "config_extra": f"spectre on\nspectre_max_charge {max_charge}\n"
                        f"spectre_max_target {max_target}\n",
        "pqr_text": pqr,
        "expected": {"energy": rows[0][0], "coulombic": rows[0][1],
                     "rd": rows[0][2]},
        "compare": ["rd", "coulombic"],
    }
    out = os.path.join(REPO, "tests", "golden", "spectre_nvt.json")
    with open(out, "w") as f:
        json.dump(fix, f, indent=1)
    print(f"golden saved: {out}  expected={fix['expected']}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--corrtime", type=int, default=100)
    ap.add_argument("--seeds", type=int, default=4,
                    help="independent seed pairs for the q^2 comparison")
    ap.add_argument("--temperature", type=float, default=500.0)
    # 50: far enough out that the entropic charge walk cannot reach the
    # bound within --steps.  The charge distribution is bound-set
    # (q_rms ~ max_charge/sqrt(3), entropy-dominated), so whenever |q|
    # wanders within ~1 of (max_charge + 1) the reference's redraw
    # rejection loop's expected tries ~ 2/(max_charge+1-|q|) diverge —
    # and its reject-leak can push |q| PAST max_charge+1, where the
    # do/while never exits (observed live: seed-dependent multi-minute
    # grinds at max_charge 10).  Keeping the bound untouched keeps the
    # reference fast and still tests the full move/renormalize/leak/
    # energetics chain; the bound-conditional law itself is unit-tested
    # (tests/test_mc.py::TestSpectreChargeLaw).
    ap.add_argument("--max-charge", type=float, default=50.0,
                    help="spectre_max_charge, REDUCED units (e*E2REDUCED)")
    ap.add_argument("--max-target", type=float, default=5.0)
    ap.add_argument("--move-factor", type=float, default=0.3)
    ap.add_argument("--burn", type=float, default=0.25)
    ap.add_argument("--save-golden", action="store_true")
    args = ap.parse_args()

    import numpy as np
    kw = dict(steps=args.steps, corrtime=args.corrtime,
              temperature=args.temperature, max_charge=args.max_charge,
              max_target=args.max_target, move_factor=args.move_factor)

    ref_all, ours_all = [], []
    ref_q2, ours_q2 = [], []
    for s in range(args.seeds):
        with tempfile.TemporaryDirectory() as dref, \
                tempfile.TemporaryDirectory() as dours:
            rows_r, q2_r = run_reference(dref, seed=101 + s, **kw)
            if s == 0 and args.save_golden:
                save_golden(restart_text(dref), args.max_charge,
                            args.max_target, args.temperature)
            rows_o, q2_o = run_ours(dours, seed=201 + s, **kw)
        ref_all.extend(rows_r[int(len(rows_r) * args.burn):])
        ours_all.extend(rows_o[int(len(rows_o) * args.burn):])
        ref_q2.append(q2_r)
        ours_q2.append(q2_o)
        print(f"seed pair {s}: ref sum q^2 {q2_r:8.3f}   "
              f"ours {q2_o:8.3f}", file=sys.stderr)

    ref = stats_from_rows(ref_all, burn_frac=0.0)
    ours = stats_from_rows(ours_all, burn_frac=0.0)
    print(f"{'':>8s} {'reference':>22s} {'ours':>22s} {'sigma':>8s}")
    ok = True
    for q in ("E", "coul", "rd"):
        r, ro = ref[q], ours[q]
        err = max((r[1] ** 2 + ro[1] ** 2) ** 0.5, 1e-9)
        ns = abs(r[0] - ro[0]) / err
        flag = "" if ns < 3.0 else "  <-- DISAGREES"
        ok &= ns < 3.0
        print(f"{q:>8s} {r[0]:>12.3f} +- {r[1]:<8.3f}"
              f"{ro[0]:>12.3f} +- {ro[1]:<8.3f}{ns:>8.2f}{flag}")
    rq, oq = np.asarray(ref_q2), np.asarray(ours_q2)
    if args.seeds > 1:
        err = max(np.hypot(rq.std(ddof=1) / len(rq) ** 0.5,
                           oq.std(ddof=1) / len(oq) ** 0.5), 1e-9)
        ns = abs(rq.mean() - oq.mean()) / err
        flag = "" if ns < 3.0 else "  <-- DISAGREES"
        ok &= ns < 3.0
        print(f"{'sum q^2':>8s} {rq.mean():>12.3f} +- "
              f"{rq.std(ddof=1) / len(rq) ** 0.5:<8.3f}"
              f"{oq.mean():>12.3f} +- "
              f"{oq.std(ddof=1) / len(oq) ** 0.5:<8.3f}{ns:>8.2f}{flag}")
    print("VERDICT:", "AGREE (all within 3 sigma)" if ok else "DISAGREE")


if __name__ == "__main__":
    main()
