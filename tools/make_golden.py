"""Generate golden single-point energy fixtures from the reference engine.

For each test case this writes a PQR + pi_nvt input with 4 identical bead
restarts (the non-MPI reference crashes on standard ensembles — see
.claude/skills/verify/SKILL.md), runs the compiled reference, and records
row 0 of the energy.dat: the exact (rd, coulombic, polar, vdw) single-point
breakdown for that configuration.  Fixtures are committed so CI never needs
the binary.

Usage: python tools/make_golden.py [case ...]
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.path.join(REPO, ".refbuild", "mpmcxx")
OUT = os.path.join(REPO, "tests", "golden")

BASIS = 17.0

# atoms: (atomtype, moltype, molid, x, y, z, mass, charge_e, alpha, eps,
#         sigma, omega, gwp_alpha, c6, c8, c10, c9)
MIXED_ATOMS = [
    ("Ar", "ARG", 1, 1.20, 0.70, -0.50, 39.948, 0.0, 0.0, 119.8, 3.405,
     0, 0, 0, 0, 0, 0),
    ("Kr", "KRY", 2, 4.30, 1.10, 0.40, 83.80, 0.0, 0.0, 171.0, 3.60,
     0, 0, 0, 0, 0, 0),
    ("Na", "SOD", 3, -3.10, 2.00, 1.10, 22.99, 1.0, 0.24, 50.0, 2.8,
     0, 0, 0, 0, 0, 0),
    ("Cl", "CHL", 4, 0.50, -2.60, 3.10, 35.45, -1.0, 2.5, 100.0, 3.4,
     0, 0, 0, 0, 0, 0),
]

# a rigid triatomic (CO2-like) + charged atoms: exercises intra-molecular
# exclusions and the Ewald screening correction
TRIATOMIC = [
    ("C", "CO2", 1, 0.00, 0.00, 0.00, 12.011, 0.6512, 1.2, 28.0, 2.75,
     0, 0, 0, 0, 0, 0),
    ("O", "CO2", 1, 1.16, 0.00, 0.00, 15.999, -0.3256, 0.7, 79.0, 3.0,
     0, 0, 0, 0, 0, 0),
    ("O", "CO2", 1, -1.16, 0.00, 0.00, 15.999, -0.3256, 0.7, 79.0, 3.0,
     0, 0, 0, 0, 0, 0),
    ("C", "CO2", 2, 3.90, 1.30, -0.80, 12.011, 0.6512, 1.2, 28.0, 2.75,
     0, 0, 0, 0, 0, 0),
    ("O", "CO2", 2, 5.06, 1.30, -0.80, 15.999, -0.3256, 0.7, 79.0, 3.0,
     0, 0, 0, 0, 0, 0),
    ("O", "CO2", 2, 2.74, 1.30, -0.80, 15.999, -0.3256, 0.7, 79.0, 3.0,
     0, 0, 0, 0, 0, 0),
    ("Ar", "ARG", 3, -2.80, -2.10, 2.20, 39.948, 0.0, 1.64, 119.8, 3.405,
     0, 0, 0, 0, 0, 0),
]

# dispersion-expansion atoms: epsilon==BM alpha (1/A), sigma==BM r (A),
# c6/c8/c10 in a.u.
DISP_ATOMS = [
    ("He", "HEL", 1, 0.80, 0.20, -0.40, 4.0026, 0.0, 0.2, 2.96, 2.67,
     0, 0, 1.46, 14.1, 183.5, 0),
    ("He", "HEL", 2, 3.60, 0.90, 0.60, 4.0026, 0.0, 0.2, 2.96, 2.67,
     0, 0, 1.46, 14.1, 183.5, 0),
    ("Ne", "NEO", 3, -2.40, 1.80, 1.20, 20.180, 0.0, 0.39, 3.09, 2.78,
     0, 0, 6.38, 90.3, 1536.0, 0),
]

AT_ATOMS = [  # axilrod-teller: needs alpha + c9 (K*A^9 input units... a.u.)
    ("Ar", "ARG", 1, 0.50, 0.30, -0.20, 39.948, 0.0, 1.642, 119.8, 3.405,
     0, 0, 64.3, 0, 0, 518.3),
    ("Ar", "ARG", 2, 4.10, 0.80, 0.50, 39.948, 0.0, 1.642, 119.8, 3.405,
     0, 0, 64.3, 0, 0, 518.3),
    ("Ar", "ARG", 3, 1.80, 3.60, 1.10, 39.948, 0.0, 1.642, 119.8, 3.405,
     0, 0, 64.3, 0, 0, 518.3),
]

CASES = {
    "lj_lb": dict(atoms=MIXED_ATOMS, extra=""),
    "lj_nolrc": dict(atoms=MIXED_ATOMS, extra="rd_lrc off\n"),
    "lj_wh": dict(atoms=MIXED_ATOMS, extra="waldmanhagler on\n"),
    "lj_halgren": dict(atoms=MIXED_ATOMS, extra="halgren_mixing on\n"),
    # NOTE: feynman_hibbs cases cannot use this oracle (the reference
    # refuses FH + path integrals), and axilrod_teller energy is invisible
    # in PI energy.dat (PI_calculate_potential sums only 4 components).
    "wolf": dict(atoms=MIXED_ATOMS, extra="wolf on\n"),
    "triatomic_ewald": dict(atoms=TRIATOMIC, extra=""),
    "polar_nopbc": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 1.0\npolar_precision 0.00000001\n"),
    "polar_ewald": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_ewald on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 1.0\npolar_precision 0.00000001\n"),
    "polar_wolf": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_wolf on\n"
              "polar_wolf_alpha 0.2\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 1.0\npolar_precision 0.00000001\n"),
    "polar_linear_damp": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\n"
              "polar_damp_type linear\npolar_damp 2.5874\n"
              "polar_gamma 1.0\npolar_precision 0.00000001\n"),
    "polar_sor": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_sor on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 0.7\npolar_precision 0.00000001\n"),
    "polar_palmo": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_palmo on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 1.0\npolar_precision 0.00000001\n"),
    "polar_exact": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative off\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_max_iter 10\n"),
    # Gauss-Seidel variants: the reference sweeps in place (sequential);
    # we run Jacobi — same fixed point, so tight precision must agree
    "polar_gs": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_gs on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 1.0\npolar_precision 0.0000000001\n"),
    "polar_gs_ranked": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_gs_ranked on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 1.0\npolar_precision 0.0000000001\n"),
    "polar_esor": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_esor on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 0.9\npolar_precision 0.00000001\n"),
    "polar_zodid": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_zodid on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 1.0\npolar_max_iter 4\n"),
    "polar_wolf_full": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_wolf_full on\n"
              "polar_wolf_alpha 0.2\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 1.0\npolar_precision 0.00000001\n"),
    "polar_damp_off": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\n"
              "polar_damp_type off\n"
              "polar_gamma 1.0\npolar_precision 0.00000001\n"),
    "sg": dict(atoms=MIXED_ATOMS[:2], extra="sg on\n"),
    "dreiding": dict(atoms=MIXED_ATOMS, extra="dreiding on\n"),
    "lj_buffered_14_7": dict(atoms=MIXED_ATOMS,
                             extra="lj_buffered_14_7 on\n"),
    "disp_expansion": dict(atoms=DISP_ATOMS, extra="disp_expansion on\n"),
    "disp_nodamp": dict(atoms=DISP_ATOMS,
                        extra="disp_expansion on\ndamp_dispersion off\n"),
    "disp_tt_damped": dict(atoms=DISP_ATOMS,
                           extra="disp_expansion on\ndamp_dispersion on\n"),
    "lj_c6_mixing": dict(atoms=MIXED_ATOMS, extra="c6_mixing on\n"),
    "lj_9th_repulsion": dict(atoms=MIXED_ATOMS,
                             extra="cdvdw_9th_repulsion on\n"),
    "lj_rd_crystal": dict(atoms=MIXED_ATOMS,
                          extra="rd_crystal on\nrd_crystal_order 2\n"
                                "rd_lrc off\n"),
    # NOTE: cdvdw_exp_repulsion cannot be oracle-tested: it requires
    # polarvdw for its mixing branch, and the reference's coupled-dipole
    # path both crashes on all-zero omegas (0-byte calloc in alloc_mtx,
    # src/System.Energy.cpp:413) and returns uninitialised memory otherwise
    # (dsyev_ commented out, :566,571).  Covered by unit + blocked-vs-dense
    # consistency tests instead.
    "wh_attractive_only": dict(
        atoms=[("Aa", "AAA", 1, 0.5, 0.2, -0.3, 10.0, 0.0, 0.0, 80.0,
                -3.1, 0, 0, 0, 0, 0, 0),
               ("Bb", "BBB", 2, 3.9, 0.8, 0.7, 12.0, 0.0, 0.0, 95.0, 3.3,
                0, 0, 0, 0, 0, 0)],
        extra="waldmanhagler on\nrd_lrc off\n"),
    "lb_attractive_only": dict(
        atoms=[("Aa", "AAA", 1, 0.5, 0.2, -0.3, 10.0, 0.0, 0.0, 80.0,
                -3.1, 0, 0, 0, 0, 0, 0),
               ("Bb", "BBB", 2, 3.9, 0.8, 0.7, 12.0, 0.0, 0.0, 95.0, 3.3,
                0, 0, 0, 0, 0, 0)],
        extra="rd_lrc off\n"),
}


# atoms for the GWP kernels: nonzero gwp_alpha activates wavepacket
# coulomb + kinetic (src/System.Energy.cpp:1304-1390)
GWP_ATOMS = [
    ("Na", "SOD", 1, 0.60, 0.30, -0.20, 22.99, 1.0, 0.0, 50.0, 2.8,
     0, 1.10, 0, 0, 0, 0),
    ("Cl", "CHL", 2, 3.90, 1.00, 0.70, 35.45, -1.0, 0.0, 100.0, 3.4,
     0, 0.85, 0, 0, 0, 0),
    ("Ar", "ARG", 3, -2.60, 2.10, 1.40, 39.948, 0.0, 0.0, 119.8, 3.405,
     0, 0, 0, 0, 0, 0),
]

# anharmonic bond spring (rd_only + rd_anharmonic, src/System.Energy.cpp:757)
ANHARMONIC_ATOMS = [
    ("Xx", "OSC", 1, 0.00, 0.00, 0.00, 10.0, 0.0, 0.0, 0.0, 0.0,
     0, 0, 0, 0, 0, 0),
    ("Xx", "OSC", 2, 1.35, 0.00, 0.00, 10.0, 0.0, 0.0, 0.0, 0.0,
     0, 0, 0, 0, 0, 0),
]

# exp repulsion needs polarvdw (check_config) -> nonzero omega + alpha so
# the coupled-dipole path doesn't hit the 0-byte calloc
# (src/System.Energy.cpp:413); its vdw output is dead-dsyev garbage in the
# reference, so the fixture compares rd only
EXPREP_ATOMS = [
    ("He", "HEL", 1, 0.70, 0.25, -0.35, 4.0026, 0.0, 0.2049, 2.96, 2.67,
     0.4, 0, 0, 0, 0, 0),
    ("He", "HEL", 2, 3.55, 0.95, 0.65, 4.0026, 0.0, 0.2049, 2.96, 2.67,
     0.4, 0, 0, 0, 0, 0),
]

# oracle="direct": single-point via the linked driver (tools/ref_oracle.cpp)
# instead of the pi_nvt trick — needed for components the PI aggregation
# hides (three_body) or combinations PI refuses (feynman_hibbs, gwp)
DIRECT_CASES = {
    "axilrod_teller": dict(
        atoms=AT_ATOMS, extra="axilrod_teller on\n",
        compare=["rd", "three_body"]),
    "axilrod_teller_mk": dict(
        atoms=AT_ATOMS, extra="axilrod_teller on\nmidzuno_kihara_approx on\n",
        compare=["rd", "three_body"]),
    "lj_fh2": dict(atoms=MIXED_ATOMS,
                   extra="feynman_hibbs on\nfeynman_hibbs_order 2\n",
                   compare=["rd", "coulombic"]),
    "lj_fh4": dict(atoms=MIXED_ATOMS,
                   extra="feynman_hibbs on\nfeynman_hibbs_order 4\n",
                   compare=["rd", "coulombic"]),
    "anharmonic": dict(
        atoms=ANHARMONIC_ATOMS,
        extra="rd_only on\nrd_anharmonic on\nrd_anharmonic_k 600.0\n"
              "rd_anharmonic_g 12.0\nrd_lrc off\n",
        compare=["rd"]),
    "gwp_coulomb_kinetic": dict(
        atoms=GWP_ATOMS, extra="gwp on\nrd_lrc off\n",
        compare=["rd", "coulombic", "kinetic"]),
    "exp_repulsion": dict(
        atoms=EXPREP_ATOMS,
        extra="polarvdw on\ncdvdw_exp_repulsion on\nrd_lrc off\n"
              "polar_precision 0.00000001\n",
        compare=["rd"]),
    # the k-weight fix deviates from the reference here by design (README
    # Fidelity); the fixture records the reference value AND our measured
    # delta so the deviation stays pinned
    "polar_ewald_full": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative on\npolar_ewald_full on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"
              "polar_gamma 1.0\npolar_precision 0.00000001\n",
        compare=["rd", "coulombic", "polar"], record_delta=["polar"]),
}

# polarizability-tensor analysis mode (thole_polarizability_tensor,
# src/System.Energy.cpp:3714-3760): the oracle prints the tensor block and
# throws exception_ok; the fixture records the printed 3x3 + isotropic
TENSOR_CASES = {
    "polar_tensor": dict(
        atoms=TRIATOMIC,
        extra="polarization on\npolar_iterative off\n"
              "polarizability_tensor on\n"
              "polar_damp_type exponential\npolar_damp 2.1304\n"),
}

ORACLE = os.path.join(REPO, ".refbuild", "ref_oracle")


def build_oracle():
    if os.path.exists(ORACLE):
        return
    import glob as _glob
    objs = [o for o in _glob.glob(os.path.join(
        REPO, ".refbuild", "CMakeFiles", "mpmcxx.dir", "src", "*.o"))
        if not o.endswith("main.cpp.o")]
    subprocess.run(
        ["g++", "-O2", "-fopenmp", "-include", "ctime", "-include",
         "cstring", "-I/root/reference/src",
         os.path.join(REPO, "tools", "ref_oracle.cpp"), *objs,
         "-o", ORACLE], check=True)


def run_case_direct(name, spec):
    build_oracle()
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "base.pqr"), "w") as f:
            f.write(pqr_text(spec["atoms"]))
        with open(os.path.join(d, "run.in"), "w") as f:
            f.write(f"""job_name g
ensemble nvt
temperature 77.0
numsteps 1
corrtime 1
seed 42
pqr_input base.pqr
basis1 {BASIS} 0.0 0.0
basis2 0.0 {BASIS} 0.0
basis3 0.0 0.0 {BASIS}
{spec['extra']}""")
        r = subprocess.run([ORACLE, "run.in"], cwd=d, capture_output=True,
                           text=True, timeout=300)
        if r.returncode != 0 or not r.stdout.strip():
            print(f"FAILED {name}: rc={r.returncode}")
            print((r.stdout + r.stderr)[-2000:])
            return None
        got = json.loads(r.stdout.strip().splitlines()[-1])
        expected = {
            "energy": got["energy"], "coulombic": got["coulombic"],
            "rd": got["rd"], "polar": got["polar"], "vdw": got["vdw"],
            "three_body": got["three_body"], "kinetic": got["kinetic"],
        }
        fix = {
            "name": name,
            "oracle": "direct",
            "atoms": spec["atoms"],
            "basis": BASIS,
            "temperature": 77.0,
            "config_extra": spec["extra"],
            "compare": spec["compare"],
            "expected": expected,
        }
        for comp in spec.get("record_delta", []):
            delta = _our_value(fix, comp) - expected[
                "polar" if comp == "polar" else comp]
            # known_delta pins a hand-verified deviation of OUR code vs
            # the oracle; regenerating while a regression is present would
            # silently re-pin the wrong constant, so diff against the
            # committed fixture and warn loudly on drift.
            prev_path = os.path.join(OUT, f"{name}.json")
            if os.path.exists(prev_path):
                with open(prev_path) as pf:
                    prev = json.load(pf).get("known_delta", {}).get(comp)
                if prev is not None and abs(delta - prev) > 1e-9:
                    print(f"*** WARNING {name}: regenerated known_delta"
                          f"[{comp}] = {delta!r} differs from the "
                          f"committed {prev!r} — verify by hand before "
                          f"committing (a live regression would be "
                          f"re-pinned as 'expected')", file=sys.stderr)
            fix.setdefault("known_delta", {})[comp] = delta
        return fix


def run_case_tensor(name, spec):
    build_oracle()
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "base.pqr"), "w") as f:
            f.write(pqr_text(spec["atoms"]))
        with open(os.path.join(d, "run.in"), "w") as f:
            f.write(f"""job_name g
ensemble nvt
temperature 77.0
numsteps 1
corrtime 1
seed 42
pqr_input base.pqr
basis1 {BASIS} 0.0 0.0
basis2 0.0 {BASIS} 0.0
basis3 0.0 0.0 {BASIS}
{spec['extra']}""")
        r = subprocess.run([ORACLE, "run.in"], cwd=d, capture_output=True,
                           text=True, timeout=300)
        lines = r.stdout.splitlines()
        try:
            k = lines.index("POLARIZATION: polarizability tensor (A^3):")
        except ValueError:
            print(f"FAILED {name}: no tensor block (rc={r.returncode})")
            print((r.stdout + r.stderr)[-2000:])
            return None
        tensor = [[float(v) for v in lines[k + 2 + p].split()]
                  for p in range(3)]
        iso = float(lines[k + 6].split("=")[1])
        return {
            "name": name,
            "oracle": "tensor",
            "atoms": spec["atoms"],
            "basis": BASIS,
            "temperature": 77.0,
            "config_extra": spec["extra"],
            "expected": {"tensor": tensor, "isotropic": iso},
        }


def _our_value(fix, comp):
    """Compute our energy component for a fixture (CPU) — used to pin
    documented deviations as regression constants."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, REPO)
    from tests.test_golden import build_from_fixture, COMPONENT
    from mpmcxx_tpu.ops.energy import energy_breakdown
    state, flags, params = build_from_fixture(fix)
    eb = energy_breakdown(state, flags, params)
    return float(getattr(eb, COMPONENT[comp]))


def pqr_text(atoms):
    lines = []
    for i, a in enumerate(atoms, 1):
        (at, mt, mid, x, y, z, mass, q, al, eps, sig, om, gw, c6, c8, c10,
         c9) = a
        lines.append(
            f"ATOM  {i:5d} {at:<4s} {mt:<3s} M {mid:4d}   "
            f"{x:10.5f} {y:10.5f} {z:10.5f} {mass:9.5f} {q:9.5f} "
            f"{al:9.5f} {eps:9.5f} {sig:9.5f} {om:9.5f} {gw:9.5f} "
            f"{c6:9.5f} {c8:9.5f} {c10:9.5f} {c9:9.5f}")
    lines.append("END")
    return "\n".join(lines) + "\n"


def run_case(name, spec):
    with tempfile.TemporaryDirectory() as d:
        txt = pqr_text(spec["atoms"])
        with open(os.path.join(d, "base.pqr"), "w") as f:
            f.write(txt)
        for i in range(4):
            with open(os.path.join(d, f"g.restart-000{i}.pqr"), "w") as f:
                f.write(txt)
        with open(os.path.join(d, "run.in"), "w") as f:
            f.write(f"""job_name g
ensemble pi_nvt
temperature 77.0
numsteps 1
corrtime 1
seed 42
PI_trial_chain_length 2
bead_perturb_probability 1.0
pqr_input base.pqr
parallel_restarts on
basis1 {BASIS} 0.0 0.0
basis2 0.0 {BASIS} 0.0
basis3 0.0 0.0 {BASIS}
{spec['extra']}""")
        r = subprocess.run([REF, "-P", "4", "run.in"], cwd=d,
                           capture_output=True, text=True, timeout=300)
        dat = os.path.join(d, "g.energy.dat")
        if not os.path.exists(dat):
            print(f"FAILED {name}:")
            print(r.stdout[-2000:])
            return None
        with open(dat) as f:
            lines = f.read().splitlines()
        cols = lines[1].split()
        expected = {
            "energy": float(cols[1]), "coulombic": float(cols[2]),
            "rd": float(cols[3]), "polar": float(cols[4]),
            "vdw": float(cols[5]), "kinetic": float(cols[6]),
        }
        # sanity: identical beads -> kinetic must be exactly 1.5*N*T*P
        n_mol = len({a[2] for a in spec["atoms"]})
        assert abs(expected["kinetic"] - 1.5 * n_mol * 77.0 * 4) < 1e-3, \
            (name, expected["kinetic"])
        return {
            "name": name,
            "atoms": spec["atoms"],
            "basis": BASIS,
            "temperature": 77.0,
            "config_extra": spec["extra"],
            "expected": expected,
        }


def main():
    wanted = sys.argv[1:] or (list(CASES) + list(DIRECT_CASES) +
                              list(TENSOR_CASES))
    for name in wanted:
        if name in CASES:
            fix = run_case(name, CASES[name])
        elif name in TENSOR_CASES:
            fix = run_case_tensor(name, TENSOR_CASES[name])
        else:
            fix = run_case_direct(name, DIRECT_CASES[name])
        if fix is None:
            continue
        path = os.path.join(OUT, name + ".json")
        with open(path, "w") as f:
            json.dump(fix, f, indent=1)
        e = fix["expected"]
        if fix.get("oracle") == "tensor":
            print(f"{name}: tensor={e['tensor']} iso={e['isotropic']}")
            continue
        print(f"{name}: rd={e['rd']} coul={e['coulombic']} "
              f"polar={e['polar']} vdw={e['vdw']}"
              + (f" tb={e['three_body']} kin={e['kinetic']}"
                 if fix.get("oracle") == "direct" else "")
              + (f" delta={fix['known_delta']}"
                 if "known_delta" in fix else ""))


if __name__ == "__main__":
    main()
