"""Golden fidelity gate: single-point energies vs the compiled reference.

Fixtures in tests/golden/*.json were produced by tools/make_golden.py
running the actual reference binary on shared configurations; each records
the (rd, coulombic, polar, vdw) breakdown printed to energy.dat (6 decimal
places).  Our energies must match to the print quantum.
"""

import glob
import json
import os

import numpy as np
import pytest

from mpmcxx_tpu import constants as const
from mpmcxx_tpu.config.parser import parse_config
from mpmcxx_tpu.ops.energy import energy_breakdown
from mpmcxx_tpu.state import AtomRecord, build_state

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.json")))


def build_from_fixture(fix):
    if "pqr_text" in fix:
        # fixture carries a literal PQR (e.g. a reference restart
        # snapshot with equilibrated SPECTRE charges + S/T flags)
        from mpmcxx_tpu.io.pqr import read_pqr
        atoms = read_pqr(fix["pqr_text"], is_text=True)
    else:
        atoms = []
        for (at, mt, mid, x, y, z, mass, q, al, eps, sig, om, gw, c6, c8,
             c10, c9) in fix["atoms"]:
            atoms.append(AtomRecord(
                atomtype=at, moleculetype=mt, molecule_id=mid, x=x, y=y,
                z=z, mass=mass, charge=q * const.E2REDUCED,
                polarizability=al, epsilon=eps, sigma=sig, omega=om,
                gwp_alpha=gw, c6=c6, c8=c8, c10=c10, c9=c9))
    basis = np.eye(3) * fix["basis"]
    state, _ = build_state(atoms, basis)

    cfg = parse_config(fix["config_extra"])
    cfg.temperature = fix["temperature"]
    flags = cfg.to_flags()
    params = cfg.to_params()
    # ewald alpha default: 3.5 / cutoff (src/System.cpp:871-874)
    cutoff = fix["basis"] / 2.0
    import dataclasses
    if not cfg.ewald_alpha_set:
        params = dataclasses.replace(params, ewald_alpha=3.5 / cutoff)
    if not cfg.polar_ewald_alpha_set:
        params = dataclasses.replace(params, polar_ewald_alpha=3.5 / cutoff)
    return state, flags, params


# fixture component name -> EnergyBreakdown field
COMPONENT = {
    "rd": "rd",
    "coulombic": "coulombic",
    "polar": "polarization",
    "vdw": "vdw",
    "three_body": "three_body",
    "kinetic": "kinetic",
}


@pytest.mark.parametrize(
    "path", FIXTURES, ids=[os.path.basename(p)[:-5] for p in FIXTURES])
def test_golden(path):
    with open(path) as f:
        fix = json.load(f)
    if fix.get("oracle") == "tensor":
        pytest.skip("tensor fixture, covered by test_polarizability_tensor")
    if "atoms" not in fix and "pqr_text" not in fix:
        pytest.skip("config-less fixture, covered by a dedicated test")
    state, flags, params = build_from_fixture(fix)
    eb = energy_breakdown(state, flags, params)
    exp = fix["expected"]
    # energy.dat prints %f (6 decimals); the direct oracle 10 — allow one
    # PI print quantum of slack either way
    atol = 2e-6
    compare = fix.get("compare", ["rd", "coulombic", "polar", "vdw"])
    deltas = fix.get("known_delta", {})
    for comp in compare:
        ours = float(getattr(eb, COMPONENT[comp]))
        want = exp[comp] + deltas.get(comp, 0.0)
        assert ours == pytest.approx(want, abs=atol), comp


def test_polarizability_tensor():
    """3x3 molecular polarizability tensor vs the reference's
    thole_polarizability_tensor printout (src/System.Energy.cpp:3714-3760;
    fixture = the parsed 4-decimal print)."""
    import io

    from mpmcxx_tpu.ops.polar import (polarizability_tensor_report,
                                      print_polarizability_tensor)

    path = os.path.join(GOLDEN_DIR, "polar_tensor.json")
    with open(path) as f:
        fix = json.load(f)
    state, flags, params = build_from_fixture(fix)
    _, _, C, iso = polarizability_tensor_report(state, flags, params)
    want = np.asarray(fix["expected"]["tensor"])
    # the fixture records the reference's %.4f print — one print quantum
    assert np.max(np.abs(C - want)) < 2e-4
    assert abs(iso - fix["expected"]["isotropic"]) < 2e-4

    # the report printer must emit the reference's tensor block format
    buf = io.StringIO()
    print_polarizability_tensor(state, flags, params, buf)
    text = buf.getvalue()
    assert "POLAR: A matrix:" in text
    assert "POLAR: B matrix:" in text
    assert "POLARIZATION: polarizability tensor (A^3):" in text
    assert f"isotropic = {fix['expected']['isotropic']:.4f}" in text


@pytest.mark.slow
def test_flagship_co2_singlepoint():
    """Full-scale multi-site flagship fidelity gate: the 10,112-atom CO2
    GCMC configuration's single-point breakdown vs the reference binary
    (fixture from tools/measure_baseline.py --model co2, pi_nvt
    identical-beads row 0)."""
    import sys

    path = os.path.join(GOLDEN_DIR, "flagship_co2_singlepoint.json")
    if not os.path.exists(path):
        pytest.skip("fixture not generated (tools/measure_baseline.py "
                    "--model co2)")
    with open(path) as f:
        fix = json.load(f)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import flagship
    from mpmcxx_tpu.ops.energy import energy_breakdown_blocked

    state, _meta, flags, params, _opts = flagship.build_state_co2()
    eb = energy_breakdown_blocked(state, flags, params)
    exp = fix["expected"]
    # energy.dat prints 6 decimals; components here are O(1e5-1e6) K, so
    # gate on relative error at the 1e-6 contract
    for comp, field in (("rd", "rd"), ("coulombic", "coulombic"),
                        ("polar", "polarization")):
        ours = float(getattr(eb, field))
        assert ours == pytest.approx(exp[comp], rel=2e-6, abs=2e-5), comp


@pytest.mark.slow
def test_flagship_h2_singlepoint():
    """Full-scale 5-site flagship fidelity gate: the 10,512-atom BSS*-H2
    GCMC configuration's single-point breakdown vs the reference binary
    (fixture from tools/measure_baseline.py --model h2) — exercises
    zero-mass / zero-alpha / zero-LJ sites against the reference's
    null-interaction exclusions (src/System.cpp:1050-1063)."""
    import sys

    path = os.path.join(GOLDEN_DIR, "flagship_h2_singlepoint.json")
    if not os.path.exists(path):
        pytest.skip("fixture not generated (tools/measure_baseline.py "
                    "--model h2)")
    with open(path) as f:
        fix = json.load(f)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import flagship
    from mpmcxx_tpu.ops.energy import energy_breakdown_blocked

    state, _meta, flags, params, _opts = flagship.build_state_h2()
    eb = energy_breakdown_blocked(state, flags, params)
    exp = fix["expected"]
    for comp, field in (("rd", "rd"), ("coulombic", "coulombic"),
                        ("polar", "polarization")):
        ours = float(getattr(eb, field))
        assert ours == pytest.approx(exp[comp], rel=2e-6, abs=2e-5), comp
