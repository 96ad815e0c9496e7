"""Blocked (tiled) energy paths must match the dense reference paths."""

import numpy as np
import pytest

from mpmcxx_tpu import FFlags, RunParams, constants as const
from mpmcxx_tpu.ops.energy import energy_breakdown, energy_breakdown_blocked
from mpmcxx_tpu.state import AtomRecord, build_state


def random_system(n=80, L=22.0, polar=False, seed=4, molecules_of=2):
    rng = np.random.default_rng(seed)
    atoms = []
    mid = 0
    m = 0
    while m < n:
        mid += 1
        base = rng.uniform(-L / 2, L / 2, 3)
        for a in range(molecules_of):
            if m >= n:
                break
            m += 1
            off = rng.normal(0, 1.3, 3)
            atoms.append(AtomRecord(
                "X", "MOL", mid, x=base[0] + off[0], y=base[1] + off[1],
                z=base[2] + off[2], mass=16.0,
                charge=408.7816 * (0.15 if m % 2 else -0.15),
                polarizability=0.35 if polar else 0.0,
                epsilon=90.0, sigma=3.2))
    return build_state(atoms, np.eye(3) * L)


@pytest.mark.parametrize("block", [16, 64, 128])
def test_blocked_lj_ewald_matches_dense(block):
    state, _ = random_system()
    flags = FFlags()
    params = RunParams(temperature=120.0, ewald_alpha=3.5 / 11.0)
    a = energy_breakdown(state, flags, params)
    b = energy_breakdown_blocked(state, flags, params, block=block)
    assert float(b.rd) == pytest.approx(float(a.rd), abs=1e-8)
    assert float(b.coulombic) == pytest.approx(float(a.coulombic), abs=1e-8)


@pytest.mark.slow
def test_blocked_polar_iterative_matches_dense():
    state, _ = random_system(n=48, polar=True)
    flags = FFlags(polarization=True, polar_iterative=True, polar_ewald=True,
                   damp_type=const.DAMPING_EXPONENTIAL)
    params = RunParams(temperature=120.0, ewald_alpha=3.5 / 11.0,
                       polar_ewald_alpha=3.5 / 11.0, polar_damp=2.1304,
                       polar_gamma=1.0, polar_precision=1e-9)
    a = energy_breakdown(state, flags, params)
    b = energy_breakdown_blocked(state, flags, params, block=16)
    assert float(b.polarization) == pytest.approx(float(a.polarization),
                                                  rel=1e-9)


def test_blocked_polar_exact_cg_matches_dense():
    state, _ = random_system(n=48, polar=True)
    flags = FFlags(polarization=True, polar_iterative=False,
                   polar_ewald=True, damp_type=const.DAMPING_EXPONENTIAL,
                   polar_max_iter=10)
    params = RunParams(temperature=120.0, ewald_alpha=3.5 / 11.0,
                       polar_ewald_alpha=3.5 / 11.0, polar_damp=2.1304)
    a = energy_breakdown(state, flags, params)
    b = energy_breakdown_blocked(state, flags, params, block=16)
    assert float(b.polarization) == pytest.approx(float(a.polarization),
                                                  rel=1e-9)


def test_blocked_wolf_and_sg():
    state, _ = random_system()
    for fl in (FFlags(wolf=True), FFlags(use_sg=True)):
        params = RunParams(temperature=120.0, ewald_alpha=0.3)
        a = energy_breakdown(state, fl, params)
        b = energy_breakdown_blocked(state, fl, params, block=32)
        assert float(b.rd) == pytest.approx(float(a.rd), abs=1e-8)
        assert float(b.coulombic) == pytest.approx(float(a.coulombic),
                                                   abs=1e-8)


@pytest.mark.slow
def test_mixed_precision_polar_matches_f64():
    """polar_mixed (f32 precomputed SCF coefficients) must agree with the
    f64 blocked path to well under thermal resolution (~1e-5 relative)."""
    state, _ = random_system(n=64, polar=True)
    params = RunParams(temperature=120.0, ewald_alpha=3.5 / 11.0,
                       polar_ewald_alpha=3.5 / 11.0, polar_damp=2.1304,
                       polar_gamma=1.0, polar_precision=1e-9)
    for extra in (dict(polar_iterative=True),
                  dict(polar_iterative=False, polar_max_iter=10),
                  dict(polar_iterative=True, polar_palmo=True)):
        f64 = FFlags(polarization=True, polar_ewald=True,
                     damp_type=const.DAMPING_EXPONENTIAL, **extra)
        mix = f64.replace(polar_mixed=True)
        a = energy_breakdown_blocked(state, f64, params, block=16)
        b = energy_breakdown_blocked(state, mix, params, block=16)
        assert float(b.polarization) == pytest.approx(
            float(a.polarization), rel=3e-5)
        assert float(b.polarization) != float(a.polarization) or \
            float(a.polarization) == 0.0

    # polar_wolf_full keeps the unfolded 5-plane form (sign-indefinite
    # c_outer, ops.polar.fold_outer_rows) — cover that branch too
    f64 = FFlags(polarization=True, polar_wolf_full=True,
                 damp_type=const.DAMPING_EXPONENTIAL, polar_iterative=True)
    a = energy_breakdown_blocked(state, f64, params, block=16)
    b = energy_breakdown_blocked(state, f64.replace(polar_mixed=True),
                                 params, block=16)
    assert float(b.polarization) == pytest.approx(
        float(a.polarization), rel=3e-5)

    # the polar_plane_mode=4 knob forces the folded form under
    # exponential damping (the HBM-vs-VPU perf A/B, docs/PERF.md):
    # same math as the auto 3-plane in-kernel recompute
    f64 = FFlags(polarization=True, polar_ewald=True,
                 damp_type=const.DAMPING_EXPONENTIAL, polar_iterative=True)
    from mpmcxx_tpu.ops.polar import plane_mode
    assert plane_mode(f64) == 3
    assert plane_mode(f64.replace(polar_plane_mode=4)) == 4
    m3 = energy_breakdown_blocked(state, f64.replace(polar_mixed=True),
                                  params, block=16)
    m4 = energy_breakdown_blocked(
        state, f64.replace(polar_mixed=True, polar_plane_mode=4),
        params, block=16)
    assert float(m4.polarization) == pytest.approx(
        float(m3.polarization), rel=1e-6)

    # linear damping takes the folded 4-plane form (per-pair damping
    # widths block the in-kernel recompute) — cover that branch too
    for dt in (const.DAMPING_LINEAR, const.DAMPING_OFF):
        f64 = FFlags(polarization=True, polar_ewald=True,
                     damp_type=dt, polar_iterative=True)
        from mpmcxx_tpu.ops.polar import plane_mode
        assert plane_mode(f64) == 4
        a = energy_breakdown_blocked(state, f64, params, block=16)
        b = energy_breakdown_blocked(state, f64.replace(polar_mixed=True),
                                     params, block=16)
        assert float(b.polarization) == pytest.approx(
            float(a.polarization), rel=3e-5)


def test_mixed_precision_parses_from_input(tmp_path):
    from mpmcxx_tpu.config.parser import parse_config
    cfg = parse_config("""
job_name t
ensemble nvt
temperature 50
numsteps 1
polarization on
polar_iterative on
polar_mixed on
polar_max_iter 4
pqr_input x.pqr
""")
    assert cfg.polar_mixed
    assert cfg.to_flags().polar_mixed
