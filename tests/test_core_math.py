"""Unit tests for PBC, quaternions, and basic energy terms vs hand values."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpmcxx_tpu import PBC, FFlags, RunParams, constants as const
from mpmcxx_tpu.pbc import minimum_image_disp
from mpmcxx_tpu import quaternion as quat
from mpmcxx_tpu.state import AtomRecord, build_state
from mpmcxx_tpu.ops.energy import energy_breakdown, total_energy


def cubic(L):
    return np.eye(3) * L


def make_two_atoms(r, L=100.0, eps=119.8, sig=3.405, charge=0.0, alpha=0.0,
                   mass=39.948, extra=None, **kw):
    a1 = AtomRecord(atomtype="Ar", moleculetype="Ar", molecule_id=1,
                    x=0, y=0, z=0, mass=mass, epsilon=eps, sigma=sig,
                    charge=charge, polarizability=alpha, **kw)
    a2 = AtomRecord(atomtype="Ar", moleculetype="Ar", molecule_id=2,
                    x=r, y=0, z=0, mass=mass, epsilon=eps, sigma=sig,
                    charge=-charge, polarizability=alpha, **kw)
    atoms = [a1, a2] + (extra or [])
    state, meta = build_state(atoms, cubic(L))
    return state


class TestPBC:
    def test_cubic_volume_cutoff(self):
        p = PBC.from_basis(cubic(20.0))
        assert float(p.volume) == pytest.approx(8000.0)
        assert float(p.cutoff) == pytest.approx(10.0)

    def test_reciprocal_matches_reference_cofactors(self):
        # explicit cofactor formulas from src/PeriodicBoundary.cpp:83-101
        rng = np.random.default_rng(0)
        B = np.eye(3) * 10 + rng.normal(size=(3, 3))
        p = PBC.from_basis(B)
        iv = 1.0 / np.linalg.det(B)
        ref = np.empty((3, 3))
        ref[0, 0] = iv * (B[1][1] * B[2][2] - B[1][2] * B[2][1])
        ref[0, 1] = iv * (B[0][2] * B[2][1] - B[0][1] * B[2][2])
        ref[0, 2] = iv * (B[0][1] * B[1][2] - B[0][2] * B[1][1])
        ref[1, 0] = iv * (B[1][2] * B[2][0] - B[1][0] * B[2][2])
        ref[1, 1] = iv * (B[0][0] * B[2][2] - B[0][2] * B[2][0])
        ref[1, 2] = iv * (B[0][2] * B[1][0] - B[0][0] * B[1][2])
        ref[2, 0] = iv * (B[1][0] * B[2][1] - B[1][1] * B[2][0])
        ref[2, 1] = iv * (B[0][1] * B[2][0] - B[0][0] * B[2][1])
        ref[2, 2] = iv * (B[0][0] * B[1][1] - B[0][1] * B[1][0])
        np.testing.assert_allclose(np.asarray(p.reciprocal), ref, rtol=1e-12)

    def test_minimum_image_cubic(self):
        p = PBC.from_basis(cubic(10.0))
        d = jnp.asarray([[9.0, 0.0, 0.0], [4.0, -6.0, 0.0]])
        di, ri = minimum_image_disp(d, p.basis, p.reciprocal)
        np.testing.assert_allclose(np.asarray(di),
                                   [[-1.0, 0, 0], [4.0, 4.0, 0]], atol=1e-12)
        np.testing.assert_allclose(np.asarray(ri), [1.0, np.sqrt(32)],
                                   rtol=1e-12)

    def test_triclinic_cutoff(self):
        B = np.array([[10.0, 0, 0], [5.0, 8.66, 0], [0, 0, 30.0]])
        p = PBC.from_basis(B)
        # shortest lattice vector of this hexagonal-ish cell is 10
        assert float(p.cutoff) == pytest.approx(0.5 * 9.999780, rel=1e-3)


class TestQuaternion:
    def test_rotate_90deg_z(self):
        q = quat.from_axis_angle_deg(jnp.asarray([0.0, 0.0, 1.0]), 90.0)
        v = quat.rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(v), [0, 1, 0], atol=1e-12)

    def test_rotation_preserves_norm(self):
        rng = np.random.default_rng(1)
        axis = jnp.asarray(rng.normal(size=3))
        q = quat.from_axis_angle(axis, 1.234)
        v = jnp.asarray(rng.normal(size=(5, 3)))
        out = quat.rotate(q, v)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                                   np.linalg.norm(v, axis=-1), rtol=1e-12)

    def test_matches_rotation_matrix(self):
        rng = np.random.default_rng(2)
        q = quat.from_axis_angle(jnp.asarray(rng.normal(size=3)), 0.7)
        R = quat.rotation_matrix(q)
        v = jnp.asarray(rng.normal(size=3))
        np.testing.assert_allclose(np.asarray(quat.rotate(q, v)),
                                   np.asarray(R @ v), rtol=1e-10)


class TestLJ:
    def test_two_atom_lj_no_lrc(self):
        r, eps, sig = 4.0, 119.8, 3.405
        state = make_two_atoms(r)
        flags = FFlags(rd_lrc=False)
        params = RunParams(temperature=100.0)
        eb = energy_breakdown(state, flags, params)
        sor6 = (sig / r) ** 6
        expected = 4 * eps * (sor6 ** 2 - sor6)
        assert float(eb.rd) == pytest.approx(expected, rel=1e-12)
        assert float(eb.coulombic) == 0.0

    def test_two_atom_lj_with_lrc(self):
        r, eps, sig, L = 4.0, 119.8, 3.405, 100.0
        state = make_two_atoms(r)
        flags = FFlags(rd_lrc=True)
        eb = energy_breakdown(state, flags, RunParams(temperature=100.0))
        cutoff, vol = L / 2, L ** 3
        sig_cut = sig / cutoff
        sig3 = sig ** 3
        pair_lrc = (16.0 / 3.0) * const.pi * eps * sig3 * (
            (1.0 / 3.0) * sig_cut ** 9 - sig_cut ** 3) / vol
        sor6 = (sig / r) ** 6
        expected = 4 * eps * (sor6 ** 2 - sor6) + 3 * pair_lrc  # pair + 2 self
        assert float(eb.rd) == pytest.approx(expected, rel=1e-12)

    def test_beyond_cutoff_is_lrc_only(self):
        # place the pair so its *minimum image* distance (55*sqrt(3) ~ 77.9)
        # exceeds the 50 A cutoff
        a1 = AtomRecord(moleculetype="Ar", molecule_id=1, x=0, y=0, z=0,
                        mass=39.948, epsilon=119.8, sigma=3.405)
        a2 = AtomRecord(moleculetype="Ar", molecule_id=2, x=55, y=55, z=55,
                        mass=39.948, epsilon=119.8, sigma=3.405)
        state, _ = build_state([a1, a2], cubic(100.0))
        flags = FFlags(rd_lrc=False)
        eb = energy_breakdown(state, flags, RunParams(temperature=100.0))
        assert float(eb.rd) == 0.0

    def test_same_molecule_excluded(self):
        a1 = AtomRecord(moleculetype="M", molecule_id=1, x=0, epsilon=10,
                        sigma=3, mass=1)
        a2 = AtomRecord(moleculetype="M", molecule_id=1, x=3.5, epsilon=10,
                        sigma=3, mass=1)
        state, _ = build_state([a1, a2], cubic(50))
        eb = energy_breakdown(state, FFlags(rd_lrc=False), RunParams())
        assert float(eb.rd) == 0.0


class TestEwald:
    def test_neutral_pair_vs_direct_sum(self):
        # +q/-q pair: Ewald total must match a (slowly converged) direct
        # lattice sum of the Coulomb energy.
        q = 1.0 * const.E2REDUCED
        L, r = 20.0, 3.0
        a1 = AtomRecord(moleculetype="A", molecule_id=1, x=0, mass=1,
                        charge=q)
        a2 = AtomRecord(moleculetype="B", molecule_id=2, x=r, mass=1,
                        charge=-q)
        state, _ = build_state([a1, a2], cubic(L))
        flags = FFlags(rd_lrc=False, ewald_kmax=12)
        params = RunParams(temperature=10.0, ewald_alpha=3.5 / (L / 2))
        eb = energy_breakdown(state, flags, params)

        # direct sum over shells of images (conditionally convergent; use
        # spherical cutoff with many shells and charge neutrality)
        n = 14
        rng = np.arange(-n, n + 1)
        cells = np.stack(np.meshgrid(rng, rng, rng, indexing="ij"),
                         -1).reshape(-1, 3) * L
        pos = np.array([[0, 0, 0], [r, 0, 0]])
        qs = np.array([q, -q])
        E = 0.0
        for c in cells:
            for i in range(2):
                for j in range(2):
                    dv = pos[i] - pos[j] + c
                    dist = np.linalg.norm(dv)
                    if dist == 0:
                        continue
                    E += 0.5 * qs[i] * qs[j] / dist
        # the cube-shell direct sum converges to the *vacuum*-boundary
        # energy; Ewald (no surface term, as in the reference) gives the
        # tin-foil value: direct - 2*pi*|M|^2/(3V)
        M2 = (q * r) ** 2
        E_tinfoil = E - 2.0 * const.pi * M2 / (3.0 * L ** 3)
        assert float(eb.coulombic) == pytest.approx(E_tinfoil, rel=2e-4)

    def test_wolf_hand_value(self):
        # damped-shifted Wolf formula (src/System.Energy.cpp:1443-1445):
        # q1 q2 (1/r - erf(aR)/R - (R - r)/R^2)
        from math import erf
        q = 0.5 * const.E2REDUCED
        r, L, a = 4.0, 40.0, 0.2
        a1 = AtomRecord(moleculetype="A", molecule_id=1, x=0, mass=1, charge=q)
        a2 = AtomRecord(moleculetype="B", molecule_id=2, x=r, mass=1,
                        charge=-q)
        state, _ = build_state([a1, a2], cubic(L))
        pw = energy_breakdown(state, FFlags(rd_lrc=False, wolf=True),
                              RunParams(ewald_alpha=a)).coulombic
        R = L / 2
        expected = -q * q * (1 / r - erf(a * R) / R - (R - r) / R ** 2)
        assert float(pw) == pytest.approx(expected, rel=1e-12)


class TestPolarization:
    def _dimer(self, alpha, r, q=1.0):
        a1 = AtomRecord(moleculetype="A", molecule_id=1, x=0, mass=1,
                        charge=q * const.E2REDUCED, polarizability=alpha)
        a2 = AtomRecord(moleculetype="B", molecule_id=2, x=r, mass=1,
                        charge=-q * const.E2REDUCED, polarizability=alpha)
        state, _ = build_state([a1, a2], cubic(60))
        return state

    def test_iterative_matches_exact(self):
        state = self._dimer(1.0, 4.0)
        params = RunParams(temperature=10, polar_damp=2.1304,
                           polar_precision=1e-10, polar_gamma=1.0)
        base = dict(rd_lrc=False, polarization=True,
                    damp_type=const.DAMPING_EXPONENTIAL)
        e_iter = energy_breakdown(state, FFlags(polar_iterative=True, **base),
                                  params)
        e_exact = energy_breakdown(state, FFlags(polar_iterative=False, **base),
                                   params)
        assert float(e_iter.polarization) == pytest.approx(
            float(e_exact.polarization), rel=1e-8)
        assert not bool(e_iter.iterator_failed)
        assert float(e_iter.polarization) < 0.0  # induction is attractive

    def test_single_dipole_in_field_analytic(self):
        # one polarizable atom + one fixed distant charge, no damping:
        # E_pol = -1/2 alpha E^2 with E = q/r^2
        q = 2.0 * const.E2REDUCED
        alpha = 1.5
        r = 10.0
        a1 = AtomRecord(moleculetype="A", molecule_id=1, x=0, mass=1,
                        charge=q)
        a2 = AtomRecord(moleculetype="B", molecule_id=2, x=r, mass=1,
                        polarizability=alpha, charge=0.0)
        state, _ = build_state([a1, a2], cubic(100))
        flags = FFlags(rd_lrc=False, polarization=True, polar_iterative=False,
                       damp_type=const.DAMPING_OFF)
        eb = energy_breakdown(state, flags, RunParams())
        E = q / r ** 2
        assert float(eb.polarization) == pytest.approx(-0.5 * alpha * E * E,
                                                       rel=1e-10)


class TestPolarVdw:
    def test_two_drude_sites_attractive(self):
        # two coupled Drude oscillators: E < 0 and ~ -C6/r^6 at long range
        alpha, omega = 1.0, 0.5
        def mk(r):
            a1 = AtomRecord(moleculetype="A", molecule_id=1, x=0, mass=1,
                            polarizability=alpha, omega=omega, epsilon=1,
                            sigma=1)
            a2 = AtomRecord(moleculetype="B", molecule_id=2, x=r, mass=1,
                            polarizability=alpha, omega=omega, epsilon=1,
                            sigma=1)
            state, _ = build_state([a1, a2], cubic(60))
            return state
        # exponential Thole damping with a large damp constant ~= undamped
        flags = FFlags(rd_lrc=False, polarvdw=True, polarization=True,
                       polar_iterative=False,
                       damp_type=const.DAMPING_EXPONENTIAL)
        params = RunParams(polar_damp=5.0)
        e6 = float(energy_breakdown(mk(6.0), flags, params).vdw)
        e8 = float(energy_breakdown(mk(8.0), flags, params).vdw)
        assert e6 < 0 and e8 < 0
        # r^-6 scaling
        assert e6 / e8 == pytest.approx((8.0 / 6.0) ** 6, rel=0.05)


class TestTpuRangeInvariants:
    """TPU 'f64' is double-word f32 emulation with f32's exponent range:
    every device-side constant must stay within ~1e+-30 (CPU tests cannot
    catch the overflow itself, so pin the magnitudes)."""

    def test_maxvalue_within_tpu_f64_range(self):
        from mpmcxx_tpu import constants as const
        assert 1e20 <= const.MAXVALUE < 1e38

    def test_pi_folded_constants_in_range(self):
        from mpmcxx_tpu.mc import pi
        for name in ("_C_KIN", "_C_CHAIN", "_C_ORIENT", "_C_SIGMA",
                     "_C_KH"):
            v = abs(getattr(pi, name))
            assert 1e-30 < v < 1e30, (name, v)
