"""Statistical-mechanics validation: exact ideal-gas answers.

These validate the Metropolis machinery itself (acceptance factors, move
selection, mask-based insertion/removal, volume moves) against closed-form
grand-canonical / isothermal-isobaric results — no reference runs needed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmcxx_tpu import FFlags, RunParams, constants as const
from mpmcxx_tpu.mc import chain as chain_mod
from mpmcxx_tpu.state import AtomRecord, build_state

pytestmark = pytest.mark.slow


def ideal_atoms(n, L, capacity_extra):
    atoms = [AtomRecord("Id", "IDL", m + 1,
                        x=(np.random.default_rng(m).uniform(-L / 2, L / 2)),
                        y=0.0, z=0.0, mass=10.0, epsilon=0.0, sigma=0.0,
                        charge=0.0)
             for m in range(n)]
    return build_state(atoms, np.eye(3) * L,
                       extra_mol_capacity=capacity_extra)


def run_chain(state, flags, params, opts, steps, seed, sample_every=16):
    carry = chain_mod.init_carry(state, flags, params, opts, seed)
    runner = chain_mod.make_chunk_runner(flags, params, opts, sample_every)
    Ns, Vs = [], []
    done = 0
    while done < steps:
        carry, _ = runner(carry)
        done += sample_every
        Ns.append(float(carry.obs.N))
        Vs.append(float(carry.state.pbc.volume))
    return np.asarray(Ns), np.asarray(Vs), carry


class TestIdealGasUVT:
    def test_mean_occupancy(self):
        # grand-canonical ideal gas: <N> = f V / (kT) in reduced units,
        # i.e. f * ATM2REDUCED * V / T
        L, T, f = 10.0, 100.0, 109.0
        expected = f * const.ATM2REDUCED * L ** 3 / T  # = 8.0
        state, _ = ideal_atoms(6, L, capacity_extra=40)
        flags = FFlags(rd_lrc=False)
        params = RunParams(temperature=T)
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_UVT, move_factor=0.2,
            insert_probability=0.6, fugacity=f, numsteps=100000,
            incremental=True, max_mol_atoms=1)
        Ns, _, carry = run_chain(state, flags, params, opts, 12000, seed=5)
        mean_N = Ns[20:].mean()
        # the never-remove-the-last-molecule rule (reference behavior)
        # biases upward by O(P(N=0)) ~ e^-8 — negligible here
        assert mean_N == pytest.approx(expected, abs=0.55), \
            (mean_N, expected)
        # occupancy must actually fluctuate
        assert Ns.std() > 1.0

    def test_capacity_exhaustion_rejects(self):
        # tiny capacity: chain must stay consistent when insertion slots
        # run out (valid=False -> reject)
        L, T, f = 10.0, 100.0, 500.0
        state, _ = ideal_atoms(2, L, capacity_extra=3)
        flags = FFlags(rd_lrc=False)
        params = RunParams(temperature=T)
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_UVT, move_factor=0.2,
            insert_probability=0.9, fugacity=f, numsteps=2000,
            incremental=True, max_mol_atoms=1)
        Ns, _, carry = run_chain(state, flags, params, opts, 2000, seed=1)
        assert Ns.max() <= 5  # capacity cap respected
        assert int(carry.obs.N) == int(carry.state.count_N())


class TestIdealGasNPT:
    def test_mean_volume(self):
        # the NPT factor's (N+1) ln(V'/V)
        # (src/System.MonteCarlo.cpp:1448-1452) is the standard form for
        # log-volume proposals (N ln from the ensemble + 1 ln from the
        # proposal jacobian), sampling p(V) ~ V^N exp(-P V / T):
        # <V> = (N+1) T / (P*ATM2REDUCED)
        N, T, P = 8, 100.0, 50.0
        expected = (N + 1) * T / (P * const.ATM2REDUCED)
        state, _ = ideal_atoms(N, 10.0, capacity_extra=0)
        flags = FFlags(rd_lrc=False)
        params = RunParams(temperature=T, pressure=P)
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_NPT, move_factor=0.2,
            volume_probability=0.5, volume_change_factor=0.5,
            numsteps=100000, incremental=True, max_mol_atoms=1)
        _, Vs, _ = run_chain(state, flags, params, opts, 12000, seed=9)
        mean_V = Vs[40:].mean()
        assert mean_V == pytest.approx(expected, rel=0.10), \
            (mean_V, expected)


class TestDetailedBalanceNVT:
    def test_boltzmann_sampling_harmonic_like(self):
        # two LJ atoms in a box: long-run mean energy must match a direct
        # numerical canonical average over the pair separation
        L, T = 12.0, 150.0
        eps, sig = 119.8, 3.0
        atoms = [AtomRecord("Ar", "AR", 1, x=-2.0, mass=39.9, epsilon=eps,
                            sigma=sig),
                 AtomRecord("Ar", "AR", 2, x=2.0, mass=39.9, epsilon=eps,
                            sigma=sig)]
        state, _ = build_state(atoms, np.eye(3) * L)
        flags = FFlags(rd_lrc=False)
        params = RunParams(temperature=T)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVT,
                                   move_factor=0.35, numsteps=100000,
                                   incremental=True, max_mol_atoms=1)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=3)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 64)
        Es = []
        for _ in range(250):
            carry, _ = runner(carry)
            Es.append(float(carry.obs.energy))
        mc_mean = np.mean(Es[50:])

        # direct numerical canonical average over the minimum-image cell
        rng = np.random.default_rng(0)
        d = rng.uniform(-L / 2, L / 2, size=(400000, 3))
        r = np.linalg.norm(d, axis=1)
        r = r[(r < L / 2)]  # inside cutoff: energy 0 outside, weight 1
        sor6 = (sig / r) ** 6
        e = 4 * eps * (sor6 ** 2 - sor6)
        w = np.exp(-np.clip(e / T, -50, 50))
        # outside-cutoff states have e=0, w=1: include their volume fraction
        vol_frac_out = 1.0 - (len(r) / 400000)
        direct = (e * w).sum() / (w.sum() + vol_frac_out * 400000)
        assert mc_mean == pytest.approx(direct, abs=12.0), \
            (mc_mean, direct)


class TestMicrocanonicalNVE:
    def test_configurational_weight(self):
        # NVE MC samples configurations with the microcanonical weight the
        # acceptance ratio implements: p(x) ~ (E_tot - U(x))^{3N/2}
        # (src/System.MonteCarlo.cpp:1459-1462, with the intended movable-
        # molecule N; the reference's own N is latently stuck at 0, see
        # README Fidelity / src/System.cpp:916-927).  Two LJ atoms,
        # N = 2 -> exponent 3; <U> must match direct numerical integration
        # over the minimum-image cell.
        L, E_tot = 10.0, 300.0
        eps, sig = 119.8, 3.0
        atoms = [AtomRecord("Ar", "AR", 1, x=-2.0, mass=39.9, epsilon=eps,
                            sigma=sig),
                 AtomRecord("Ar", "AR", 2, x=2.0, mass=39.9, epsilon=eps,
                            sigma=sig)]
        state, _ = build_state(atoms, np.eye(3) * L)
        flags = FFlags(rd_lrc=False)
        params = RunParams(temperature=100.0, total_energy=E_tot)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVE,
                                   move_factor=2.5, numsteps=100000,
                                   incremental=True, max_mol_atoms=1)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=11)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 64)
        Es, kin = [], []
        for _ in range(300):
            carry, _ = runner(carry)
            Es.append(float(carry.obs.energy))
            kin.append(float(carry.obs.kinetic_energy))
        mc_mean = np.mean(Es[60:])

        # NVE bookkeeping: kinetic = E_tot - U every step
        np.testing.assert_allclose(np.asarray(kin),
                                   E_tot - np.asarray(Es), rtol=1e-12)

        # direct integration: min-image displacement is uniform on the
        # cube; weight (E_tot - U)^3 clamped at 0 (E > E_tot rejected)
        rng = np.random.default_rng(0)
        d = rng.uniform(-L / 2, L / 2, size=(2000000, 3))
        r = np.linalg.norm(d, axis=1)
        e = np.zeros_like(r)
        inside = r < L / 2
        sor6 = (sig / r[inside]) ** 6
        e[inside] = 4 * eps * (sor6 ** 2 - sor6)
        w = np.clip(E_tot - e, 0.0, None) ** 3
        direct = (e * w).sum() / w.sum()
        assert mc_mean == pytest.approx(direct, abs=8.0), (mc_mean, direct)

    def test_high_energy_moves_accepted(self):
        # with E_tot huge the weight ratio -> 1: acceptance must approach
        # 100% (the microcanonical factor, not some hidden NVT exp)
        L = 10.0
        atoms = [AtomRecord("Ar", "AR", 1, x=-2.0, mass=39.9, epsilon=119.8,
                            sigma=3.0),
                 AtomRecord("Ar", "AR", 2, x=2.0, mass=39.9, epsilon=119.8,
                            sigma=3.0)]
        state, _ = build_state(atoms, np.eye(3) * L)
        flags = FFlags(rd_lrc=False)
        params = RunParams(temperature=100.0, total_energy=1.0e8)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVE,
                                   move_factor=0.5, numsteps=2000,
                                   incremental=True, max_mol_atoms=1)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=2)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 64)
        for _ in range(8):
            carry, _ = runner(carry)
        acc = np.asarray(carry.stats.accept).sum()
        rej = np.asarray(carry.stats.reject).sum()
        assert acc / (acc + rej) > 0.97
