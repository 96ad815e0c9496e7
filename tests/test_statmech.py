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
    def test_factor_log_space_matches_pow_and_survives_overflow(self):
        # the log-space evaluation must (a) match the reference's direct
        # pow ratio bit-closely in the normal regime, (b) preserve the
        # C-pow sign quirk (E > E_tot with integral 3N/2 keeps moving,
        # non-integral rejects), and (c) stay finite at atom counts
        # where the direct pow overflows (the TPU emulated-f64 exponent
        # range is ~1e+-38; even CPU f64 dies by N ~ 140 here)
        from mpmcxx_tpu.mc import metropolis

        f = lambda *a: float(metropolis.nve_factor(*map(jnp.float64, a)))
        # (a) normal regime vs direct pow
        for N in (2, 5, 24):
            direct = ((300.0 - 120.0) ** (1.5 * N)
                      / (300.0 - 150.0) ** (1.5 * N))
            assert f(300.0, 150.0, 120.0, N) == pytest.approx(
                direct, rel=1e-12)
        # (b) sign quirk: E > E_tot, 3N/2 = 9 (integral) -> positive
        # ratio (chain moves); N = 3 -> 4.5 (non-integral) -> pow(neg)
        # is NaN in C -> reject (0 here)
        assert f(900.0, 96000.0, 95000.0, 6) == pytest.approx(
            ((900.0 - 95000.0) / (900.0 - 96000.0)) ** 9.0, rel=1e-12)
        # crossing num>0, den<0 with odd integral power -> negative in C
        # -> uniform < bf never accepts; ours must also never accept
        assert f(900.0, 96000.0, 800.0, 6) < 0.0
        assert f(900.0, 96000.0, 95000.0, 3) == 0.0
        # the reference's latent N=0 (src/System.cpp:916-927) degenerates
        # to pow(x,0)/pow(y,0) = 1 (always accept) — ours does too when
        # handed N=0, so the deviation is purely in which N is passed
        assert f(900.0, 96000.0, 95000.0, 0) == 1.0
        # (c) overflow regime: (E_tot - E) ~ 1e3 at N = 1000 overflows
        # any direct pow; the log form gives the exact finite ratio
        expect = np.exp(1500.0 * (np.log(999.0) - np.log(998.0)))
        assert f(1300.0, 302.0, 301.0, 1000) == pytest.approx(
            expect, rel=1e-9)

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


class TestIdealGasMixtureUVT:
    def test_two_species_occupancies_and_selectivity(self):
        # 2-species ideal-gas GCMC with per-species fugacities: uniform
        # species insertion (the insertion-list semantics the reference's
        # x sorbateCount factor assumes, src/System.MonteCarlo.cpp:413-421
        # + :1362-1367) gives exact Poisson marginals
        # <N_i> = f_i*ATM2REDUCED*V/T; selectivity N_1/N_2 = f_1/f_2.
        L, T = 10.0, 100.0
        f1, f2 = 109.0, 54.5          # c1 = 8.0, c2 = 4.0
        c1 = f1 * const.ATM2REDUCED * L ** 3 / T
        c2 = f2 * const.ATM2REDUCED * L ** 3 / T
        rng = np.random.default_rng(0)
        atoms = []
        mid = 0
        for sp, (at, mt, mass) in enumerate((("Aa", "AAA", 10.0),
                                             ("Bb", "BBB", 30.0))):
            for _ in range(4):
                mid += 1
                x, y, z = rng.uniform(-L / 2, L / 2, 3)
                atoms.append(AtomRecord(at, mt, mid, x=x, y=y, z=z,
                                        mass=mass, epsilon=0.0, sigma=0.0))
        from mpmcxx_tpu.state import build_state as _bs
        state, meta = _bs(atoms, np.eye(3) * L,
                          extra_mol_capacity={"AAA": 40, "BBB": 40})
        flags = FFlags(rd_lrc=False)
        params = RunParams(temperature=T)
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_UVT, move_factor=0.2,
            insert_probability=0.6, fugacity=f1, sorbate_count=2,
            insert_species=(int(meta["species"]["AAA"]),
                            int(meta["species"]["BBB"])),
            type_fugacities=(f1, f2),
            numsteps=100000, incremental=True, max_mol_atoms=1)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=17)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 16)

        from mpmcxx_tpu.mc.sorbate import SorbateTracker
        mt_arr = np.asarray(state.mol_type)
        mmass = np.asarray(state.mol_mass)
        mov = ~np.asarray(state.mol_frozen)
        tracker = SorbateTracker(meta["species"], mt_arr, mmass, mov)
        assert tracker.count == 2

        NA, NB = [], []
        for i in range(750):
            carry, _ = runner(carry)
            alive = np.asarray(carry.state.mol_alive)
            nA = int((alive & (mt_arr == opts.insert_species[0])).sum())
            nB = int((alive & (mt_arr == opts.insert_species[1])).sum())
            NA.append(nA)
            NB.append(nB)
            if i >= 100 and i % 4 == 0:
                tracker.update(alive, volume=L ** 3, frozen_mass=0.0,
                               total_mass=float(carry.obs.total_mass),
                               free_volume=0.0, pressure_or_fugacity=f1,
                               temperature=T)
        mean_A = np.mean(NA[150:])
        mean_B = np.mean(NB[150:])
        assert mean_A == pytest.approx(c1, abs=0.6), (mean_A, c1)
        assert mean_B == pytest.approx(c2, abs=0.5), (mean_B, c2)
        # species cannot die out permanently: both fluctuate
        assert np.std(NA) > 0.8 and np.std(NB) > 0.8

        # selectivity block math: N_A / N_B ~ f1/f2 = 2, with propagated
        # error consistent with the avgN errors
        stA = tracker.stats[0]
        sel = stA.selectivity
        assert sel == pytest.approx(c1 / c2, rel=0.15), sel
        # hand-check the error propagation formula
        stB = tracker.stats[1]
        rel = (stA.err["avgN"] / stA.mean["avgN"]) ** 2 + \
            (stB.err["avgN"] / stB.mean["avgN"]) ** 2
        assert stA.selectivity_err == pytest.approx(
            sel * np.sqrt(rel), rel=1e-9)
        # avgN tracked means agree with the direct tally
        assert stA.mean["avgN"] == pytest.approx(mean_A, abs=0.6)
