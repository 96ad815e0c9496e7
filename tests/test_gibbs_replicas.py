"""Gibbs two-box ensemble and replica-parallel/tempering tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmcxx_tpu import FFlags, RunParams, constants as const
from mpmcxx_tpu.mc import chain as chain_mod
from mpmcxx_tpu.mc import gibbs as gibbs_mod
from mpmcxx_tpu.ops.energy import energy_breakdown
from mpmcxx_tpu.parallel import replicas as rep
from mpmcxx_tpu.state import AtomRecord, build_state


def argon_box(n, L, extra=8, seed=0):
    rng = np.random.default_rng(seed)
    atoms = []
    g = int(np.ceil(n ** (1 / 3)))
    s = L / g
    m = 0
    for i in range(g):
        for j in range(g):
            for k in range(g):
                if m < n:
                    m += 1
                    atoms.append(AtomRecord(
                        "Ar", "Ar", m, x=(i + .5) * s - L / 2,
                        y=(j + .5) * s - L / 2, z=(k + .5) * s - L / 2,
                        mass=39.948, epsilon=119.8, sigma=3.405))
    return build_state(atoms, np.eye(3) * L, extra_mol_capacity=extra)


class TestGibbs:
    def _carry(self, opts, seed=3):
        sa, _ = argon_box(8, 20.0)
        sb, _ = argon_box(8, 24.0)
        flags = FFlags()
        params = RunParams(temperature=130.0)

        def eo(state):
            eb = energy_breakdown(state, flags, params)
            obs = chain_mod.observables_from_breakdown(
                state, eb, flags, params, const.ENSEMBLE_NVT_GIBBS)
            return eb.total, obs

        ea, oa = eo(sa)
        eb_, ob = eo(sb)
        carry = gibbs_mod.GibbsCarry(
            sa, sb, ea, eb_, oa, ob,
            jnp.asarray(130.0), jax.random.PRNGKey(seed),
            jnp.zeros((), jnp.int64), jnp.zeros(7, jnp.int64),
            jnp.zeros(7, jnp.int64),
            gibbs_mod.delta_mod.SFCache(jnp.zeros(0), jnp.zeros(0)),
            gibbs_mod.delta_mod.SFCache(jnp.zeros(0), jnp.zeros(0)),
            jnp.zeros(()), jnp.zeros(()))
        step = gibbs_mod.make_gibbs_step(flags, params, opts)
        return carry, step

    @pytest.mark.slow
    def test_transfer_conserves_total_n(self):
        opts = gibbs_mod.GibbsOptions(move_factor=0.1,
                                      transfer_probability=0.7, numsteps=80)
        carry, step = self._carry(opts)
        n0 = float(carry.obs_a.N + carry.obs_b.N)
        carry, _ = jax.lax.scan(step, carry, None, length=80)
        assert float(carry.obs_a.N + carry.obs_b.N) == pytest.approx(n0)
        # at least one box changed occupancy at some point
        acc = np.asarray(carry.accept)
        assert acc.sum() > 0

    @pytest.mark.slow
    def test_volume_exchange_conserves_total_v(self):
        opts = gibbs_mod.GibbsOptions(move_factor=0.05,
                                      volume_probability=0.6,
                                      volume_change_factor=0.05, numsteps=60)
        carry, step = self._carry(opts)
        v0 = float(carry.state_a.pbc.volume + carry.state_b.pbc.volume)
        carry, _ = jax.lax.scan(step, carry, None, length=60)
        v1 = float(carry.state_a.pbc.volume + carry.state_b.pbc.volume)
        assert v1 == pytest.approx(v0, rel=1e-9)
        assert np.asarray(carry.accept)[const.MOVETYPE_VOLUME] > 0

    def test_displace_independent_accept(self):
        opts = gibbs_mod.GibbsOptions(move_factor=0.05, numsteps=40)
        carry, step = self._carry(opts)
        carry, _ = jax.lax.scan(step, carry, None, length=40)
        assert np.isfinite(float(carry.energy_a))
        assert np.isfinite(float(carry.energy_b))

    def test_ideal_gas_volume_marginal_uniform(self):
        """For an ideal gas, summing the Gibbs weight over N_a gives a
        V_a marginal that is exactly UNIFORM on (0, V_total) — a sharp
        statmech gate on the coupled volume-exchange acceptance.  The
        proposal samples ln V_a, so the correct factor is
        (V_a'/V_a)^(N_a+1) (V_b'/V_b)^(N_b): dropping the d(lnV)->dV
        Jacobian's +1 tilts the marginal to 1/V_a (median ~ sqrt of the
        range, ~3x low); the reference's inverted ratio
        (src/SimulationControl.Gibbs.cpp:466) inverts the tilt entirely.
        Gates are loose (the log-walk under-visits the V_b -> 0 edge)
        but either wrong law fails them by a wide margin."""

        def ideal_box(n, L, seed):
            rng = np.random.default_rng(seed)
            return build_state(
                [AtomRecord("Ar", "Ar", m + 1, x=float(x), y=float(y),
                            z=float(z), mass=39.948)
                 for m, (x, y, z) in enumerate(
                     rng.uniform(-L / 2, L / 2, (n, 3)))],
                np.eye(3) * L, extra_mol_capacity=16)

        sa, _ = ideal_box(8, 10.0, 1)
        sb, _ = ideal_box(8, 10.0, 2)
        flags = FFlags()
        params = RunParams(temperature=100.0)
        def eo(state):
            eb = energy_breakdown(state, flags, params)
            return eb.total, chain_mod.observables_from_breakdown(
                state, eb, flags, params, const.ENSEMBLE_NVT_GIBBS)
        ea, oa = eo(sa)
        eb_, ob = eo(sb)
        carry = gibbs_mod.GibbsCarry(
            sa, sb, ea, eb_, oa, ob,
            jnp.asarray(100.0), jax.random.PRNGKey(17),
            jnp.zeros((), jnp.int64), jnp.zeros(7, jnp.int64),
            jnp.zeros(7, jnp.int64),
            gibbs_mod.delta_mod.SFCache(jnp.zeros(0), jnp.zeros(0)),
            gibbs_mod.delta_mod.SFCache(jnp.zeros(0), jnp.zeros(0)),
            jnp.zeros(()), jnp.zeros(()))
        opts = gibbs_mod.GibbsOptions(
            move_factor=0.2, volume_probability=0.4,
            transfer_probability=0.3, volume_change_factor=0.5)
        step = gibbs_mod.make_gibbs_step(flags, params, opts)

        @jax.jit
        def chunk(c):
            return jax.lax.scan(step, c, None, length=200)

        vas = []
        for _ in range(400):
            carry, _ = chunk(carry)
            vas.append(float(carry.state_a.pbc.volume))
        va = np.asarray(vas[80:])
        V = 2 * 10.0 ** 3
        # uniform: mean 1000, median 1000; 1/V_a law: median ~ 250;
        # inverted law: median ~ 1750
        assert 780.0 < va.mean() < 1220.0
        assert 650.0 < np.median(va) < 1350.0


class TestReplicas:
    def test_replicated_chains_diverge(self):
        state, _ = argon_box(8, 20.0)
        flags = FFlags()
        params = RunParams(temperature=130.0)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVT,
                                   move_factor=0.1, numsteps=30)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
        carry_r = rep.replicate_carry(carry, 4, base_seed=7)
        runner = rep.make_replica_runner(flags, params, opts, 30)
        carry_r, _ = runner(carry_r)
        energies = np.asarray(carry_r.obs.energy)
        assert energies.shape == (4,)
        assert len(np.unique(energies.round(6))) > 1  # independent chains

    def test_replica_runner_on_mesh(self):
        mesh = rep.make_mesh(4)
        state, _ = argon_box(8, 20.0)
        flags = FFlags()
        params = RunParams(temperature=130.0)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVT,
                                   move_factor=0.1, numsteps=10)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
        carry_r = rep.replicate_carry(carry, 4, base_seed=1)
        runner = rep.make_replica_runner(flags, params, opts, 10, mesh=mesh)
        carry_r, _ = runner(carry_r)
        energies = np.asarray(carry_r.obs.energy)
        assert energies.shape == (4,)
        assert np.all(np.isfinite(energies))


class TestTempering:
    def test_ladder(self):
        t = np.asarray(rep.temperature_ladder(100.0, 400.0, 5))
        assert t[0] == pytest.approx(100.0)
        assert t[-1] == pytest.approx(400.0)
        assert np.all(np.diff(t) > 0)

    def test_swap_prefers_low_energy_cold(self):
        # cold bath holding a high-energy config should swap with a hot bath
        # holding a low-energy config with probability > 1 -> always
        temps = jnp.asarray([100.0, 200.0])
        energies = jnp.asarray([5000.0, -5000.0])
        new_t, swapped = rep.tempering_swap(temps, energies,
                                            jax.random.PRNGKey(0), 0)
        assert bool(swapped[0])
        np.testing.assert_allclose(np.asarray(new_t), [200.0, 100.0])

    def test_swap_preserves_multiset(self):
        temps = rep.temperature_ladder(50.0, 800.0, 8)
        energies = jnp.asarray(np.random.default_rng(0).normal(
            0, 1000, 8))
        for parity in (0, 1):
            new_t, _ = rep.tempering_swap(temps, energies,
                                          jax.random.PRNGKey(3), parity)
            np.testing.assert_allclose(np.sort(np.asarray(new_t)),
                                       np.sort(np.asarray(temps)))
            temps = new_t


@pytest.mark.slow
class TestGibbsIncremental:
    def test_incremental_tracks_full_recompute(self):
        """Delta-E Gibbs (displace + transfer + coupled volume fallback)
        must stay consistent with from-scratch energies."""
        rng = np.random.default_rng(4)

        def charged_box(n_mol, L, seed):
            r = np.random.default_rng(seed)
            atoms = []
            for m in range(n_mol):
                base = r.uniform(-L / 2, L / 2, 3)
                for a in range(2):
                    off = r.normal(0, 0.9, 3)
                    atoms.append(AtomRecord(
                        "X", "MOL", m + 1, x=base[0] + off[0],
                        y=base[1] + off[1], z=base[2] + off[2], mass=16.0,
                        charge=408.7816 * (0.15 if a % 2 else -0.15),
                        epsilon=80.0, sigma=3.1))
            return build_state(atoms, np.eye(3) * L, extra_mol_capacity=6)

        sa, _ = charged_box(8, 18.0, 1)
        sb, _ = charged_box(6, 20.0, 2)
        flags = FFlags()
        params = RunParams(temperature=140.0, ewald_alpha=3.5 / 9.0)
        opts = gibbs_mod.GibbsOptions(
            move_factor=0.2, transfer_probability=0.3,
            volume_probability=0.1, numsteps=80,
            incremental=True, max_mol_atoms=2)

        def eo(state):
            eb = energy_breakdown(state, flags, params)
            obs = chain_mod.observables_from_breakdown(
                state, eb, flags, params, const.ENSEMBLE_NVT_GIBBS)
            return eb.total, obs

        ea, oa = eo(sa)
        eb_, ob = eo(sb)
        carry = gibbs_mod.GibbsCarry(
            sa, sb, ea, eb_, oa, ob, jnp.asarray(140.0),
            jax.random.PRNGKey(7), jnp.zeros((), jnp.int64),
            jnp.zeros(7, jnp.int64), jnp.zeros(7, jnp.int64),
            gibbs_mod.delta_mod.sf_compute(sa, flags, params),
            gibbs_mod.delta_mod.sf_compute(sb, flags, params),
            gibbs_mod.delta_mod.recip_energy(
                gibbs_mod.delta_mod.sf_compute(sa, flags, params), sa,
                flags, params),
            gibbs_mod.delta_mod.recip_energy(
                gibbs_mod.delta_mod.sf_compute(sb, flags, params), sb,
                flags, params))
        step = gibbs_mod.make_gibbs_step(flags, params, opts)
        carry, out = jax.lax.scan(step, carry, None, length=80)
        assert int(np.asarray(carry.accept).sum()) > 0
        # transfers happened (INSERT encodes transfer)
        assert int(np.asarray(out[2] == const.MOVETYPE_INSERT).sum()) > 0
        for st, E in ((carry.state_a, carry.energy_a),
                      (carry.state_b, carry.energy_b)):
            ref = energy_breakdown(st, flags, params)
            assert float(E) == pytest.approx(float(ref.total), rel=1e-9,
                                             abs=1e-7)
        # total volume conserved through coupled volume moves
        assert float(carry.state_a.pbc.volume +
                     carry.state_b.pbc.volume) == pytest.approx(
            18.0 ** 3 + 20.0 ** 3, rel=1e-9)
