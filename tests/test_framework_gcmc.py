"""Frozen-framework GCMC: the reference's flagship workload shape.

A rigid charged lattice (the "MOF") with mobile polarizable sorbates:
frozen atoms must not move or be counted/inserted/removed, frozen-frozen
pairs must not contribute energy, and sorbate-framework interactions must
drive adsorption.
"""

import os

import numpy as np
import pytest

from mpmcxx_tpu import FFlags, RunParams, constants as const
from mpmcxx_tpu.mc import chain as chain_mod
from mpmcxx_tpu.ops.energy import energy_breakdown
from mpmcxx_tpu.state import AtomRecord, build_state


def framework_system(L=16.0, n_sorbate=4, extra=24):
    atoms = []
    mid = 0
    # frozen cubic lattice of alternating charges
    g = 4
    s = L / g
    for i in range(g):
        for j in range(g):
            for k in range(g):
                mid_f = 1  # entire framework is one frozen molecule
                q = 0.4 if (i + j + k) % 2 == 0 else -0.4
                atoms.append(AtomRecord(
                    "Fw", "MOF", mid_f, frozen=True,
                    x=(i + .5) * s - L / 2, y=(j + .5) * s - L / 2,
                    z=(k + .5) * s - L / 2, mass=50.0,
                    charge=q * const.E2REDUCED, epsilon=40.0, sigma=2.6))
    # mobile sorbates
    rng = np.random.default_rng(7)
    for m in range(n_sorbate):
        mid = 100 + m
        x, y, z = rng.uniform(-L / 4, L / 4, 3)
        atoms.append(AtomRecord("Ar", "ARG", mid, x=x, y=y, z=z,
                                mass=39.948, epsilon=119.8, sigma=3.405,
                                charge=0.0, polarizability=1.64))
    return build_state(atoms, np.eye(3) * L, extra_mol_capacity=extra)


class TestFrameworkGCMC:
    @pytest.mark.slow
    def test_frozen_atoms_never_move_and_counts_exclude_them(self):
        state, meta = framework_system()
        assert int(state.count_N()) == 4  # frozen molecule not counted
        flags = FFlags()
        params = RunParams(temperature=150.0)
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_UVT, move_factor=0.1,
            insert_probability=0.4, fugacity=30.0, numsteps=150,
            incremental=True, max_mol_atoms=1)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=6)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 150)
        carry, _ = runner(carry)

        frozen_sel = np.asarray(state.frozen)
        np.testing.assert_array_equal(
            np.asarray(carry.state.pos)[frozen_sel],
            np.asarray(state.pos)[frozen_sel])
        # framework stays alive, sorbates fluctuate
        assert bool(carry.state.mol_alive[0])
        assert int(np.asarray(carry.stats.accept).sum()) > 0
        assert float(carry.obs.frozen_mass) == pytest.approx(64 * 50.0)

    def test_frozen_pairs_contribute_no_energy(self):
        # framework alone: rd and es must be exactly zero (frozen-frozen
        # pairs skipped; recip sum skips frozen; self term skips frozen)
        state, _ = framework_system(n_sorbate=1)
        # kill the sorbate's interactions to isolate the framework
        import jax.numpy as jnp
        state2 = state.replace(
            epsilon=jnp.where(state.frozen, state.epsilon, 0.0),
            charge=jnp.where(state.frozen, state.charge, 0.0),
            polarizability=jnp.zeros_like(state.polarizability))
        eb = energy_breakdown(state2, FFlags(rd_lrc=False),
                              RunParams(temperature=100.0,
                                        ewald_alpha=3.5 / 8.0))
        assert float(eb.rd) == 0.0
        assert float(eb.coulombic) == 0.0

    @pytest.mark.slow
    def test_sorption_equilibrium_is_bound(self):
        # GCMC against the framework: occupancy fluctuates, the sorbed
        # phase is net-bound (mean potential < 0), and observables stay
        # consistent through thousands of insert/remove/displace moves
        state, _ = framework_system()
        flags = FFlags()
        T, f = 150.0, 20.0
        params = RunParams(temperature=T)
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_UVT, move_factor=0.15,
            insert_probability=0.5, fugacity=f, numsteps=4000,
            incremental=True, max_mol_atoms=1)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=11)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 200)
        Ns, Es = [], []
        for _ in range(20):
            carry, _ = runner(carry)
            Ns.append(float(carry.obs.N))
            Es.append(float(carry.obs.energy))
        assert np.std(Ns) > 0.1          # occupancy fluctuates
        assert np.mean(Es[5:]) < 0.0     # net-bound sorbed phase
        assert int(carry.obs.N) == int(carry.state.count_N())
        # frozen framework still intact
        frozen_sel = np.asarray(state.frozen)
        np.testing.assert_array_equal(
            np.asarray(carry.state.pos)[frozen_sel],
            np.asarray(state.pos)[frozen_sel])


@pytest.mark.slow
class TestCLIGCMC:
    def test_co2_fugacity_gcmc_run(self, tmp_path, monkeypatch):
        """End-to-end CLI GCMC with an EoS fugacity (CO2 Peng-Robinson)."""
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(3)
        with open("co2.pqr", "w") as f:
            i = 1
            for m in range(6):
                x, y, z = rng.uniform(-6, 6, 3)
                f.write(f"ATOM  {i:5d} CO2  CO2 M {m+1:4d}   "
                        f"{x:8.3f}{y:8.3f}{z:8.3f} 44.010  0.0000  0.0000 "
                        f"230.0  3.75  0.0  0.0\n")
                i += 1
            f.write("END\n")
        with open("run.in", "w") as f:
            f.write("""job_name co2
ensemble uvt
temperature 298.0
pressure 10.0
co2_fugacity on
insert_probability 0.4
numsteps 60
corrtime 30
seed 4
move_factor 0.2
pqr_input co2.pqr
basis1 16 0 0
basis2 0 16 0
basis3 0 0 16
""")
        from mpmcxx_tpu.cli import main
        assert main(["--quiet", "run.in"]) == 0
        lines = open("co2.energy.dat").read().splitlines()
        assert len(lines) >= 3
        # fugacity was resolved via the PR EoS (phi < 1 near-critical CO2)
        from mpmcxx_tpu.mc import fugacity as fug
        f_used = fug.co2_fugacity(298.0, 10.0)
        assert 0 < f_used < 10.0


@pytest.mark.slow
class TestCavityBias:
    """Cavity-biased uVT through the full driver: the two-tier bias
    averaging (per-step avg_nodestats / corrtime avg_observables,
    src/System.MonteCarlo.cpp:95-104 + src/System.Averages.cpp:361-380)
    and the dart-integrated accessible volume.  Stochastic agreement
    with the reference binary: tools/uvt_crosscheck.py --cavity (100k
    steps: <E> 1.10 sigma, <N> 0.85 sigma; README Fidelity)."""

    def test_cavity_chain_runs_and_tracks_probability(self, tmp_path,
                                                      monkeypatch):
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(4)
        with open("ar.pqr", "w") as f:
            for m in range(12):
                x, y, z = rng.uniform(-7, 7, 3)
                f.write(f"ATOM  {m+1:5d} Ar   Ar M {m+1:4d}   "
                        f"{x:8.3f}{y:8.3f}{z:8.3f} 39.948  0.0000  0.0000 "
                        f"119.8  3.405  0.0  0.0\n")
            f.write("END\n")
        with open("run.in", "w") as f:
            f.write("""job_name ar
ensemble uvt
temperature 110.0
pressure 15.0
insert_probability 0.4
numsteps 300
corrtime 100
seed 5
move_factor 0.25
cavity_bias on
cavity_grid 5
cavity_radius 2.6
pqr_input ar.pqr
basis1 16 0 0
basis2 0 16 0
basis3 0 0 16
""")
        from mpmcxx_tpu.config.parser import read_config
        from mpmcxx_tpu.runner import Simulation
        sim = Simulation(read_config("run.in"), quiet=True)
        # darts follow the reference's volume/10 rule
        assert sim.opts.cavity_darts == int(16 ** 3 * 0.1)
        sim.run()
        cav = np.asarray(sim.carry.cavity)
        assert cav.shape == (4,)
        assert 0.0 < cav[0] <= 1.0          # per-step mean open fraction
        assert 0.0 < cav[1] <= 16.0 ** 3    # accessible volume
        assert 0.0 < cav[2] <= 1.0          # corrtime-smoothed mean
        assert cav[3] == 3.0                # one checkpoint per corrtime
        assert int(np.asarray(sim.carry.stats.accept).sum()) > 0

    def test_biased_insert_lands_on_open_cavity(self):
        import jax
        from mpmcxx_tpu.mc import cavity as cavity_mod
        from mpmcxx_tpu.state import AtomRecord, build_state
        rng = np.random.default_rng(8)
        atoms = [AtomRecord("Ar", "Ar", m + 1, x=x, y=y, z=z, mass=39.948,
                            epsilon=119.8, sigma=3.405)
                 for m, (x, y, z) in
                 enumerate(rng.uniform(-7, 7, (30, 3)))]
        state, _ = build_state(atoms, np.eye(3) * 16.0)
        info = cavity_mod.update_grid(state, 5, 2.6,
                                      jax.random.PRNGKey(0), n_darts=400)
        assert float(info.probability) == pytest.approx(
            float(np.asarray(info.open_mask).mean()))
        open_pts = np.asarray(info.points)[np.asarray(info.open_mask)]
        for s in range(6):
            com, biased = cavity_mod.biased_insert_position(
                info, jax.random.PRNGKey(s))
            assert bool(biased)
            d = np.linalg.norm(open_pts - np.asarray(com), axis=1)
            assert d.min() < 1e-9           # lands exactly on an open point


@pytest.mark.slow
class TestCapacityRegrowth:
    """uVT molecule-capacity regrowth: the reference mallocs on insert
    (src/System.MonteCarlo.cpp:740-833); our statically-sized state must
    regrow instead of silently saturating (found by
    tools/uvt_crosscheck.py — N pinned at capacity while the reference
    climbed past it)."""

    def _sim(self, tmp_path, monkeypatch, pressure=200.0, numsteps=900):
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(2)
        with open("ar.pqr", "w") as f:
            for m in range(2):
                x, y, z = rng.uniform(-6, 6, 3)
                f.write(f"ATOM  {m+1:5d} Ar   Ar M {m+1:4d}   "
                        f"{x:8.3f}{y:8.3f}{z:8.3f} 39.948  0.0000  0.0000 "
                        f"119.8  3.405  0.0  0.0\n")
            f.write("END\n")
        with open("run.in", "w") as f:
            f.write(f"""job_name ar
ensemble uvt
temperature 110.0
pressure {pressure}
insert_probability 0.7
numsteps {numsteps}
corrtime 100
seed 6
move_factor 0.3
pqr_input ar.pqr
basis1 16 0 0
basis2 0 16 0
basis3 0 0 16
""")
        from mpmcxx_tpu.config.parser import read_config
        from mpmcxx_tpu.runner import Simulation
        return Simulation(read_config("run.in"), quiet=True)

    def test_chain_grows_past_initial_capacity(self, tmp_path, monkeypatch):
        sim = self._sim(tmp_path, monkeypatch)
        cap0 = sim.state.n_mol_slots          # 2 live + 32 headroom
        sim.run()
        N = int(np.asarray(sim.carry.state.mol_alive).sum())
        assert sim.state.n_mol_slots > cap0   # regrew at least once
        assert N > cap0                       # ...and sampled past the
        # old ceiling (the saturation this guards against pinned N at it)
        # energy bookkeeping stays exact across regrowths
        from mpmcxx_tpu.ops.energy import energy_breakdown
        eb = energy_breakdown(sim.carry.state, sim.flags, sim.params)
        assert float(sim.carry.obs.energy) == pytest.approx(
            float(eb.total), rel=1e-9, abs=1e-7)

    def test_grow_preserves_live_contents_and_registry(self, tmp_path,
                                                       monkeypatch):
        from mpmcxx_tpu.state import grow_mol_capacity
        sim = self._sim(tmp_path, monkeypatch, numsteps=100)
        st, meta = sim.state, sim.meta
        grown, gmeta = grow_mol_capacity(st, meta, {"Ar": 100},
                                         ensure_species=("Ar",))
        assert gmeta["species"] == meta["species"]
        assert int(np.asarray(grown.mol_alive).sum()) == \
            int(np.asarray(st.mol_alive).sum())
        # live atoms preserved verbatim, in slot order
        la_old = np.nonzero(np.asarray(st.aalive))[0]
        la_new = np.nonzero(np.asarray(grown.aalive))[0]
        assert len(la_old) == len(la_new)
        np.testing.assert_allclose(np.asarray(grown.pos)[la_new],
                                   np.asarray(st.pos)[la_old])
        np.testing.assert_array_equal(
            np.asarray(grown.epsilon)[la_new],
            np.asarray(st.epsilon)[la_old])
        # PBC (incl. cutoff) carried over exactly
        assert float(grown.pbc.cutoff) == float(st.pbc.cutoff)
        # headroom exists for the requested species
        dead = (~np.asarray(grown.mol_alive)).sum()
        assert dead >= 100
        # the SCF tile-alignment pad lands the atom capacity on a
        # multiple of 512 (monatomic species: always exactly reachable)
        padded, _ = grow_mol_capacity(st, meta, {"Ar": 100},
                                      ensure_species=("Ar",),
                                      pad_atoms_multiple=512)
        assert padded.n_atom_slots % 512 == 0
        assert int(np.asarray(padded.mol_alive).sum()) == \
            int(np.asarray(st.mol_alive).sum())


@pytest.mark.slow
class TestCLIPolarizableGCMC:
    def test_polar_mixed_incremental_cli_run(self, tmp_path, monkeypatch):
        """Full driver path for the flagship workload shape: polarizable
        GCMC with polar_mixed — the runner must auto-enable the
        incremental polarization cache and produce consistent output."""
        monkeypatch.chdir(tmp_path)
        rng = np.random.default_rng(9)
        with open("sorb.pqr", "w") as f:
            i = 1
            for m in range(5):
                x, y, z = rng.uniform(-5, 5, 3)
                for a in range(2):
                    q = 0.25 if a else -0.25
                    f.write(f"ATOM  {i:5d} X    MOL M {m+1:4d}   "
                            f"{x+a*1.1:8.3f}{y:8.3f}{z:8.3f} 16.000 "
                            f"{q:7.4f}  0.5000 60.0  3.00  0.0  0.0\n")
                    i += 1
            f.write("END\n")
        with open("run.in", "w") as f:
            f.write("""job_name pol
ensemble uvt
temperature 150.0
free_volume 4096
pressure 12.0
insert_probability 0.35
numsteps 80
corrtime 40
seed 11
move_factor 0.2
polarization on
polar_iterative on
polar_ewald on
polar_mixed on
polar_max_iter 6
polar_damp_type exponential
polar_damp 2.1304
pqr_input sorb.pqr
basis1 14 0 0
basis2 0 14 0
basis3 0 0 14
""")
        from mpmcxx_tpu.cli import main
        from mpmcxx_tpu.runner import Simulation
        from mpmcxx_tpu.config.parser import read_config
        cfg = read_config("run.in")
        sim = Simulation(cfg, quiet=True)
        assert sim.opts.polar_incremental      # auto-enabled
        assert sim.opts.incremental
        assert main(["--quiet", "run.in"]) == 0
        lines = open("pol.energy.dat").read().splitlines()
        assert len(lines) >= 3
        # polar column is live (non-zero) in the incremental path
        import csv
        last = lines[-1].split()
        polar_col = float(last[4])
        assert polar_col != 0.0


@pytest.mark.slow
class TestMultiSiteFlagship:
    """The flagship's production shape: 3-site charged polarizable
    sorbates (tools/flagship.py build_state_co2) at mini scale — S=3 rows
    through insert/remove/displace with the incremental Delta-E,
    structure-factor, and polar-cache paths (the reference's core use
    case, src/System.MonteCarlo.cpp:740-833)."""

    def _mini(self, model="co2"):
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "tools"))
        import flagship
        orig = (flagship.G_FRAME, flagship.N_CO2, flagship.N_H2)
        flagship.G_FRAME, flagship.N_CO2, flagship.N_H2 = 4, 40, 40
        try:
            builder = {"co2": flagship.build_state_co2,
                       "h2": flagship.build_state_h2}[model]
            out = builder(extra_mol_capacity=8)
            topo = flagship.topology(out[0])
        finally:
            flagship.G_FRAME, flagship.N_CO2, flagship.N_H2 = orig
        return out, topo

    def test_chain_tracks_full_recompute(self):
        from mpmcxx_tpu.ops.energy import energy_breakdown_blocked
        (state, _meta, flags, params, opts), topo = self._mini()
        carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 64,
                                             topology=topo)
        for _ in range(3):
            carry, _ = runner(carry)
        acc = np.asarray(carry.stats.accept)
        assert acc.sum() > 0
        # insert/remove fired and at least one was accepted
        assert acc[const.MOVETYPE_INSERT] + acc[const.MOVETYPE_REMOVE] > 0
        eb = energy_breakdown_blocked(carry.state, flags, params)
        assert float(carry.obs.polarization_energy) == pytest.approx(
            float(eb.polarization), rel=2e-6, abs=1e-8)
        assert float(carry.obs.rd_energy) == pytest.approx(
            float(eb.rd), rel=1e-9, abs=1e-9)
        assert float(carry.obs.coulombic_energy) == pytest.approx(
            float(eb.coulombic), rel=1e-9, abs=1e-9)
        # molecules stay rigid: every live sorbate keeps the C=O geometry
        import flagship
        pos = np.asarray(carry.state.pos)
        mol_id = np.asarray(carry.state.mol_id)
        alive = np.asarray(carry.state.mol_alive)
        frozen = np.asarray(carry.state.mol_frozen)
        # builder positions are quantized to the PQR writer's 3 decimals,
        # so bonds are CO2_BOND to ~2e-3; moves preserve them bit-exactly
        for mm in np.nonzero(alive & ~frozen)[0]:
            rows = np.nonzero(mol_id == mm)[0]
            assert len(rows) == 3
            c, o1, o2 = pos[rows]
            assert np.linalg.norm(o1 - c) == pytest.approx(
                flagship.CO2_BOND, abs=2e-3)
            assert np.linalg.norm(o2 - c) == pytest.approx(
                flagship.CO2_BOND, abs=2e-3)

    def test_h2_5site_chain_tracks_full_recompute(self):
        """S=5 rows with mixed zero-mass / zero-alpha / zero-LJ sites
        (tools/flagship.py build_state_h2, BSS* shape): the incremental
        chain must track the full recompute, and the rigid 5-site
        geometry must survive displace/insert/remove."""
        from mpmcxx_tpu.ops.energy import energy_breakdown_blocked
        (state, _meta, flags, params, opts), topo = self._mini("h2")
        carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 64,
                                             topology=topo)
        for _ in range(3):
            carry, _ = runner(carry)
        acc = np.asarray(carry.stats.accept)
        assert acc.sum() > 0
        assert acc[const.MOVETYPE_INSERT] + acc[const.MOVETYPE_REMOVE] > 0
        eb = energy_breakdown_blocked(carry.state, flags, params)
        assert float(carry.obs.polarization_energy) == pytest.approx(
            float(eb.polarization), rel=2e-6, abs=1e-8)
        assert float(carry.obs.rd_energy) == pytest.approx(
            float(eb.rd), rel=1e-9, abs=1e-9)
        assert float(carry.obs.coulombic_energy) == pytest.approx(
            float(eb.coulombic), rel=1e-9, abs=1e-9)
        import flagship
        pos = np.asarray(carry.state.pos)
        mol_id = np.asarray(carry.state.mol_id)
        alive = np.asarray(carry.state.mol_alive)
        frozen = np.asarray(carry.state.mol_frozen)
        for mm in np.nonzero(alive & ~frozen)[0]:
            rows = np.nonzero(mol_id == mm)[0]
            assert len(rows) == 5
            g, e1, e2, n1, n2 = pos[rows]
            assert np.linalg.norm(e1 - g) == pytest.approx(
                flagship.H2_BOND, abs=2e-3)
            assert np.linalg.norm(e2 - g) == pytest.approx(
                flagship.H2_BOND, abs=2e-3)
            assert np.linalg.norm(n1 - g) == pytest.approx(
                flagship.H2_NOFF, abs=2e-3)
            assert np.linalg.norm(n2 - g) == pytest.approx(
                flagship.H2_NOFF, abs=2e-3)

    def test_oriented_insertion_randomizes_axes(self):
        # accepted insertions must not all share the template orientation
        (state, _meta, flags, params, opts), topo = self._mini()
        import dataclasses
        opts = dataclasses.replace(opts, insert_probability=0.9,
                                   fugacity=50.0)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=3)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 64,
                                             topology=topo)
        before_alive = np.asarray(state.mol_alive).copy()
        for _ in range(3):
            carry, _ = runner(carry)
        pos = np.asarray(carry.state.pos)
        mol_id = np.asarray(carry.state.mol_id)
        newly = np.nonzero(np.asarray(carry.state.mol_alive) &
                           ~before_alive)[0]
        axes = []
        for mm in newly:
            rows = np.nonzero(mol_id == mm)[0]
            c, o1, _ = pos[rows]
            axes.append((o1 - c) / np.linalg.norm(o1 - c))
        assert len(axes) >= 2
        dots = [abs(np.dot(axes[0], a)) for a in axes[1:]]
        assert min(dots) < 0.999  # orientations differ
