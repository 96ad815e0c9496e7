"""MC chain and PI ensemble tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmcxx_tpu import FFlags, RunParams, constants as const
from mpmcxx_tpu.config.parser import parse_config
from mpmcxx_tpu.mc import chain as chain_mod
from mpmcxx_tpu.mc import moves
from mpmcxx_tpu.mc import pi as pi_mod
from mpmcxx_tpu.state import AtomRecord, build_state

SAMPLE = "/root/reference/sample-input/pi000-free-argon-2K"


def argon_state(n=8, L=20.0, extra=0):
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


class TestMoves:
    def test_displace_moves_one_molecule(self):
        state, _ = argon_state(4)
        key = jax.random.PRNGKey(0)
        new = moves.displace(state, key, jnp.asarray(1), 0.1, 1.0)
        diff = np.abs(np.asarray(new.pos - state.pos)).sum(axis=1)
        assert diff[1] > 0
        assert diff[0] == 0 and diff[2] == 0 and diff[3] == 0

    def test_insert_remove_roundtrip(self):
        state, _ = argon_state(4, extra=4)
        assert int(state.count_N()) == 4
        key = jax.random.PRNGKey(1)
        slot = moves.find_dead_slot(state, state.mol_type[0])
        assert int(slot) >= 4
        inserted, valid = moves.insert(state, key, jnp.asarray(0), slot)
        assert bool(valid)
        assert int(inserted.count_N()) == 5
        removed = moves.remove(inserted, slot)
        assert int(removed.count_N()) == 4

    def test_volume_change_scales(self):
        state, _ = argon_state(4)
        new = moves.volume_change(state, jax.random.PRNGKey(2), 0.2)
        f = float(new.pbc.volume / state.pbc.volume) ** (1 / 3)
        np.testing.assert_allclose(np.asarray(new.pbc.basis),
                                   np.asarray(state.pbc.basis) * f)
        # COM scaled, intramolecular geometry preserved (single atoms here)
        np.testing.assert_allclose(np.asarray(new.pos),
                                   np.asarray(state.pos) * f, rtol=1e-12)


class TestNVTChain:
    @pytest.mark.slow
    def test_short_chain_runs_and_accepts(self):
        state, _ = argon_state(8)
        flags = FFlags()
        params = RunParams(temperature=120.0)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVT,
                                   move_factor=0.05, numsteps=50)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=3)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 50)
        carry, out = runner(carry)
        assert np.isfinite(float(carry.obs.energy))
        n_acc = int(np.asarray(carry.stats.accept).sum())
        n_rej = int(np.asarray(carry.stats.reject).sum())
        assert n_acc + n_rej == 50
        assert n_acc > 0

    @pytest.mark.slow
    def test_uvt_changes_n(self):
        state, _ = argon_state(6, extra=12)
        flags = FFlags()
        params = RunParams(temperature=150.0, pressure=10.0)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_UVT,
                                   move_factor=0.1, insert_probability=0.5,
                                   fugacity=10.0, numsteps=100)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=4)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 100)
        carry, out = runner(carry)
        acc = np.asarray(carry.stats.accept)
        assert acc[const.MOVETYPE_INSERT] + acc[const.MOVETYPE_REMOVE] > 0
        assert int(carry.obs.N) == int(carry.state.count_N())

    def test_npt_changes_volume(self):
        state, _ = argon_state(8)
        flags = FFlags()
        params = RunParams(temperature=150.0, pressure=50.0)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NPT,
                                   move_factor=0.05, volume_probability=0.5,
                                   volume_change_factor=0.05, numsteps=60)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=5)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 60)
        carry, _ = runner(carry)
        acc = np.asarray(carry.stats.accept)
        assert acc[const.MOVETYPE_VOLUME] > 0
        assert float(carry.state.pbc.volume) != pytest.approx(8000.0)


class TestPI:
    def _stack(self, P=4):
        from mpmcxx_tpu.io import pqr
        atoms = pqr.read_pqr(os.path.join(SAMPLE, "Ar.pqr"))
        states = []
        for s in range(P):
            st, meta = build_state(atoms, np.eye(3) * 100.0)
            states.append(st)
        return pi_mod.stack_states(states), meta

    def test_identical_beads_kinetic_is_equipartition(self):
        # zero chain length -> estimator = 1.5 * N * T * P
        stack, _ = self._stack(P=4)
        kin = float(pi_mod.pi_kinetic(stack, 2.0))
        assert kin == pytest.approx(1.5 * 2 * 2.0 * 4, rel=1e-12)

    def test_golden_restart_kinetic(self):
        # committed reference restart beads (P=4 files): estimator must be
        # term1 - positive chain term, < equipartition
        from mpmcxx_tpu.io import pqr
        states = []
        for s in range(4):
            atoms = pqr.read_pqr(
                os.path.join(SAMPLE, f"Ar2K.restart-000{s}.pqr"))
            st, _ = build_state(atoms, np.eye(3) * 100.0)
            states.append(st)
        stack = pi_mod.stack_states(states)
        kin = float(pi_mod.pi_kinetic(stack, 2.0))
        term1 = 1.5 * 2 * 2.0 * 4
        assert kin < term1
        assert np.isfinite(kin)

    def test_coker_staging_preserves_com(self):
        key = jax.random.PRNGKey(7)
        coms = jax.random.normal(key, (8, 3)) * 0.3
        new = pi_mod.coker_stage_coms(coms, key, 4, 2, 39.948, 2.0, 8)
        np.testing.assert_allclose(np.asarray(jnp.mean(new, axis=0)),
                                   np.asarray(jnp.mean(coms, axis=0)),
                                   atol=1e-12)
        # exactly n=4 beads moved; unmoved beads (incl. the anchor at
        # starter=2) share the uniform COM-preserving shift
        delta = np.asarray(new - coms)
        shift = delta[2]  # anchor bead never staged
        moved = np.abs(delta - shift).sum(axis=1) > 1e-10
        assert moved.sum() == 4

    def test_orientation_schedule_covers_all_beads(self):
        for P in (4, 8, 16):
            sched = pi_mod._orientation_schedule(P)
            placed = {0} | {J for (_, J, _, _) in sched}
            assert placed == set(range(P))

    def test_sampled_orientations_unit(self):
        o = pi_mod.sample_orientations(jax.random.PRNGKey(0), 8,
                                       0.742e-10, 8.368618e-28, 10.0)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(o), axis=1),
                                   1.0, rtol=1e-9)

    def test_pi_displace_rigid(self):
        stack, _ = self._stack(P=4)
        new = pi_mod.pi_displace(stack, jax.random.PRNGKey(1),
                                 jnp.asarray(0), 0.1, 1.0)
        # molecule 1 untouched in all beads
        np.testing.assert_allclose(np.asarray(new.pos[:, 1]),
                                   np.asarray(stack.pos[:, 1]))
        # chain geometry of molecule 0 preserved (rigid move):
        # inter-bead distances unchanged
        d_old = np.asarray(stack.pos[0, 0] - stack.pos[1, 0])
        d_new = np.asarray(new.pos[0, 0] - new.pos[1, 0])
        np.testing.assert_allclose(np.linalg.norm(d_new),
                                   np.linalg.norm(d_old), atol=1e-9)


class TestEndToEnd:
    @pytest.mark.slow
    def test_pi000_sample_runs(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        import shutil
        shutil.copy(os.path.join(SAMPLE, "Ar.pqr"), "Ar.pqr")
        text = open(os.path.join(SAMPLE, "equilibrate.in")).read()
        text = text.replace("numsteps                       10000",
                            "numsteps 30")
        open("run.in", "w").write(text)
        from mpmcxx_tpu.cli import main
        assert main(["-P", "8", "--quiet", "run.in"]) == 0
        lines = open("Ar2K.energy.dat").read().splitlines()
        assert lines[0].startswith("#step #energy")
        assert len(lines) >= 2
        # per-bead restart files written
        for s in range(8):
            assert os.path.exists(f"Ar2K.restart-000{s}.pqr")


class TestSpecialMoves:
    def test_gwp_displace_perturbs_widths(self):
        a1 = AtomRecord("H", "GW", 1, x=0.0, mass=1.0, gwp_alpha=0.5,
                        charge=408.78)
        a2 = AtomRecord("H", "GW", 2, x=3.0, mass=1.0, gwp_alpha=0.5,
                        charge=-408.78)
        state, _ = build_state([a1, a2], np.eye(3) * 20.0)
        flags = FFlags(gwp=True, rd_lrc=False)
        params = RunParams(temperature=50.0)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVT,
                                   move_factor=0.1, gwp=True,
                                   gwp_probability=0.3, numsteps=40)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=2)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 40)
        carry, _ = runner(carry)
        assert np.isfinite(float(carry.obs.energy))
        # widths changed from initial and stayed positive
        ga = np.asarray(carry.state.gwp_alpha)
        assert np.all(ga > 0)
        assert np.any(ga != 0.5)

    def test_spectre_chain_neutral(self):
        # neutral initial SPECTRE set (charge-equilibration sampling starts
        # from neutrality; renormalisation preserves it)
        qs = [0.1, -0.1, 0.0, -0.1]
        recs = []
        for m in range(4):
            recs.append(AtomRecord("S", "SPC", m + 1, x=4.0 * m, mass=1.0,
                                   spectre=(m < 3), target=(m == 3),
                                   charge=408.78 * qs[m],
                                   epsilon=10.0, sigma=2.0))
        state, _ = build_state(recs, np.eye(3) * 20.0)
        flags = FFlags(spectre=True, rd_lrc=False)
        params = RunParams(temperature=300.0)
        opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVT,
                                   move_factor=0.1, spectre=True,
                                   spectre_max_charge=300.0,
                                   spectre_max_target=5.0, numsteps=60)
        carry = chain_mod.init_carry(state, flags, params, opts, seed=8)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 60)
        carry, _ = runner(carry)
        q = np.asarray(carry.state.charge)
        sp = np.asarray(carry.state.spectre)
        assert int(np.asarray(carry.stats.accept).sum()) > 0
        # SPECTRE charges stay neutral through accepted moves
        assert abs(q[sp].sum()) < 1e-9
        # charges actually moved
        assert np.any(np.abs(q[sp] - 408.78 * np.asarray(qs)[:3]) > 1e-6)

    def test_spectre_reject_leak_algebra(self):
        # the reference's restore relinks only the altered molecule and
        # renormalizes again (src/System.MonteCarlo.cpp:1559-1582): with n
        # spectre sites and pre-renormalization proposal delta d on the
        # moved site, a REJECTED move leaves the moved site at
        # q_old + d*(n-1)/n^2 and every other at q_old - d/n^2.
        # spectre_reject_restore must reproduce that leak exactly.
        n = 12
        recs = [AtomRecord("T", "TGT", 1, mass=50.0, target=True,
                           charge=408.78, epsilon=10.0, sigma=3.0)]
        for m in range(n):
            recs.append(AtomRecord("S", "SPC", m + 2, x=1.0 + m, y=0.5,
                                   mass=1.0, spectre=True, charge=0.0,
                                   epsilon=10.0, sigma=2.0))
        state, _ = build_state(recs, np.eye(3) * 30.0)
        key = jax.random.PRNGKey(3)
        mol = jnp.asarray(4)  # a spectre molecule (0 is the target)
        new = moves.spectre_displace(state, key, mol, 0.1, 300.0, 5.0)
        q_old = np.asarray(state.charge)
        q_new = np.asarray(new.charge)
        sp = np.asarray(state.spectre)
        moved = np.asarray(state.mol_id) == 4
        # reconstruct d from the post-renormalization moved-site value:
        # q_new_moved = q_old_moved + d*(n-1)/n
        d = (q_new[moved & sp][0] - q_old[moved & sp][0]) * n / (n - 1)
        q_rej = np.asarray(moves.spectre_reject_restore(state, new, mol))
        assert abs(q_rej[moved & sp][0] -
                   (q_old[moved & sp][0] + d * (n - 1) / n ** 2)) < 1e-9
        others = sp & ~moved
        np.testing.assert_allclose(q_rej[others],
                                   q_old[others] - d / n ** 2, atol=1e-9)
        # neutrality survives the leak
        assert abs(q_rej[sp].sum()) < 1e-9
        # non-spectre (target) charge untouched
        assert q_rej[0] == q_old[0]


class TestNativeCodec:
    def test_format_matches_python(self):
        from mpmcxx_tpu.io import pqr
        from mpmcxx_tpu.runtime import native
        if native.get_lib() is None:
            pytest.skip("no native lib")
        atoms = pqr.read_pqr(os.path.join(SAMPLE, "Ar.pqr"))
        state, meta = build_state(atoms, np.eye(3) * 100.0)
        data = pqr.state_to_atoms_data(state, meta)
        nat = native.pqr_format_native(data, True)
        # python fallback path
        lines_py = []
        for idx in range(len(data["atomtype"])):
            x, y, z = data["pos"][idx]
            line = ["ATOM  ", f"{idx+1:5d}",
                    f" {data['atomtype'][idx]:<4.4s}",
                    f" {data['moleculetype'][idx]:<3.3s} ",
                    f"{data['flag'][idx]:<1.1s}",
                    f" {data['molecule_id'][idx]:4d}   ",
                    f"{x:11.6f} {y:11.6f} {z:11.6f} "]
            for key in ("mass", "charge_e", "polarizability", "epsilon",
                        "sigma", "omega", "gwp_alpha", "c6", "c8", "c10",
                        "c9"):
                line.append(f" {data[key][idx]:8.5f}")
            lines_py.append("".join(line))
        assert nat.splitlines() == lines_py


class TestPIFrames:
    @pytest.mark.slow
    def test_xyz_frames_written(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        import shutil
        shutil.copy(os.path.join(SAMPLE, "Ar.pqr"), "Ar.pqr")
        text = open(os.path.join(SAMPLE, "equilibrate.in")).read()
        text = text.replace("numsteps                       10000",
                            "numsteps 20")
        open("run.in", "w").write(text)
        from mpmcxx_tpu.cli import main
        assert main(["-P", "8", "-xyz", "frames.xyz", "--quiet",
                     "run.in"]) == 0
        frames = open("frames.xyz").read().splitlines()
        # 8 beads x 2 atoms = 16 sites per frame + 2 header lines
        assert frames[0] == "16"
        assert frames[1].startswith("Frame:")
        assert len(frames) % 18 == 0


class TestNVERun:
    def test_nve_end_to_end_cli(self, tmp_path, monkeypatch):
        """ENSEMBLE_NVE through config -> validate -> Simulation -> CLI:
        energy conservation bookkeeping (kinetic = total_energy - U,
        src/System.Energy.cpp:156-159) and a moving chain."""
        monkeypatch.chdir(tmp_path)
        atoms = []
        rng = np.random.default_rng(4)
        for m in range(6):
            x, y, z = rng.uniform(-5.5, 5.5, 3)
            atoms.append(f"ATOM  {m+1:5d} Ar   ARG  M {m+1:4d}   "
                         f"{x:10.5f} {y:10.5f} {z:10.5f}  39.94800   "
                         f"0.00000   0.00000 119.80000   3.40500   "
                         f"0.00000   0.00000")
        with open("ar.pqr", "w") as f:
            f.write("\n".join(atoms) + "\nEND\n")
        with open("run.in", "w") as f:
            f.write("""job_name nve
ensemble nve
total_energy 900.0
numsteps 64
corrtime 16
seed 7
move_factor 0.7
rd_lrc off
energy_output nve.energy.dat
pqr_input ar.pqr
basis1 12 0 0
basis2 0 12 0
basis3 0 0 12
""")
        from mpmcxx_tpu.cli import main
        assert main(["--quiet", "run.in"]) == 0
        rows = [r.split() for r in
                open("nve.energy.dat").read().splitlines()[1:]]
        assert len(rows) >= 4
        for r in rows:
            energy, kinetic = float(r[1]), float(r[6])
            # NVE observables: potential + kinetic = total_energy exactly
            assert kinetic == pytest.approx(900.0 - energy, abs=1e-4)
        # the chain moved (energies change across corrtimes)
        assert len({r[1] for r in rows}) > 1


class TestSpectreChargeLaw:
    def test_matches_reference_rejection_sampler(self):
        """The SPECTRE charge delta must follow the reference's
        rejection-sampled law (redraw U[-1,1] until |q+dq| <= max_charge,
        src/System.MonteCarlo.cpp:1174-1176) — checked sample-vs-sample
        against a literal numpy mirror of the C++ do/while, through the
        full move (translation + perturbation + renormalization)."""
        from scipy import stats as sps

        from mpmcxx_tpu.mc import moves

        max_charge, max_target = 1.25, 5.0
        q0 = np.array([1.1, -0.9])        # near the domain edges
        atoms = [AtomRecord("S1", "SPC", 1, x=0.0, charge=q0[0], mass=1.0,
                            spectre=True),
                 AtomRecord("S2", "SPC", 1, x=1.0, charge=q0[1], mass=1.0,
                            spectre=True)]
        state, _ = build_state(atoms, np.eye(3) * 20.0)

        n = 4000
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        charges = jax.vmap(
            lambda k: moves.spectre_displace(
                state, k, 0, 0.2, max_charge, max_target).charge)(keys)
        ours = np.asarray(charges)          # [n, 2]

        # literal mirror of the reference loop + renormalization
        rng = np.random.default_rng(1)
        ref = np.empty((n, 2))
        for i in range(n):
            q = q0.copy()
            for a in range(2):
                while True:
                    dq = rng.random()
                    if rng.random() < 0.5:
                        dq = -dq
                    if abs(q[a] + dq) <= max_charge:
                        break
                q[a] += dq
            q -= q.sum() / 2.0              # renormalize to neutrality
            ref[i] = q
        for a in range(2):
            ks = sps.ks_2samp(ours[:, a], ref[:, a])
            assert ks.pvalue > 1e-3, (a, ks)
        # neutrality after renormalization
        np.testing.assert_allclose(ours.sum(axis=1), 0.0, atol=1e-12)
