"""Incremental polarization cache: must stay consistent with full rebuilds
through displace/insert/remove sequences, and the chain's polar-incremental
path must track the full-recompute energies."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmcxx_tpu import FFlags, RunParams, constants as const
from mpmcxx_tpu.mc import chain as chain_mod
from mpmcxx_tpu.mc import moves
from mpmcxx_tpu.ops import polar_cache as pc
from mpmcxx_tpu.ops.energy import energy_breakdown_blocked
from mpmcxx_tpu.state import AtomRecord, build_state


def polar_system(n_mol=14, per_mol=2, L=18.0, seed=3, extra=6):
    rng = np.random.default_rng(seed)
    atoms = []
    for m in range(n_mol):
        base = rng.uniform(-L / 2, L / 2, 3)
        for a in range(per_mol):
            off = rng.normal(0, 1.0, 3)
            atoms.append(AtomRecord(
                "X", "MOL", m + 1, x=base[0] + off[0], y=base[1] + off[1],
                z=base[2] + off[2], mass=16.0,
                charge=408.7816 * (0.2 if a % 2 else -0.2),
                polarizability=0.5, epsilon=60.0, sigma=3.0))
    return build_state(atoms, np.eye(3) * L, extra_mol_capacity=extra)


FLAGS = FFlags(polarization=True, polar_iterative=True, polar_ewald=True,
               polar_mixed=True, damp_type=const.DAMPING_EXPONENTIAL,
               polar_max_iter=12)
PARAMS = RunParams(temperature=120.0, ewald_alpha=3.5 / 9.0,
                   polar_ewald_alpha=3.5 / 9.0, polar_damp=2.1304,
                   polar_gamma=1.0)


def topology(state):
    mol_id = np.asarray(state.mol_id)
    starts, natoms = [], []
    for m in range(state.n_mol_slots):
        idx = np.nonzero(mol_id == m)[0]
        starts.append(int(idx[0]) if len(idx) else 0)
        natoms.append(len(idx))
    return np.asarray(starts), np.asarray(natoms)


def rows_of(state, mol, max_atoms):
    starts, natoms = topology(state)
    off = jnp.arange(max_atoms, dtype=jnp.int32)
    r = starts[mol] + off
    return jnp.where(off < natoms[mol], r, -1)


@pytest.mark.slow
class TestCacheConsistency:
    def test_cache_move_matches_rebuild_through_move_sequence(self):
        state, _ = polar_system()
        cache = pc.cache_init(state, FLAGS, PARAMS, block=16)
        key = jax.random.PRNGKey(0)

        def check(cache, state):
            ref = pc.cache_init(state, FLAGS, PARAMS, block=16)
            np.testing.assert_array_equal(np.asarray(cache.co),
                                          np.asarray(ref.co))
            np.testing.assert_array_equal(np.asarray(cache.cd),
                                          np.asarray(ref.cd))
            for pl in ("dx", "dy", "dz"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(cache, pl)),
                    np.asarray(getattr(ref, pl)))
            np.testing.assert_allclose(np.asarray(cache.e_pair),
                                       np.asarray(ref.e_pair), atol=1e-9)
            np.testing.assert_allclose(np.asarray(cache.f1),
                                       np.asarray(ref.f1), atol=1e-9)
            np.testing.assert_array_equal(np.asarray(cache.cosp),
                                          np.asarray(ref.cosp))

        # displacements (including molecule 0, the clip-collision case)
        for mol in (0, 3, 7):
            key, k = jax.random.split(key)
            rows = rows_of(state, mol, 3)
            new = moves.displace_rows(state, k, rows, rows >= 0, 0.3, 1.0)
            cache = pc.cache_move(cache, state, new, rows, FLAGS, PARAMS)
            state = new
        check(cache, state)

        # removal
        rows = rows_of(state, 5, 3)
        new = moves.remove(state, jnp.asarray(5))
        cache = pc.cache_move(cache, state, new, rows, FLAGS, PARAMS)
        state = new
        check(cache, state)

        # insertion into a dead template slot
        slot = int(moves.find_dead_slot(state, state.mol_type[0]))
        assert slot >= 0
        rows_t = rows_of(state, 0, 3)
        rows_s = rows_of(state, slot, 3)
        key, k = jax.random.split(key)
        new, valid = moves.insert_rows(state, k, rows_t, rows_s,
                                       rows_t >= 0, jnp.asarray(slot),
                                       jnp.asarray(True))
        assert bool(valid)
        cache = pc.cache_move(cache, state, new, rows_s, FLAGS, PARAMS)
        state = new
        check(cache, state)

    def test_cache_commit_matches_cache_move_and_rejects_noop(self):
        """cache_commit from the proposal's CommitData must equal the
        geometry-recomputing cache_move on accept, and be a bitwise no-op
        on reject — for displace, remove, and insert."""
        state, _ = polar_system()
        cache = pc.cache_init(state, FLAGS, PARAMS, block=16)
        key = jax.random.PRNGKey(7)

        def new_state_for(kind, state, key):
            if kind == "displace":
                rows = rows_of(state, 3, 3)
                return moves.displace_rows(state, key, rows, rows >= 0,
                                           0.3, 1.0), rows
            if kind == "remove":
                rows = rows_of(state, 5, 3)
                return moves.remove(state, jnp.asarray(5)), rows
            slot = int(moves.find_dead_slot(state, state.mol_type[0]))
            rows_t = rows_of(state, 0, 3)
            rows_s = rows_of(state, slot, 3)
            ns, valid = moves.insert_rows(state, key, rows_t, rows_s,
                                          rows_t >= 0, jnp.asarray(slot),
                                          jnp.asarray(True))
            assert bool(valid)
            return ns, rows_s

        for kind in ("displace", "remove", "insert"):
            key, k = jax.random.split(key)
            new, rows = new_state_for(kind, state, k)
            res_a, cdata = pc.polar_proposal(cache, state, new, rows,
                                             FLAGS, PARAMS,
                                             with_commit=True)
            res_b = pc.polar_proposal(cache, state, new, rows, FLAGS,
                                      PARAMS)
            assert float(res_a.energy) == float(res_b.energy)

            moved = pc.cache_move(cache, state, new, rows, FLAGS, PARAMS)
            committed = pc.cache_commit(cache, jnp.asarray(True), cdata,
                                        FLAGS)
            for f in pc.PolarCache._fields:
                np.testing.assert_allclose(
                    np.asarray(getattr(committed, f)),
                    np.asarray(getattr(moved, f)), atol=1e-12,
                    err_msg=f"{kind}:{f}")

            rejected = pc.cache_commit(cache, jnp.asarray(False), cdata,
                                       FLAGS)
            for f in pc.PolarCache._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(rejected, f)),
                    np.asarray(getattr(cache, f)), err_msg=f"{kind}:{f}")

            cache, state = committed, new

    def test_polar_from_cache_matches_blocked(self):
        state, _ = polar_system()
        cache = pc.cache_init(state, FLAGS, PARAMS, block=16)
        res = pc.polar_from_cache(state, cache, FLAGS, PARAMS)
        eb = energy_breakdown_blocked(state, FLAGS, PARAMS, block=16)
        # recip static field rides f32 phases in the cache, so not
        # bit-identical — but well under thermal resolution
        assert float(res.energy) == pytest.approx(float(eb.polarization),
                                                  rel=1e-6)


@pytest.mark.slow
class TestChainPolarIncremental:
    @pytest.mark.parametrize("plane_override", [0, 4])
    def test_uvt_chain_tracks_full_recompute(self, plane_override):
        # plane_override=4 forces the folded 4-plane SCF representation
        # under exponential damping (the HBM-vs-VPU A/B knob,
        # FFlags.polar_plane_mode) through the full incremental chain:
        # cache_init, row corrections, and commits all re-dispatch on it
        flags = FLAGS.replace(polar_plane_mode=plane_override)
        state, _ = polar_system()
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_UVT, move_factor=0.2,
            insert_probability=0.3, fugacity=15.0, numsteps=120,
            incremental=True, polar_incremental=True, max_mol_atoms=2,
            blocked_energy=True)
        topo = topology(state)
        carry = chain_mod.init_carry(state, flags, PARAMS, opts, seed=2)
        runner = chain_mod.make_chunk_runner(flags, PARAMS, opts, 40,
                                             topology=topo)
        for _ in range(3):
            carry, _ = runner(carry)
        assert int(np.asarray(carry.stats.accept).sum()) > 0
        # incremental bookkeeping must agree with a from-scratch recompute
        eb = energy_breakdown_blocked(carry.state, flags, PARAMS)
        assert float(carry.obs.polarization_energy) == pytest.approx(
            float(eb.polarization), rel=2e-6, abs=1e-8)
        assert float(carry.obs.rd_energy) == pytest.approx(
            float(eb.rd), rel=1e-9, abs=1e-9)
        assert float(carry.obs.coulombic_energy) == pytest.approx(
            float(eb.coulombic), rel=1e-9, abs=1e-9)
        # dipoles carried on the state are the converged SCF dipoles
        assert float(jnp.abs(carry.state.mu).max()) > 0.0

    def test_donate_planes_runner_trajectory_identical(self):
        # donate="planes" splits the [A,A] planes into their own donated
        # jit argument (chain._carry_planes round-trip); the trajectory
        # must stay bit-identical to the plain runner
        state, _ = polar_system()
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_UVT, move_factor=0.2,
            insert_probability=0.3, fugacity=15.0, numsteps=120,
            incremental=True, polar_incremental=True, max_mol_atoms=2,
            blocked_energy=True)
        topo = topology(state)
        plain = chain_mod.make_chunk_runner(FLAGS, PARAMS, opts, 40,
                                            topology=topo)
        donating = chain_mod.make_chunk_runner(FLAGS, PARAMS, opts, 40,
                                               topology=topo,
                                               donate="planes")
        ca = chain_mod.init_carry(state, FLAGS, PARAMS, opts, seed=2)
        cb = chain_mod.init_carry(state, FLAGS, PARAMS, opts, seed=2)
        for _ in range(2):
            ca, _ = plain(ca)
            cb, _ = donating(cb)
        assert int(np.asarray(ca.stats.accept).sum()) > 0
        np.testing.assert_array_equal(np.asarray(ca.state.pos),
                                      np.asarray(cb.state.pos))
        np.testing.assert_array_equal(np.asarray(ca.stats.accept),
                                      np.asarray(cb.stats.accept))
        assert float(ca.obs.energy) == float(cb.obs.energy)
        for pa, pb in zip(chain_mod._carry_planes(ca),
                          chain_mod._carry_planes(cb)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    def test_refresher_rebuilds_cache(self):
        state, _ = polar_system()
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_NVT, move_factor=0.2, numsteps=40,
            incremental=True, polar_incremental=True, max_mol_atoms=2,
            blocked_energy=True)
        carry = chain_mod.init_carry(state, FLAGS, PARAMS, opts, seed=5)
        refresh = chain_mod.make_refresher(FLAGS, PARAMS, opts)
        ref = refresh(carry)
        np.testing.assert_array_equal(np.asarray(ref.pcache.co),
                                      np.asarray(carry.pcache.co))


@pytest.mark.slow
class TestWarmStart:
    def test_warm_start_same_fixed_point_fewer_iterations(self):
        state, _ = polar_system()
        params = dataclasses.replace(PARAMS, polar_precision=1e-10)
        cold = FLAGS
        warm = FLAGS.replace(polar_warm_start=True)
        eb_cold = energy_breakdown_blocked(state, cold, params, block=16)
        # carry the converged dipoles on the state, then re-solve warm
        state_w = state.replace(mu=eb_cold.mu)
        eb_warm = energy_breakdown_blocked(state_w, warm, params, block=16)
        assert float(eb_warm.polarization) == pytest.approx(
            float(eb_cold.polarization), rel=1e-8)
        assert float(eb_warm.polarization_iterations) <= \
            float(eb_cold.polarization_iterations)
        assert float(eb_warm.polarization_iterations) >= 1.0

    def test_warm_start_fixed_iterations_closer_to_converged(self):
        # precision==0 (fixed iteration count): warm start from converged
        # dipoles must land at least as close to the true fixed point as
        # the reference's cold alpha*E start with the same count
        state, _ = polar_system()
        params = dataclasses.replace(PARAMS, polar_precision=1e-12)
        truth = energy_breakdown_blocked(
            state, FLAGS.replace(polar_max_iter=0), params, block=16)
        st = state.replace(mu=truth.mu)
        warm = FLAGS.replace(polar_warm_start=True)
        for k in (2, 4):
            fl_cold = FLAGS.replace(polar_max_iter=k)
            fl_warm = warm.replace(polar_max_iter=k)
            e_cold = float(energy_breakdown_blocked(
                st, fl_cold, PARAMS, block=16).polarization)
            e_warm = float(energy_breakdown_blocked(
                st, fl_warm, PARAMS, block=16).polarization)
            e_true = float(truth.polarization)
            assert abs(e_warm - e_true) <= abs(e_cold - e_true) + 1e-12

    def test_warm_start_off_keeps_cold_contract(self):
        # default flags must keep the reference's cold alpha*E start even
        # with stale dipoles on the state (the fidelity contract)
        state, _ = polar_system()
        st = state.replace(mu=jnp.ones_like(state.mu))
        a = energy_breakdown_blocked(state, FLAGS, PARAMS, block=16)
        b = energy_breakdown_blocked(st, FLAGS, PARAMS, block=16)
        assert float(a.polarization) == float(b.polarization)


@pytest.mark.slow
class TestReplicaPolarIncremental:
    def test_replica_sharded_chains_with_polar_cache(self):
        """Polarizable incremental chains must vmap + shard over the
        replica mesh (the pcache becomes a leading-[R] batched pytree)."""
        from mpmcxx_tpu.parallel import replicas as rep
        state, _ = polar_system(n_mol=8)
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_NVT, move_factor=0.2, numsteps=16,
            incremental=True, polar_incremental=True, max_mol_atoms=2,
            blocked_energy=True)
        carry = chain_mod.init_carry(state, FLAGS, PARAMS, opts, seed=3)
        R = 8
        batched = rep.replicate_carry(carry, R, base_seed=5)
        mesh = rep.make_mesh(R)
        runner = rep.make_replica_runner(FLAGS, PARAMS, opts, 16, mesh)
        out, _ = runner(batched)
        assert out.state.pos.shape[0] == R
        assert out.pcache.co.shape[0] == R
        # replicas diverge (different RNG) but each stays consistent
        energies = np.asarray(out.obs.energy)
        assert len(set(np.round(energies, 6))) > 1
        eb = energy_breakdown_blocked(
            jax.tree_util.tree_map(lambda x: x[0], out.state),
            FLAGS, PARAMS)
        assert float(energies[0]) == pytest.approx(float(eb.total),
                                                   rel=2e-6)


@pytest.mark.slow
class TestProposalContraction:
    def test_proposal_matches_materialized_cache(self):
        """polar_proposal (read-only corrections) must agree with solving
        on a materialised cache_move cache, for displace/insert/remove."""
        state, _ = polar_system()
        cache = pc.cache_init(state, FLAGS, PARAMS, block=16)
        key = jax.random.PRNGKey(4)

        def compare(old, new, rows):
            a = pc.polar_proposal(cache, old, new, rows, FLAGS, PARAMS)
            mat = pc.cache_move(cache, old, new, rows, FLAGS, PARAMS)
            b = pc.polar_from_cache(new, mat, FLAGS, PARAMS)
            # f32 reassociation differs between the corrected and the
            # materialised contraction; both carry ~1e-7-class coefficients
            assert float(a.energy) == pytest.approx(float(b.energy),
                                                    rel=1e-7)

        rows = rows_of(state, 0, 3)   # molecule 0: clip-collision regime
        moved = moves.displace_rows(state, key, rows, rows >= 0, 0.4, 1.0)
        compare(state, moved, rows)

        rows = rows_of(state, 6, 3)
        compare(state, moves.remove(state, jnp.asarray(6)), rows)

        slot = int(moves.find_dead_slot(state, state.mol_type[0]))
        rows_s = rows_of(state, slot, 3)
        new, valid = moves.insert_rows(state, key, rows_of(state, 2, 3),
                                       rows_s, rows_of(state, 2, 3) >= 0,
                                       jnp.asarray(slot), jnp.asarray(True))
        assert bool(valid)
        compare(state, new, rows_s)


@pytest.mark.slow
class TestChainPolarNPT:
    def test_npt_volume_moves_rebuild_cache(self):
        state, _ = polar_system(n_mol=10)
        params = dataclasses.replace(PARAMS, pressure=80.0)
        opts = chain_mod.MCOptions(
            ensemble=const.ENSEMBLE_NPT, move_factor=0.2,
            volume_probability=0.4, volume_change_factor=0.1, numsteps=60,
            incremental=True, polar_incremental=True, max_mol_atoms=2,
            blocked_energy=True)
        carry = chain_mod.init_carry(state, FLAGS, params, opts, seed=8)
        runner = chain_mod.make_chunk_runner(FLAGS, params, opts, 60,
                                             topology=topology(state))
        carry, out = runner(carry)
        # volume moves actually fired
        n_vol = int(np.asarray(out.movetype == const.MOVETYPE_VOLUME).sum())
        assert n_vol > 5
        eb = energy_breakdown_blocked(carry.state, FLAGS, params)
        assert float(carry.obs.polarization_energy) == pytest.approx(
            float(eb.polarization), rel=2e-6, abs=1e-8)
        assert float(carry.obs.energy) == pytest.approx(
            float(eb.total), rel=1e-6, abs=1e-6)
        # cache still matches a rebuild after mixed volume/displace traffic
        ref = pc.cache_init(carry.state, FLAGS, params, block=16)
        np.testing.assert_allclose(np.asarray(carry.pcache.e_pair),
                                   np.asarray(ref.e_pair), atol=1e-8)
        np.testing.assert_array_equal(np.asarray(carry.pcache.co),
                                      np.asarray(ref.co))


class TestWindowEdge:
    def test_short_molecule_at_array_end(self):
        """A 1-atom molecule in the LAST atom slot updated with S=2 rows:
        the commit's DUS window shifts below rows[0] near the array end
        and must re-index the moved rows inside it."""
        rng = np.random.default_rng(9)
        atoms = []
        for m in range(6):
            base = rng.uniform(-8, 8, 3)
            for a in range(2):
                atoms.append(AtomRecord(
                    "X", "MOL", m + 1, x=base[0] + a * 1.1, y=base[1],
                    z=base[2], mass=16.0,
                    charge=408.7816 * (0.2 if a % 2 else -0.2),
                    polarizability=0.5, epsilon=60.0, sigma=3.0))
        # final SINGLE-atom molecule occupies the last atom slot
        atoms.append(AtomRecord(
            "Y", "ION", 99, x=2.5, y=-3.0, z=1.0, mass=23.0,
            charge=408.7816 * 0.3, polarizability=0.3, epsilon=40.0,
            sigma=2.8))
        state, _ = build_state(atoms, np.eye(3) * 18.0)
        A = state.n_atom_slots

        cache = pc.cache_init(state, FLAGS, PARAMS)
        # move the last molecule; rows padded to S=2 -> rows=[A-1, -1]
        rows = jnp.asarray([A - 1, -1], jnp.int32)
        new_state = state.replace(pos=state.pos.at[A - 1].add(
            jnp.asarray([0.4, -0.2, 0.3])))
        moved = pc.cache_move(cache, state, new_state, rows, FLAGS, PARAMS)
        rebuilt = pc.cache_init(new_state, FLAGS, PARAMS)
        for name in ("co", "cd", "dx", "dy", "dz"):
            np.testing.assert_allclose(
                np.asarray(getattr(moved, name)),
                np.asarray(getattr(rebuilt, name)), atol=1e-6,
                err_msg=name)
        np.testing.assert_allclose(np.asarray(moved.e_pair),
                                   np.asarray(rebuilt.e_pair),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(moved.f1),
                                   np.asarray(rebuilt.f1), rtol=1e-8,
                                   atol=1e-8)
