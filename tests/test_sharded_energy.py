"""Mesh-sharded full energy must match the single-device blocked path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpmcxx_tpu import FFlags, RunParams, constants as const
from mpmcxx_tpu.ops.energy import energy_breakdown_blocked
from mpmcxx_tpu.parallel import replicas as rep
from mpmcxx_tpu.parallel.sharded_energy import sharded_breakdown
from mpmcxx_tpu.state import AtomRecord, build_state


def system(n_mol=40, L=24.0, polar=False, seed=5):
    rng = np.random.default_rng(seed)
    atoms = []
    for m in range(n_mol):
        base = rng.uniform(-L / 2, L / 2, 3)
        for a in range(2):
            off = rng.normal(0, 1.0, 3)
            atoms.append(AtomRecord(
                "X", "MOL", m + 1, x=base[0] + off[0], y=base[1] + off[1],
                z=base[2] + off[2], mass=16.0,
                charge=408.7816 * (0.15 if a % 2 else -0.15),
                polarizability=0.4 if polar else 0.0,
                epsilon=80.0, sigma=3.1))
    return build_state(atoms, np.eye(3) * L)


class TestShardedEnergy:
    def test_lj_ewald_matches_blocked(self):
        state, _ = system()
        flags = FFlags()
        params = RunParams(temperature=140.0, ewald_alpha=3.5 / 12.0)
        mesh = rep.make_mesh(8)
        a = energy_breakdown_blocked(state, flags, params, block=16)
        b = jax.jit(lambda s: sharded_breakdown(s, flags, params, mesh,
                                                block=16))(state)
        assert float(b.rd) == pytest.approx(float(a.rd), abs=1e-9)
        assert float(b.coulombic) == pytest.approx(float(a.coulombic),
                                                   abs=1e-9)

    @pytest.mark.slow
    def test_polarizable_matches_blocked_mixed(self):
        state, _ = system(polar=True)
        flags = FFlags(polarization=True, polar_iterative=True,
                       polar_ewald=True, polar_mixed=True,
                       polar_max_iter=12)
        params = RunParams(temperature=140.0, ewald_alpha=3.5 / 12.0,
                           polar_ewald_alpha=3.5 / 12.0, polar_damp=2.1304,
                           polar_gamma=1.0)
        mesh = rep.make_mesh(8)
        a = energy_breakdown_blocked(state, flags, params, block=16)
        b = jax.jit(lambda s: sharded_breakdown(s, flags, params, mesh,
                                                block=16))(state)
        assert float(b.polarization) == pytest.approx(
            float(a.polarization), rel=1e-6)
        assert float(b.total) == pytest.approx(float(a.total), rel=1e-9)

    def test_wolf_and_sg(self):
        state, _ = system()
        mesh = rep.make_mesh(8)
        params = RunParams(temperature=140.0, ewald_alpha=0.3)
        for fl in (FFlags(wolf=True), FFlags(use_sg=True)):
            a = energy_breakdown_blocked(state, fl, params, block=16)
            b = jax.jit(lambda s, fl=fl: sharded_breakdown(
                s, fl, params, mesh, block=16))(state)
            assert float(b.rd) == pytest.approx(float(a.rd), abs=1e-9)
            assert float(b.coulombic) == pytest.approx(float(a.coulombic),
                                                       abs=1e-9)

    @pytest.mark.slow
    def test_polar_wolf_sharded(self):
        state, _ = system(polar=True)
        flags = FFlags(polarization=True, polar_iterative=True,
                       polar_wolf=True, polar_mixed=True, wolf=True,
                       polar_max_iter=10)
        params = RunParams(temperature=140.0, ewald_alpha=0.25,
                           polar_wolf_alpha=0.2, polar_damp=2.1304,
                           polar_gamma=1.0)
        mesh = rep.make_mesh(8)
        a = energy_breakdown_blocked(state, flags, params, block=16)
        b = jax.jit(lambda s: sharded_breakdown(s, flags, params, mesh,
                                                block=16))(state)
        assert float(b.polarization) == pytest.approx(
            float(a.polarization), rel=1e-6)
        assert float(b.coulombic) == pytest.approx(float(a.coulombic),
                                                   abs=1e-9)


class TestShardedWholeSystemTerms:
    """polarvdw + Axilrod-Teller ride the sharded path as replicated
    whole-system terms (an eig / O(N^3) triple sum cannot row-shard; both
    appear only at small N where the sharded pair work still pays)."""

    def test_polarvdw_matches_dense(self):
        from mpmcxx_tpu.ops.energy import energy_breakdown
        state, _ = system(n_mol=10, polar=True)
        flags = FFlags(polarvdw=True, polarization=True,
                       polar_iterative=True, polar_ewald=True,
                       polar_mixed=True, polar_max_iter=10)
        # omega drives the coupled-dipole spectrum
        state = state.replace(omega=jnp.where(state.atom_alive(), 0.6, 0.0))
        params = RunParams(temperature=140.0, ewald_alpha=3.5 / 12.0,
                           polar_ewald_alpha=3.5 / 12.0, polar_damp=2.1304,
                           polar_gamma=1.0)
        mesh = rep.make_mesh(8)
        a = energy_breakdown(state, flags, params)
        b = jax.jit(lambda s: sharded_breakdown(s, flags, params, mesh,
                                                block=16))(state)
        assert float(b.vdw) == pytest.approx(float(a.vdw), rel=1e-9,
                                             abs=1e-9)
        assert float(b.rd) == pytest.approx(float(a.rd), abs=1e-9)

    def test_axilrod_teller_matches_dense(self):
        from mpmcxx_tpu.ops.energy import energy_breakdown
        state, _ = system(n_mol=8)
        state = state.replace(
            polarizability=jnp.where(state.atom_alive(), 1.642, 0.0),
            c9=jnp.where(state.atom_alive(), 518.3, 0.0))
        flags = FFlags(using_axilrod_teller=True)
        params = RunParams(temperature=140.0, ewald_alpha=3.5 / 12.0)
        mesh = rep.make_mesh(8)
        a = energy_breakdown(state, flags, params)
        b = jax.jit(lambda s: sharded_breakdown(s, flags, params, mesh,
                                                block=16))(state)
        assert float(a.three_body) != 0.0
        assert float(b.three_body) == pytest.approx(float(a.three_body),
                                                    rel=1e-9)

    def test_unsupported_flags_still_raise(self):
        state, _ = system(n_mol=4)
        mesh = rep.make_mesh(8)
        params = RunParams(temperature=140.0)
        for fl in (FFlags(rd_crystal=True), FFlags(gwp=True),
                   FFlags(spectre=True), FFlags(rd_anharmonic=True)):
            with pytest.raises(ValueError):
                sharded_breakdown(state, fl, params, mesh, block=16)


@pytest.mark.slow
class TestShardedFlagshipChain:
    """VERDICT r2 item 6: the real flagship step loop (moves + accept +
    polar-cache commits), not just one energy, with the [A,A] SCF planes
    row-sharded over the 8-device mesh.  The sampled trajectory must be
    bit-identical to single-device; accumulated energy observables may
    differ only by cross-device reduction order (refreshed every corrtime
    anyway).  Per-step sync role anchor: PathIntegral.cpp:763-766."""

    @pytest.mark.parametrize("model", ["co2", "h2"])
    def test_trajectory_identical_to_single_device(self, model):
        import os
        import sys
        from jax.sharding import NamedSharding, PartitionSpec as P
        from mpmcxx_tpu.mc import chain as chain_mod

        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "tools"))
        import flagship
        orig = (flagship.G_FRAME, flagship.N_CO2, flagship.N_H2)
        flagship.G_FRAME, flagship.N_CO2, flagship.N_H2 = 4, 40, 40
        try:
            builder = {"co2": flagship.build_state_co2,
                       "h2": flagship.build_state_h2}[model]
            state, _meta, flags, params, opts = builder(
                extra_mol_capacity=8)
            topo = flagship.topology(state)
        finally:
            flagship.G_FRAME, flagship.N_CO2, flagship.N_H2 = orig
        assert state.n_atom_slots % 8 == 0   # planes shard evenly

        carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
        runner = chain_mod.make_chunk_runner(flags, params, opts, 32,
                                             topology=topo)
        c1, _ = runner(carry)

        mesh = rep.make_mesh(8)
        row_shard = NamedSharding(mesh, P("replica", None))
        repl = NamedSharding(mesh, P())

        def shard_of(path, leaf):
            name = "/".join(str(p) for p in path)
            if "pcache" in name and leaf.ndim == 2 and \
                    leaf.shape[0] == state.n_atom_slots:
                return row_shard
            return repl

        carry_s = jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(x, shard_of(p, x)), carry)
        c2, _ = runner(carry_s)

        # the sampled chain state is bit-identical
        np.testing.assert_array_equal(np.asarray(c1.state.pos),
                                      np.asarray(c2.state.pos))
        np.testing.assert_array_equal(np.asarray(c1.state.mol_alive),
                                      np.asarray(c2.state.mol_alive))
        np.testing.assert_array_equal(np.asarray(c1.stats.accept),
                                      np.asarray(c2.stats.accept))
        assert float(c1.obs.N) == float(c2.obs.N)
        # accumulated observables: reduction-order noise only
        assert float(c2.obs.energy) == pytest.approx(
            float(c1.obs.energy), rel=1e-8, abs=1e-5)
