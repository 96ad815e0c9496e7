"""Replica-parallel driver parity: per-replica restart resume and the
cross-replica corrtime aggregation (population histogram + energy rows),
the roles of the reference's parallel_restarts search
(src/SimulationControl.cpp:2298-2355) and per-corrtime MPI gather
(src/System.MPI.cpp:9-43, src/System.MonteCarlo.cpp:1954-2028)."""

import numpy as np
import pytest

from mpmcxx_tpu.config.parser import read_config
from mpmcxx_tpu.parallel.driver import ReplicaSimulation


def write_inputs(d, numsteps=12, corrtime=6, hist=True):
    rng = np.random.default_rng(5)
    with open(d / "box.pqr", "w") as f:
        for m in range(6):
            x, y, z = rng.uniform(-7, 7, 3)
            f.write(f"ATOM  {m + 1:5d} Ar   Ar  M {m + 1:4d}   "
                    f"{x:8.3f}{y:8.3f}{z:8.3f} 39.94800  0.00000  "
                    f"0.00000 119.80000  3.40500  0.00000  0.00000\n")
        f.write("END\n")
    lines = f"""job_name rdrv
ensemble uvt
temperature 140.0
pressure 8.0
insert_probability 0.35
numsteps {numsteps}
corrtime {corrtime}
seed 4
move_factor 0.3
pqr_input box.pqr
pqr_restart rdrv.restart.pqr
energy_output /dev/null
long_output on
basis1 18 0 0
basis2 0 18 0
basis3 0 0 18
"""
    if hist:
        lines += "pop_histogram on\npop_histogram_output rdrv.hist.dx\n"
    with open(d / "run.in", "w") as f:
        f.write(lines)


class TestReplicaDriver:
    @pytest.mark.slow
    def test_resume_and_merged_histogram(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        write_inputs(tmp_path)

        cfg = read_config("run.in")
        sim = ReplicaSimulation(cfg, 2, quiet=True)
        sim.run()

        # per-replica restart files were written
        import os
        assert os.path.exists("rdrv.restart-0000.pqr")
        assert os.path.exists("rdrv.restart-0001.pqr")
        # merged histogram DX exists and counts only live molecules
        assert os.path.exists("rdrv.hist.dx")
        txt = open("rdrv.hist.dx").read()
        assert "gridconnections" in txt

        n_end = np.asarray(sim.carry.obs.N).copy()
        e_end = np.asarray(sim.carry.obs.energy).copy()

        # with parallel_restarts on, a fresh driver in the same directory
        # must resume each replica from its own restart file (not
        # re-broadcast the input) — SimulationControl.cpp:2298-2355
        cfg2 = read_config("run.in")
        cfg2.parallel_restarts = True
        sim2 = ReplicaSimulation(cfg2, 2, quiet=True)
        n_res = np.asarray(sim2.carry.obs.N)
        e_res = np.asarray(sim2.carry.obs.energy)
        np.testing.assert_array_equal(n_res, n_end)
        np.testing.assert_allclose(e_res, e_end, rtol=1e-3)

    def test_restart_path_search_order(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        write_inputs(tmp_path, hist=False)
        cfg = read_config("run.in")
        cfg.parallel_restarts = True
        sim = ReplicaSimulation(cfg, 2, quiet=True)
        # nothing on disk -> both replicas fall back to the input file
        assert sim._restart_path(0) == "box.pqr"
        # a .last file is preferred over the input, plain over .last
        open("rdrv.restart-0001.pqr.last", "w").write("")
        assert sim._restart_path(1) == "rdrv.restart-0001.pqr.last"
        open("rdrv.restart-0001.pqr", "w").write("")
        assert sim._restart_path(1) == "rdrv.restart-0001.pqr"
        assert sim._restart_path(0) == "box.pqr"

    def test_restart_search_gated_on_parallel_restarts(self, tmp_path,
                                                       monkeypatch):
        # the reference only resumes from restart files when
        # parallel_restarts is on (SimulationControl.cpp:2298-2355):
        # re-running a replica job in the same directory must NOT
        # silently continue the previous run
        monkeypatch.chdir(tmp_path)
        write_inputs(tmp_path, hist=False)
        cfg = read_config("run.in")
        assert not cfg.parallel_restarts
        sim = ReplicaSimulation(cfg, 2, quiet=True)
        open("rdrv.restart-0001.pqr", "w").write("")
        assert sim._restart_path(1) == "box.pqr"


@pytest.mark.slow
def test_replica_capacity_regrowth(tmp_path, monkeypatch):
    """A replica hitting the molecule-capacity ceiling triggers a common
    restack (discard + re-run) instead of silently force-rejecting
    inserts — the replica-batch analog of
    runner.Simulation._grow_capacity."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(9)
    with open("box.pqr", "w") as f:
        for m in range(2):
            x, y, z = rng.uniform(-6, 6, 3)
            f.write(f"ATOM  {m + 1:5d} Ar   Ar  M {m + 1:4d}   "
                    f"{x:8.3f}{y:8.3f}{z:8.3f} 39.94800  0.00000  "
                    f"0.00000 119.80000  3.40500  0.00000  0.00000\n")
        f.write("END\n")
    with open("run.in", "w") as f:
        f.write("""job_name rgrw
ensemble uvt
temperature 110.0
pressure 200.0
insert_probability 0.7
numsteps 600
corrtime 100
seed 6
move_factor 0.3
pqr_input box.pqr
pqr_restart /dev/null
energy_output /dev/null
basis1 16 0 0
basis2 0 16 0
basis3 0 0 16
""")
    cfg = read_config("run.in")
    sim = ReplicaSimulation(cfg, 2, quiet=True)
    cap0 = int(sim.carry.state.mol_alive.shape[1])   # [R, M]
    sim.run()
    assert int(sim.carry.state.mol_alive.shape[1]) > cap0
    N = np.asarray(sim.carry.state.mol_alive).sum(axis=1)
    assert (N > cap0).any()          # sampled past the old ceiling
    # RNG streams stay distinct across the restack
    keys = np.asarray(sim.carry.key)
    assert not (keys[0] == keys[1]).all()


@pytest.mark.slow
def test_vmapped_replicas_match_independent_single_chains():
    """The replica-DP correctness premise (tools/ab_replicas.py): R
    vmapped chains through the flagship code path (uVT, incremental
    Delta-E + polar cache, blocked energy) must each reproduce the
    independent single-chain run with the same RNG stream, trajectory-
    exact — the role of the reference's R independent MPI chains
    (src/System.MonteCarlo.cpp:213-248)."""
    import jax
    import jax.numpy as jnp

    from mpmcxx_tpu import FFlags, RunParams, constants as const
    from mpmcxx_tpu.mc import chain as chain_mod
    from mpmcxx_tpu.parallel import replicas as rep
    from mpmcxx_tpu.state import AtomRecord, build_state

    L = 18.0
    rng = np.random.default_rng(3)
    atoms = []
    for m in range(12):
        base = rng.uniform(-L / 2, L / 2, 3)
        for a in range(2):
            off = rng.normal(0, 1.0, 3)
            atoms.append(AtomRecord(
                "X", "MOL", m + 1, x=base[0] + off[0], y=base[1] + off[1],
                z=base[2] + off[2], mass=16.0,
                charge=408.7816 * (0.2 if a % 2 else -0.2),
                polarizability=0.5, epsilon=60.0, sigma=3.0))
    state, _ = build_state(atoms, np.eye(3) * L, extra_mol_capacity=6)
    flags = FFlags(polarization=True, polar_iterative=True,
                   polar_ewald=True, polar_mixed=True,
                   damp_type=const.DAMPING_EXPONENTIAL, polar_max_iter=4)
    params = RunParams(temperature=120.0, ewald_alpha=3.5 / 9.0,
                       polar_ewald_alpha=3.5 / 9.0, polar_damp=2.1304,
                       polar_gamma=1.0)
    opts = chain_mod.MCOptions(
        ensemble=const.ENSEMBLE_UVT, move_factor=0.3,
        insert_probability=0.3, fugacity=4.0, incremental=True,
        polar_incremental=True, max_mol_atoms=2, blocked_energy=True)

    R, chunk = 3, 24
    carry1 = chain_mod.init_carry(state, flags, params, opts, seed=0)
    batched = rep.replicate_carry(carry1, R, base_seed=0)
    runner_r = rep.make_replica_runner(flags, params, opts, chunk,
                                       mesh=None)
    out_r, _ = runner_r(batched)

    step = chain_mod.make_step_fn(flags, params, opts)
    single = jax.jit(
        lambda c: jax.lax.scan(step, c, None, length=chunk)[0])
    for r in range(R):
        key_r = jax.random.fold_in(jax.random.PRNGKey(0), r)
        out_1 = single(carry1._replace(key=key_r))
        np.testing.assert_array_equal(np.asarray(out_r.key[r]),
                                      np.asarray(out_1.key))
        np.testing.assert_array_equal(
            np.asarray(out_r.state.mol_alive[r]),
            np.asarray(out_1.state.mol_alive))
        np.testing.assert_array_equal(np.asarray(out_r.state.pos[r]),
                                      np.asarray(out_1.state.pos))
        np.testing.assert_array_equal(np.asarray(out_r.obs.energy[r]),
                                      np.asarray(out_1.obs.energy))
    # distinct streams actually diverge across replicas
    assert not np.array_equal(np.asarray(out_r.state.pos[0]),
                              np.asarray(out_r.state.pos[1]))
