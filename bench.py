"""North-star benchmark: MC moves/sec on the flagship workload.

Workload (tools/flagship.py, shared with the reference baseline tool):
10,240-atom polarizable GCMC — a frozen charged framework + 9,728 mobile
polarizable sorbates, uVT insert/remove/displace with the incremental
Delta-E path, polar_mixed Thole SCF (4 iterations/move), full Ewald.
This is BASELINE.json's metric ("MC moves/sec/chip at 10k-atom GCMC").

Baseline: the compiled reference binary's measured rate on the identical
configuration, cached in .bench_baseline.json by tools/measure_baseline.py
(the non-MPI reference can only run standard-ensemble energies through the
pi_nvt identical-beads trick — see .claude/skills/verify/SKILL.md — so the
reference per-move cost is one full energy() call, measured as
P*steps/wall of a displace-only P-bead PI run; each PI step evaluates all
P bead-system energies, and one reference uVT move does exactly one such
full recompute, src/System.MonteCarlo.cpp:94-134).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
secondary metrics (Thole solve ms, PIMC bead sweeps/s) when the time
budget allows.  Progress goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))

BASELINE_CACHE = os.path.join(os.path.dirname(__file__),
                              ".bench_baseline.json")
CHUNK = 64
MEASURE_STEPS = 256
BUDGET_S = float(os.environ.get("MPMCXX_BENCH_BUDGET", "1500"))
_T0 = time.time()


def _log(msg):
    print(f"[bench {time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def flagship_moves_per_sec() -> float:
    import jax
    jax.config.update("jax_enable_x64", True)
    import flagship
    from mpmcxx_tpu.mc import chain as chain_mod

    state, _meta, flags, params, opts = flagship.build_state()
    carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
    topo = flagship.topology(state)
    runner = chain_mod.make_chunk_runner(flags, params, opts, CHUNK,
                                         topology=topo)

    _log(f"flagship: compiling {flagship.N_TOTAL}-atom polarizable GCMC "
         f"chunk ({CHUNK} steps)...")
    carry, _ = runner(carry)
    # fetch a scalar: block_until_ready does not force remote-TPU completion
    e0 = float(carry.obs.energy)
    _log(f"flagship: compiled; E = {e0:.1f} K; timing {MEASURE_STEPS} moves")

    t0 = time.time()
    done = 0
    while done < MEASURE_STEPS:
        carry, _ = runner(carry)
        done += CHUNK
    float(carry.obs.energy)
    dt = time.time() - t0
    _log(f"flagship: {done} moves in {dt:.2f}s -> {done / dt:.2f} moves/s "
         f"(N = {int(carry.obs.N)})")
    return done / dt


def thole_solve_ms(state=None, flags=None, params=None) -> float:
    """Secondary: one 4-iteration polar_mixed Thole SCF solve at 10,240
    atoms (the dominant per-move cost), ms per solve — timed directly on
    the SCF (coefficient planes prebuilt), not via the full dense energy
    graph."""
    import jax
    import flagship
    from mpmcxx_tpu.ops import polar as polar_mod

    if state is None:
        state, _meta, flags, params, _opts = flagship.build_state()

    _log("thole: building coefficient planes...")
    coeffs, E_static = jax.jit(
        lambda s: polar_mod.mixed_field_coeffs(s, flags, params))(state)
    jax.block_until_ready(coeffs)

    @jax.jit
    def solve(s, coeffs, E_static):
        res = polar_mod.finish_polar(
            s, flags, params, E_static,
            lambda m: polar_mod.contract_mixed(coeffs, m))
        return res.energy

    _log("thole: compiling SCF solve...")
    float(solve(state, coeffs, E_static))
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        e = solve(state, coeffs, E_static)
    float(e)
    ms = (time.time() - t0) / reps * 1e3
    _log(f"thole: {ms:.1f} ms per 4-iteration SCF solve")
    return ms


def pimc_sweeps_per_sec() -> float:
    """Secondary: PIMC bead sweeps/s on the 8-bead argon dimer (the
    reference's pi001 sample scale), production step path."""
    import jax
    import jax.numpy as jnp
    from mpmcxx_tpu.config.parser import read_config
    from mpmcxx_tpu.mc import pi as pi_mod

    here = os.path.dirname(os.path.abspath(__file__))
    old = os.getcwd()
    os.chdir(os.path.join(here, "examples", "pi-argon-dimer"))
    try:
        cfg = read_config("run.in")
        cfg.energy_output = "/dev/null"
        cfg.energy_output_csv = "/dev/null"
        sim = pi_mod.PISimulation(cfg, P=8, quiet=True)
    finally:
        os.chdir(old)

    # carry construction as in PISimulation.run()
    comps_pb, _ = pi_mod.pi_potential_per_bead(sim.stack, sim.flags,
                                               sim.params)
    comps = jnp.mean(comps_pb, axis=0)
    from mpmcxx_tpu.ops import delta as delta_mod
    if sim.incremental and delta_mod.uses_recip(sim.flags):
        sf = pi_mod.pi_sf_compute(sim.stack, sim.flags, sim.params)
    else:
        sf = delta_mod.SFCache(jnp.zeros((sim.P, 0)), jnp.zeros((sim.P, 0)))
    carry = pi_mod.PICarry(
        stack=sim.stack, potential_current=jnp.sum(comps),
        obs_components=comps, comps_per_bead=comps_pb, sf=sf,
        temperature=jnp.asarray(cfg.temperature, jnp.float64),
        key=sim.key, starter_bead=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int64), accept=jnp.zeros(7, jnp.int64),
        reject=jnp.zeros(7, jnp.int64), bf=jnp.zeros(()))

    n = int(cfg.corrtime)
    _log("pimc: compiling 8-bead chunk...")
    carry, _ = sim._run_chunk(carry)
    float(carry.potential_current)
    t0 = time.time()
    carry, _ = sim._run_chunk(carry)
    float(carry.potential_current)
    dt = time.time() - t0
    _log(f"pimc: {n} sweeps in {dt:.2f}s -> {n / dt:.1f} sweeps/s")
    return n / dt


def load_baseline() -> dict:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    return {}


def main():
    base = load_baseline()
    ref = float(base.get("flagship_ref_moves_per_sec", 0.0))

    ours = flagship_moves_per_sec()
    result = {
        "metric": "MC moves/sec, 10,240-atom polarizable GCMC "
                  "(uVT, 4-iter Thole SCF, Ewald)",
        "value": round(ours, 2),
        "unit": "moves/sec",
        "vs_baseline": round(ours / ref, 1) if ref > 0 else 0.0,
    }

    secondary = {}
    if time.time() - _T0 < BUDGET_S:
        try:
            secondary["thole_solve_ms_10240"] = round(thole_solve_ms(), 1)
        except Exception as e:  # pragma: no cover
            _log(f"thole secondary failed: {e}")
    if time.time() - _T0 < BUDGET_S:
        try:
            secondary["pimc_bead_sweeps_per_sec"] = \
                round(pimc_sweeps_per_sec(), 1)
        except Exception as e:  # pragma: no cover
            _log(f"pimc secondary failed: {e}")
    if ref > 0:
        secondary["ref_flagship_moves_per_sec"] = round(ref, 4)
        if base.get("measured_on"):
            secondary["ref_measured_on"] = base["measured_on"]
    if secondary:
        result["secondary"] = secondary
    print(json.dumps(result))


if __name__ == "__main__":
    main()
