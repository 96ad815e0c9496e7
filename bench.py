"""Benchmark: MC moves/sec on the TPU chip vs the CPU reference.

Workload: 512-atom LJ + full-Ewald NVT argon, single chain, corrtime-chunked
jitted scan (the framework's production stepping path).  The baseline is the
compiled reference engine's wall time per MC step on the same physical
system, measured once on this host and cached in .bench_baseline.json
(the reference's non-MPI build can only run standard ensembles through the
pi_nvt path — see .claude/skills/verify/SKILL.md — so the baseline is
measured from a displace-only 4-bead PI run where each step does 4
energy() evaluations across 4 OpenMP threads; wall sec/step there ~= one
full-system energy call, the same work our NVT step does).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

N_ATOMS = 512
BOX = 40.0
STEPS = 512
CHUNK = 128
BASELINE_CACHE = os.path.join(os.path.dirname(__file__),
                              ".bench_baseline.json")
REF_BINARY = os.path.join(os.path.dirname(__file__), ".refbuild", "mpmcxx")


def _lattice(n, L):
    g = int(np.ceil(n ** (1 / 3)))
    s = L / g
    pts = []
    for i in range(g):
        for j in range(g):
            for k in range(g):
                if len(pts) < n:
                    pts.append(((i + .5) * s - L / 2, (j + .5) * s - L / 2,
                                (k + .5) * s - L / 2))
    return pts


def our_moves_per_sec() -> float:
    import jax
    jax.config.update("jax_enable_x64", True)
    from mpmcxx_tpu import FFlags, RunParams, constants as const
    from mpmcxx_tpu.mc import chain as chain_mod
    from mpmcxx_tpu.state import AtomRecord, build_state

    atoms = []
    for m, (x, y, z) in enumerate(_lattice(N_ATOMS, BOX), 1):
        q = 408.7816 * (0.1 if m % 2 else -0.1)
        atoms.append(AtomRecord("Ar", "Ar", m, x=x, y=y, z=z, mass=39.948,
                                epsilon=119.8, sigma=3.405, charge=q))
    state, _ = build_state(atoms, np.eye(3) * BOX)

    flags = FFlags()
    params = RunParams(temperature=150.0, ewald_alpha=3.5 / (BOX / 2))
    opts = chain_mod.MCOptions(ensemble=const.ENSEMBLE_NVT, move_factor=0.05,
                               numsteps=STEPS, incremental=True,
                               max_mol_atoms=1)
    carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
    topo = (np.arange(N_ATOMS, dtype=np.int32),
            np.ones(N_ATOMS, dtype=np.int32))
    runner = chain_mod.make_chunk_runner(flags, params, opts, CHUNK,
                                         topology=topo)

    # warmup/compile (fetch a value: under the axon remote runtime
    # block_until_ready alone does not force completion)
    carry, _ = runner(carry)
    float(carry.obs.energy)

    t0 = time.time()
    done = 0
    while done < STEPS:
        carry, _ = runner(carry)
        done += CHUNK
    float(carry.obs.energy)
    dt = time.time() - t0
    return done / dt


def reference_moves_per_sec() -> float:
    """Measure (or load cached) reference sec/step on the same system."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["ref_moves_per_sec"]
    if not os.path.exists(REF_BINARY):
        return 0.0

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        pqr = os.path.join(d, "sys.pqr")
        with open(pqr, "w") as f:
            for m, (x, y, z) in enumerate(_lattice(N_ATOMS, BOX), 1):
                q = 0.1 if m % 2 else -0.1
                f.write(f"ATOM  {m:5d} Ar   Ar  M {m:4d}   {x:8.3f}"
                        f"{y:8.3f}{z:8.3f} 39.94800 {q:8.5f}  0.00000 "
                        f"119.80000  3.40500  0.00000  0.00000\n")
            f.write("END\n")
        nsteps = 40
        with open(os.path.join(d, "run.in"), "w") as f:
            f.write(f"""job_name bench
ensemble pi_nvt
temperature 150.0
numsteps {nsteps}
corrtime {nsteps}
seed 1
move_factor 0.05
bead_perturb_probability 0.0
PI_trial_chain_length 2
pqr_input sys.pqr
basis1 {BOX} 0.0 0.0
basis2 0.0 {BOX} 0.0
basis3 0.0 0.0 {BOX}
""")
        t0 = time.time()
        subprocess.run([REF_BINARY, "-P", "4", "run.in"], cwd=d,
                       capture_output=True, timeout=3600)
        dt = time.time() - t0
        rate = nsteps / dt
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"ref_moves_per_sec": rate, "n_atoms": N_ATOMS}, f)
    return rate


def main():
    ours = our_moves_per_sec()
    try:
        ref = reference_moves_per_sec()
    except Exception:
        ref = 0.0
    vs = ours / ref if ref > 0 else 0.0
    print(json.dumps({
        "metric": f"MC moves/sec, {N_ATOMS}-atom LJ+Ewald NVT",
        "value": round(ours, 2),
        "unit": "moves/sec",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
