"""North-star benchmark: MC moves/sec on the flagship workload.

Workload (tools/flagship.py, shared with the reference baseline tool):
10,112-atom polarizable multi-site GCMC — a frozen charged framework +
3,200 rigid 3-site CO2-like sorbates (partial charges, per-site
polarizabilities), uVT insert/remove/displace with oriented multi-site
insertion, the incremental Delta-E + structure-factor paths, polar_mixed
Thole SCF (4 iterations/move), full Ewald.  This is BASELINE.json's
metric ("MC moves/sec/chip at 10k-atom GCMC") in the reference's
production shape (CO2/H2 sorption).  Secondary metrics: the 5-site
BSS*-H2 variant (10,512 atoms, S=5 rows) and the monatomic 10,240-atom
variant (the round-1/2 headline, kept for continuity).  All timings are
median/min/max over >=3 segments.

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


def _device_alive(timeout_s=150) -> bool:
    """Probe the backend in a subprocess: a hung remote worker blocks
    forever in-process (even ctrl-C won't unwind the tunnel), but a
    child can be killed.  150 s covers the first-compile latency."""
    import subprocess
    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((128, 128)); print(float((x @ x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except Exception:
        return False


def wait_for_device() -> bool:
    """The remote TPU worker recovers ~20-40 min after an OOM crash
    (CLAUDE.md); rather than hang or die with no output, poll within
    ~60% of the time budget, then let main() emit an honest failure
    line — the driver records whatever JSON we print."""
    deadline = _T0 + 0.6 * BUDGET_S
    while True:
        if _device_alive():
            return True
        if time.time() > deadline:
            return False
        _log("backend probe failed (worker down?); retrying in 60 s...")
        time.sleep(60)


def flagship_moves_per_sec(model: str = "co2", repeats: int = 3) -> dict:
    """Returns {"median", "min", "max"} moves/s over ``repeats`` timing
    segments of MEASURE_STEPS moves each (error bars: remote-tunnel and
    clock variance is real, single points hide regressions)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import flagship
    from mpmcxx_tpu.mc import chain as chain_mod

    if model == "co2":
        state, _meta, flags, params, opts = flagship.build_state_co2()
        n_total = flagship.N_TOTAL_CO2
        label = "3,200x3-site CO2"
    elif model == "h2":
        state, _meta, flags, params, opts = flagship.build_state_h2()
        n_total = flagship.N_TOTAL_H2
        label = "2,000x5-site H2"
    else:
        state, _meta, flags, params, opts = flagship.build_state()
        n_total = flagship.N_TOTAL
        label = "monatomic"
    carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
    topo = flagship.topology(state)
    # planes-only donation dispatches fine on axon (unlike the whole
    # carry) and removes the jit-boundary plane entry copies: measured
    # 158.9 vs 157.7 moves/s on the CO2 flagship (tools/ab_planes.py
    # --donate-ab, r4)
    runner = chain_mod.make_chunk_runner(
        flags, params, opts, CHUNK, topology=topo,
        donate="planes" if opts.polar_incremental else False)

    _log(f"flagship[{model}]: compiling {n_total}-atom ({label}) "
         f"polarizable GCMC chunk ({CHUNK} steps)...")
    carry, _ = runner(carry)
    # fetch a scalar: block_until_ready does not force remote-TPU completion
    e0 = float(carry.obs.energy)
    _log(f"flagship[{model}]: compiled; E = {e0:.1f} K; timing "
         f"{repeats}x{MEASURE_STEPS} moves")

    rates = []
    for rep in range(repeats):
        t0 = time.time()
        done = 0
        while done < MEASURE_STEPS:
            carry, _ = runner(carry)
            done += CHUNK
        float(carry.obs.energy)
        dt = time.time() - t0
        rates.append(done / dt)
        _log(f"flagship[{model}] rep {rep}: {done} moves in {dt:.2f}s -> "
             f"{done / dt:.2f} moves/s (N = {int(carry.obs.N)})")
    return {"median": float(np.median(rates)), "min": min(rates),
            "max": max(rates)}


def thole_solve_ms(state=None, flags=None, params=None) -> float:
    """Secondary: one 4-iteration polar_mixed Thole SCF solve at 10,240
    atoms (the dominant per-move cost), ms per solve — timed directly on
    the SCF (coefficient planes prebuilt), not via the full dense energy
    graph.  Pass all three of (state, flags, params) or none (the
    monatomic flagship set)."""
    import jax
    import flagship
    from mpmcxx_tpu.ops import polar as polar_mod

    if state is None or flags is None or params is None:
        if not (state is None and flags is None and params is None):
            raise ValueError("thole_solve_ms takes all three of "
                             "(state, flags, params) or none")
        state, _meta, flags, params, _opts = flagship.build_state()

    _log("thole: building coefficient planes...")
    coeffs, E_static = jax.jit(
        lambda s: polar_mod.mixed_field_coeffs(s, flags, params))(state)
    jax.block_until_ready(coeffs)

    @jax.jit
    def solve(s, coeffs, E_static):
        res = polar_mod.finish_polar(
            s, flags, params, E_static,
            lambda m: polar_mod.contract_mixed(coeffs, m,
                                               l=params.polar_damp))
        return res.energy

    _log("thole: compiling SCF solve...")
    float(solve(state, coeffs, E_static))
    reps, segments = 10, 3
    ms_seg = []
    for _ in range(segments):
        t0 = time.time()
        for _ in range(reps):
            e = solve(state, coeffs, E_static)
        float(e)
        ms_seg.append((time.time() - t0) / reps * 1e3)
    ms = float(np.median(ms_seg))
    _log(f"thole: {ms:.1f} ms per 4-iteration SCF solve "
         f"(min {min(ms_seg):.1f} max {max(ms_seg):.1f})")
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
    # One corrtime chunk is ~80 ms of device work against a ~25 ms
    # tunnel round-trip — a timing quantum that small read as a fake
    # -4.5% "drift" in BENCH_r04 (r5 re-measure: 4 in-process repeats
    # spanned 3,606-4,566 sweeps/s).  Time >=10 chunks / >=1 s and
    # take the best of 3 segments so the quantum dwarfs the RTT.
    reps = max(10, 1 + 3000 // max(n, 1))
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            carry, _ = sim._run_chunk(carry)
        float(carry.potential_current)
        dt = time.time() - t0
        best = max(best, reps * n / dt)
    _log(f"pimc: 3 x {reps * n} sweeps, best {best:.1f} sweeps/s")
    return best


def load_baseline() -> dict:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    return {}


LAST_SUCCESS = os.path.join(os.path.dirname(__file__), ".bench_last.json")
EXPECTED_CACHE = os.path.join(os.path.dirname(__file__),
                              ".bench_expected.json")


def check_regressions(result: dict) -> list:
    """Compare every tracked metric against the committed best-known-good
    values in .bench_expected.json; print a LOUD line for any metric more
    than `tolerance` (default 15%) worse than its committed baseline.
    Exists because round 3 silently halved the monatomic flagship
    (BENCH_r03: 52.4 vs the published 106.1 moves/s) with no alarm."""
    if not os.path.exists(EXPECTED_CACHE):
        return []
    with open(EXPECTED_CACHE) as f:
        expected = json.load(f)
    tol = float(expected.get("tolerance", 0.15))
    measured = {"flagship_co2_moves_per_sec": result.get("value")}
    measured.update(result.get("secondary", {}))
    regressions = []
    for name, spec in expected.get("metrics", {}).items():
        got = measured.get(name)
        if got is None or not isinstance(got, (int, float)):
            continue
        want = float(spec["value"])
        hib = bool(spec.get("higher_is_better", True))
        ratio = (got / want) if hib else (want / got) if got > 0 else 0.0
        if ratio < 1.0 - tol:
            line = (f"REGRESSION: {name} = {got:g} is "
                    f"{(1.0 - ratio) * 100:.0f}% worse than the committed "
                    f"baseline {want:g} ({spec.get('set_in', '?')})")
            _log("!" * 72)
            _log(line)
            _log("!" * 72)
            regressions.append(line)
    return regressions


def _load_last_success() -> dict:
    """The most recent successful bench result (committed snapshot) —
    attached, clearly labeled, to the honest-failure line so a down
    worker at round end doesn't erase the round's measured numbers."""
    if os.path.exists(LAST_SUCCESS):
        with open(LAST_SUCCESS) as f:
            return json.load(f)
    return {}


def _save_last_success(result: dict):
    try:
        with open(LAST_SUCCESS, "w") as f:
            json.dump(result, f, indent=1)
    except OSError:  # pragma: no cover
        pass


def main():
    base = load_baseline()
    ref_co2 = float(base.get("flagship_co2_ref_moves_per_sec", 0.0))
    ref_ar = float(base.get("flagship_ref_moves_per_sec", 0.0))

    if not wait_for_device():
        fail = {
            "metric": "MC moves/sec, 10,112-atom polarizable multi-site "
                      "CO2 GCMC (uVT, oriented 3-site insertion, 4-iter "
                      "Thole SCF, Ewald)",
            "value": 0.0, "unit": "moves/sec", "vs_baseline": 0.0,
            "error": "TPU backend unavailable (device probe timed out "
                     "for the whole budget window)"}
        last = _load_last_success()
        if last:
            fail["last_successful_run"] = last
        print(json.dumps(fail))
        return

    try:
        co2 = flagship_moves_per_sec("co2")
    except Exception as e:
        # A live device does not guarantee a live COMPILER: the remote
        # Mosaic service has been observed (r5) to sever large-kernel
        # compiles with a broken pipe at ~30 min while small graphs
        # compile fine.  Degrade to the honest-failure line with the
        # last committed success attached rather than a traceback.
        fail = {
            "metric": "MC moves/sec, 10,112-atom polarizable multi-site "
                      "CO2 GCMC (uVT, oriented 3-site insertion, 4-iter "
                      "Thole SCF, Ewald)",
            "value": 0.0, "unit": "moves/sec", "vs_baseline": 0.0,
            "error": f"flagship bench failed: {type(e).__name__}: "
                     f"{str(e)[:300]}"}
        last = _load_last_success()
        if last:
            fail["last_successful_run"] = last
        print(json.dumps(fail))
        return
    result = {
        "metric": "MC moves/sec, 10,112-atom polarizable multi-site CO2 "
                  "GCMC (uVT, oriented 3-site insertion, 4-iter Thole "
                  "SCF, Ewald)",
        "value": round(co2["median"], 2),
        "unit": "moves/sec",
        "vs_baseline": round(co2["median"] / ref_co2, 1)
        if ref_co2 > 0 else 0.0,
    }

    secondary = {
        "flagship_co2_min_max": [round(co2["min"], 2),
                                 round(co2["max"], 2)],
    }
    if time.time() - _T0 < BUDGET_S:
        try:
            ref_h2 = float(base.get("flagship_h2_ref_moves_per_sec", 0.0))
            h2 = flagship_moves_per_sec("h2")
            secondary["flagship_h2_moves_per_sec"] = round(h2["median"], 2)
            secondary["flagship_h2_min_max"] = \
                [round(h2["min"], 2), round(h2["max"], 2)]
            if ref_h2 > 0:
                secondary["flagship_h2_vs_baseline"] = \
                    round(h2["median"] / ref_h2, 1)
                secondary["ref_flagship_h2_moves_per_sec"] = \
                    round(ref_h2, 4)
        except Exception as e:  # pragma: no cover
            _log(f"h2 flagship secondary failed: {e}")
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
    # legacy monatomic variant last: under budget pressure (three 10k
    # compiles) drop the round-1/2 continuity number before the rest
    if time.time() - _T0 < BUDGET_S:
        try:
            ar = flagship_moves_per_sec("ar")
            secondary["flagship_monatomic_moves_per_sec"] = \
                round(ar["median"], 2)
            secondary["flagship_monatomic_min_max"] = \
                [round(ar["min"], 2), round(ar["max"], 2)]
            if ref_ar > 0:
                secondary["flagship_monatomic_vs_baseline"] = \
                    round(ar["median"] / ref_ar, 1)
        except Exception as e:  # pragma: no cover
            _log(f"monatomic flagship secondary failed: {e}")
    if ref_co2 > 0:
        secondary["ref_flagship_co2_moves_per_sec"] = round(ref_co2, 4)
        if base.get("flagship_co2_measured_on"):
            secondary["ref_measured_on"] = base["flagship_co2_measured_on"]
    if ref_ar > 0:
        secondary["ref_flagship_monatomic_moves_per_sec"] = round(ref_ar, 4)
    # replica DP on one chip: measured r5 (tools/ab_replicas.py) and
    # rejected — the [R] batch axis defeats the in-place plane commits
    # (R=1 vmapped 80.5 vs 161.7 direct; R=2 30.5 aggregate; R=4 OOM)
    # and the HBM-bound SCF caps any perfect implementation at +33%.
    # Production replica DP is one chain per chip over the mesh axis;
    # see docs/PERF.md "Replica DP on one chip".  Static record, not
    # re-measured per bench run (the R=4 point OOMs the shared worker).
    secondary["replica_dp_one_chip"] = {
        "aggregate_moves_per_sec": {"R1_vmapped": 80.5, "R2": 30.5,
                                    "R4": "OOM"},
        "verdict": "rejected; use one chain per chip (docs/PERF.md)"}
    result["secondary"] = secondary
    regressions = check_regressions(result)
    if regressions:
        result["regressions"] = regressions
    _save_last_success(dict(result, measured_at=time.strftime("%Y-%m-%d %H:%M")))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
