"""A/B the mixed-SCF plane representations on the live backend.

The exponential-damping SCF contraction can stream either

- mode 3: masked displacement planes, coefficients recomputed in-kernel
  (fewer HBM bytes, ~2x the VPU flops/pair), or
- mode 4: the folded ``(cd, sx, sy, sz)`` planes (more bytes, fewer
  flops) — forced by ``FFlags.polar_plane_mode = 4``.

Which wins is a per-chip question (the op sits near the HBM/VPU ridge:
~77 vs ~45 VPU ops/pair against 3 vs 4 f32 half-planes, docs/PERF.md),
so this tool times both: the standalone 4-iteration SCF solve and one
full flagship MC chunk per mode.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python tools/ab_planes.py
            [--model co2|mono] [--chunk 64] [--skip-chunk] [--donate-ab]

``--donate-ab`` additionally times the winning-representation chunk with
``donate="planes"`` (planes-only jit-boundary donation, mc.chain) — the
whole-carry form fails at dispatch on axon, this narrower one is the
open question.

Run one probe at a time: concurrent TPU processes contend on the
remote tunnel.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

_T0 = time.time()


def _log(msg):
    print(f"[ab {time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def time_scf(state, flags, params, label):
    import jax
    from mpmcxx_tpu.ops import polar as polar_mod

    coeffs, E_static = jax.jit(
        lambda s: polar_mod.mixed_field_coeffs(s, flags, params))(state)
    jax.block_until_ready(coeffs)
    _log(f"{label}: {len(coeffs)} planes; compiling SCF solve...")

    @jax.jit
    def solve(s, coeffs, E_static):
        res = polar_mod.finish_polar(
            s, flags, params, E_static,
            lambda m: polar_mod.contract_mixed(coeffs, m,
                                               l=params.polar_damp))
        return res.energy

    e0 = float(solve(state, coeffs, E_static))
    reps, segments = 10, 3
    ms_seg = []
    for _ in range(segments):
        t0 = time.time()
        for _ in range(reps):
            e = solve(state, coeffs, E_static)
        float(e)
        ms_seg.append((time.time() - t0) / reps * 1e3)
    ms = float(np.median(ms_seg))
    _log(f"{label}: {ms:.2f} ms/solve (min {min(ms_seg):.2f} "
         f"max {max(ms_seg):.2f}); E_polar = {e0:.8g}")
    return ms, e0


def time_chunk(state, flags, params, opts, topo, chunk, label,
               donate=False):
    import jax  # noqa: F401
    from mpmcxx_tpu.mc import chain as chain_mod

    carry = chain_mod.init_carry(state, flags, params, opts, seed=0)
    runner = chain_mod.make_chunk_runner(flags, params, opts, chunk,
                                         topology=topo, donate=donate)
    _log(f"{label}: compiling {chunk}-step chunk...")
    carry, _ = runner(carry)
    float(carry.obs.energy)
    rates = []
    for rep in range(3):
        t0 = time.time()
        done = 0
        while done < 256:
            carry, _ = runner(carry)
            done += chunk
        float(carry.obs.energy)
        rates.append(done / (time.time() - t0))
    med = float(np.median(rates))
    _log(f"{label}: {med:.1f} moves/s (min {min(rates):.1f} "
         f"max {max(rates):.1f})")
    return med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="co2", choices=("co2", "mono"))
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--skip-chunk", action="store_true")
    ap.add_argument("--donate-ab", action="store_true",
                    help="also time the auto3 chunk with donate='planes'")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import flagship

    if args.model == "co2":
        state, _meta, flags, params, opts = flagship.build_state_co2()
    else:
        state, _meta, flags, params, opts = flagship.build_state()
    topo = flagship.topology(state)

    results = {}
    for mode, f in (("auto3", flags),
                    ("forced4", flags.replace(polar_plane_mode=4))):
        ms, e = time_scf(state, f, params, f"scf[{mode}]")
        results[f"scf_{mode}_ms"] = ms
        results[f"scf_{mode}_E"] = e
    if abs(results["scf_auto3_E"] - results["scf_forced4_E"]) > \
            1e-6 * abs(results["scf_auto3_E"]):
        _log("WARNING: mode 3 vs 4 polar energies differ beyond 1e-6")

    if not args.skip_chunk:
        for mode, f in (("auto3", flags),
                        ("forced4", flags.replace(polar_plane_mode=4))):
            results[f"chunk_{mode}_moves_s"] = time_chunk(
                state, f, params, opts, topo, args.chunk, f"chunk[{mode}]")
        if args.donate_ab:
            # planes-only donation: whole-carry donate fails at dispatch
            # on axon (INVALID_ARGUMENT); this narrower form is untried
            try:
                results["chunk_auto3_donate_planes_moves_s"] = time_chunk(
                    state, flags, params, opts, topo, args.chunk,
                    "chunk[auto3,donate=planes]", donate="planes")
            except Exception as e:
                _log(f"donate=planes chunk failed: {e!r}")
                results["chunk_auto3_donate_planes_moves_s"] = None

    import json
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
