"""Quantify SCF warm-start truncation error on the flagship workload.

The flagship runs the Thole SCF at a fixed 4 iterations per move,
cold-started from alpha*E exactly as the reference does (init_dipoles,
src/System.Energy.cpp:3547-3560).  Warm-starting from the previous
accepted step's converged dipoles (flags.polar_warm_start) changes the
*truncation error* of the fixed iteration count, not the fixed point: the
stationary residual is bounded by c^K * (per-move dipole change)/(1-c^K)
for SCF contraction factor c, so errors cannot accumulate along the
trajectory.

This tool measures, along a real GCMC chain for each variant
(cold-K / warm-K), the relative error of the chain's polarization energy
against the fully converged SCF recomputed from scratch at every
checkpoint.  Decision rule (VERDICT r2 item 2): warm-K is an acceptable
flagship default iff max_rel_err(warm-K) <= max_rel_err(cold-4) and both
are <= 1e-6 of the total energy scale.

Usage:
  python tools/warmstart_study.py --mini          # CPU, shrunk system
  python tools/warmstart_study.py                 # full 10k (TPU)
Results land in docs/PERF.md by hand.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                       # tools/ (flagship)
sys.path.insert(0, os.path.dirname(_HERE))      # repo root (mpmcxx_tpu)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mini", action="store_true")
    ap.add_argument("--model", choices=("co2", "ar"), default="co2")
    ap.add_argument("--iters", type=int, nargs="*", default=[2, 3, 4])
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--chunk-steps", type=int, default=64)
    args = ap.parse_args()

    import jax
    if args.mini:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    import flagship
    from mpmcxx_tpu.ops.energy import energy_breakdown_blocked
    from mpmcxx_tpu.mc import chain as chain_mod

    if args.mini:
        flagship.G_FRAME, flagship.N_CO2, flagship.N_SORB = 4, 48, 150

    build = flagship.build_state_co2 if args.model == "co2" else \
        flagship.build_state
    state, _meta, flags, params, opts = build(
        extra_mol_capacity=8 if args.mini else 384)
    topo = flagship.topology(state)

    # ground truth: converged SCF (precision-terminated) from scratch
    truth_flags = flags.replace(polar_max_iter=0, polar_warm_start=False)
    truth_params = dataclasses.replace(params, polar_precision=1e-12)

    def converged_polar(st):
        # cold start so the trial state's carried mu can't bias the truth
        st = st.replace(mu=st.mu * 0.0)
        eb = energy_breakdown_blocked(st, truth_flags, truth_params)
        return float(eb.polarization), float(eb.total)

    results = {}
    for warm in (False, True):
        for K in args.iters:
            if not warm and K != flags.polar_max_iter:
                continue  # cold only at the contract's K=4
            name = f"{'warm' if warm else 'cold'}-{K}"
            fl = flags.replace(polar_max_iter=K, polar_warm_start=warm)
            carry = chain_mod.init_carry(state, fl, params, opts, seed=0)
            runner = chain_mod.make_chunk_runner(
                fl, params, opts, args.chunk_steps, topology=topo)
            errs, terrs = [], []
            t0 = time.time()
            for c in range(args.chunks):
                carry, _ = runner(carry)
                e_chain = float(carry.obs.polarization_energy)
                e_true, e_total = converged_polar(carry.state)
                scale = max(abs(e_total), 1.0)
                errs.append(abs(e_chain - e_true) / max(abs(e_true), 1e-12))
                terrs.append(abs(e_chain - e_true) / scale)
            results[name] = {
                "rel_err_polar_max": max(errs),
                "rel_err_polar_median": float(np.median(errs)),
                "rel_err_total_max": max(terrs),
                "wall_s": time.time() - t0,
            }
            print(f"{name}: polar rel err median "
                  f"{results[name]['rel_err_polar_median']:.2e} max "
                  f"{results[name]['rel_err_polar_max']:.2e}; vs total "
                  f"max {results[name]['rel_err_total_max']:.2e}",
                  flush=True)

    cold4 = results.get("cold-4")
    for name, r in results.items():
        if name.startswith("warm") and cold4:
            verdict = "OK" if (r["rel_err_total_max"] <=
                               max(cold4["rel_err_total_max"], 1e-6)) \
                else "WORSE"
            print(f"{name}: {verdict} (total-scale err "
                  f"{r['rel_err_total_max']:.2e} vs cold-4 "
                  f"{cold4['rel_err_total_max']:.2e})", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
